package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Depth probe for the pointer-jumping claim. The sf1 rehearsal showed
  * dedup_cc flat (1.01x at 10x data) because real dup clusters are
  * shallow stars — that observation never exercises the O(log diameter)
  * bound the design argues. Path graphs are the worst case per node
  * (diameter = node count - 1), so the round count the fixpoint takes on
  * them IS the depth curve: logarithmic if pointer jumping works,
  * linear (and NotConverged at maxIters = 25 for d = 256) if it ever
  * regresses to plain neighbor propagation. Counts include up to 2
  * fixpoint-confirmation rounds (the gap-2 sum check).
  */
class CcDepthSpec extends SparkSpec {

  private def pathGraph(d: Int) = {
    val nodes = spark.range(d + 1L).toDF("id")
    val edges = spark.range(d.toLong)
      .select(col("id").as("src"), (col("id") + 1L).as("dst"))
    (nodes, edges)
  }

  test("deep chains converge in ~log2(diameter) rounds, far below the " +
      "diameter a plain propagation would need") {
    val curve = Seq(16, 64, 256).map { d =>
      val (nodes, edges) = pathGraph(d)
      val (got, rounds) =
        ConnectedComponents.labelsWithRounds(nodes, edges, maxIters = 25)
      assert(got.filter(col("component") =!= 0L).count() == 0,
        s"d=$d: a path is one component labeled by its minimum (0)")
      val log2 = math.ceil(math.log(d.toDouble) / math.log(2.0)).toInt
      assert(rounds <= log2 + 3,
        s"d=$d took $rounds rounds — above the log2(d)+3 = ${log2 + 3} " +
          "pointer-jumping envelope (plain propagation would need ~d)")
      if (d >= 64)
        assert(4 * rounds <= d,
          s"d=$d took $rounds rounds — not meaningfully below the diameter")
      d -> rounds
    }
    info(s"measured depth curve (diameter -> rounds): $curve")
    // doubling the diameter 4x (16 -> 64 -> 256) adds only ~2 rounds per
    // step if the recurrence is logarithmic; a linear regression would
    // add ~48 and ~192
    val byD = curve.toMap
    assert(byD(256) - byD(16) <= 6,
      s"rounds grew ${byD(256) - byD(16)} over a 16x diameter increase — " +
        "not logarithmic")
  }
}
