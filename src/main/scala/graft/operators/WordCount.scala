package graft.operators

import graft.{QueryModule, Tables}
import graft.mr.MapReduce
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship workload — word count — with the reference's
  * exact token semantics (`mr/word_count.h:22-31`): tokens are maximal
  * runs of ASCII letters, case-sensitive, empties dropped
  * (`run_demo.sh:16`), output key-sorted byte-order (`src/worker.cc:208`,
  * `run_demo.sh:16` `LC_COLLATE=C` ≙ Spark UTF8_BINARY).
  *
  * Two implementations of the same semantics:
  *  - `wordcount`: declarative (explode/groupBy/count) — Catalyst plans
  *    partial+final hash aggregation, so only one partial count per word
  *    per partition crosses the shuffle (the combiner the reference
  *    lacks; at 100 TB this is the difference between shipping every
  *    token and shipping the dictionary).
  *  - `mr_wordcount`: built on the generic [[graft.mr.MapReduce]] typed
  *    contract (`flatMap → groupByKey → mapGroups`) to prove the
  *    reference's exact user API (reduce sees all values).
  */
object WordCount extends QueryModule {

  private val tokenSplit = "[^A-Za-z]+"

  def dataframeWordCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), tokenSplit)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  def mrWordCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val texts = Tables.documents(s, d).select("text").as[String]
    MapReduce.mapReduce[String, String, Int, (String, Long)](
      texts,
      text => text.split(tokenSplit).iterator.filter(_.nonEmpty).map(w => (w, 1)),
      (word, ones) => (word, ones.map(_.toLong).sum)
    ).toDF("word", "cnt").orderBy("word")
  }

  /** Distributed grep on the generic MR contract (the MapReduce paper's
    * first motivating workload): map emits (doc_id, occurrence_count)
    * for matching docs, reduce sums — exercising a map that filters
    * (yields 0 or 1 pairs) unlike word count's fan-out map.
    */
  def mrGrep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pattern = java.util.regex.Pattern.compile("hash join|window")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    MapReduce.mapReduce[(Long, String), Long, Int, (Long, Long)](
      docs,
      { case (docId, text) =>
        val m = pattern.matcher(text)
        var n = 0
        while (m.find()) n += 1
        if (n > 0) Iterator((docId, n)) else Iterator.empty
      },
      (docId, counts) => (docId, counts.map(_.toLong).sum)
    ).toDF("doc_id", "n_matches").orderBy("doc_id")
  }

  /** Classic reduce-side join on the generic MR contract (SURVEY §2.B:
    * map both inputs to (key, tagged-record), reduce pairs the groups —
    * the shuffle/group machinery is the reference's N4/N7,
    * `src/worker.cc:176-182,208`). The reduce sees ALL tagged values of
    * a key at once and crosses the two tag groups. Spark's native joins
    * supersede this shape (partial-agg, SMJ/broadcast selection), but
    * this is what the reference's user API can express directly.
    */
  def mrJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)]
      .map { case (k, seg) => (k, "C|" + seg) }
    val ords = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey")).as[(Long, Long)]
      .map { case (k, o) => (k, "O|" + o) }
    MapReduce.mapReduce[(Long, String), Long, String, Seq[(Long, String, Long)]](
      cust.union(ords),
      kv => Iterator.single(kv),
      (custkey, tagged) => {
        val (cs, os) = tagged.toSeq.partition(_.startsWith("C|"))
        for { c <- cs; o <- os }
          yield (custkey, c.drop(2), o.drop(2).toLong)
      }
    ).flatMap(identity(_))
      .toDF("c_custkey", "c_mktsegment", "o_orderkey")
      .orderBy("c_custkey", "o_orderkey")
  }

  /** Modulus for the order-sensitive checksum below: products stay well
    * inside Long (h < 2^30, h*31 + k < 2^36).
    */
  private val SS_P = 1000000007L

  /** MR secondary sort — the within-key value-ordering guarantee the
    * MapReduce paper (§4.2 "Ordering Guarantees") layers on the reduce
    * contract; the reference groups values but leaves them UNORDERED
    * (`src/worker.cc:208,227` accumulates arrival order). Implemented
    * the way Hadoop does it — and the way it scales: partition by the
    * primary key, sort within partitions by (key, value order), then a
    * streaming fold that detects key boundaries. The reducer holds O(1)
    * state and NO group ever materializes as a list (the reference
    * buffers whole groups in RAM, `src/worker.cc:210-229`; this shape is
    * how the contract survives a key with a billion values).
    *
    * The fold emits an order-SENSITIVE polynomial checksum over each
    * customer's orders in (o_orderdate, o_orderkey) order — seeded with
    * the first element, h ← (h·31 + key) mod [[SS_P]] — plus
    * first/last/count. Any other value order changes the checksum, so
    * the oracle comparison proves the ordering guarantee itself, not
    * just group membership.
    *
    * Scale: one hash exchange on o_custkey carrying three longs per row,
    * one partition-local sort — the same cost envelope as any shuffled
    * aggregation; the sort is Spark's spillable external sort, so a
    * skewed key spills to disk instead of OOMing the reducer.
    */
  def mrSecondarySort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select(col("o_custkey"), expr("unix_micros(o_orderdate)").as("ts"),
        col("o_orderkey"))
      .as[(Long, Long, Long)]
      .repartition(col("o_custkey"))
      .sortWithinPartitions("o_custkey", "ts", "o_orderkey")
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long, Long, Long)] {
          private var row: (Long, Long, Long) = if (it.hasNext) it.next() else null
          def hasNext: Boolean = row != null
          def next(): (Long, Long, Long, Long, Long) = {
            val key = row._1
            val first = row._3
            var n = 0L
            var last = 0L
            var h = 0L
            var seeded = false
            while (row != null && row._1 == key) {
              val k = row._3 % SS_P
              h = if (seeded) (h * 31 + k) % SS_P else { seeded = true; k }
              last = row._3
              n += 1
              row = if (it.hasNext) it.next() else null
            }
            (key, n, first, last, h)
          }
        }
      }
      .toDF("o_custkey", "n_orders", "first_key", "last_key", "ord_hash")
      .orderBy("o_custkey")
  }

  private val mrSecondarySortOracle =
    s"""WITH seq AS (
       |  SELECT o_custkey, list(o_orderkey ORDER BY o_orderdate, o_orderkey) AS ks
       |  FROM orders GROUP BY o_custkey)
       |SELECT o_custkey, len(ks)::BIGINT AS n_orders,
       |  ks[1] AS first_key, ks[len(ks)] AS last_key,
       |  list_reduce(list_transform(ks, x -> x % $SS_P),
       |    (a, x) -> (a * 31 + x) % $SS_P) AS ord_hash
       |FROM seq ORDER BY o_custkey""".stripMargin

  private val mrJoinOracle =
    """SELECT c_custkey, c_mktsegment, o_orderkey
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  private val mrGrepOracle =
    """SELECT doc_id, len(regexp_extract_all(text, 'hash join|window'))::BIGINT AS n_matches
      |FROM documents
      |WHERE len(regexp_extract_all(text, 'hash join|window')) > 0
      |ORDER BY doc_id""".stripMargin

  private val wcOracle =
    """SELECT word, count(*) AS cnt FROM (
      |  SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
      |  FROM documents)
      |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount"    -> dataframeWordCount _,
    "mr_wordcount" -> mrWordCount _,
    "mr_grep"      -> mrGrep _,
    "mr_join"      -> mrJoin _,
    "mr_secondary_sort" -> mrSecondarySort _,
  )

  val oracles: Map[String, String] = Map(
    "wordcount"    -> wcOracle,
    "mr_wordcount" -> wcOracle,
    "mr_grep"      -> mrGrepOracle,
    "mr_join"      -> mrJoinOracle,
    "mr_secondary_sort" -> mrSecondarySortOracle,
  )
}
