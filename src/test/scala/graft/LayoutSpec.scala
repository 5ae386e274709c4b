package graft

/** Pins the z-order layout demonstration's load-bearing properties —
  * not the exact counts (those are the oracle's job) but the ordering
  * the operator exists to show.
  */
class LayoutSpec extends SparkSpec {

  private lazy val rows =
    operators.Layout.queries("src_zorder_pruning")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("both layouts agree on the true match count and scan a superset") {
    val (_, _, linScan, linMatch) = rows("linear")
    val (_, _, zScan, zMatch) = rows("zorder")
    assert(linMatch == zMatch, s"layouts disagree on matches: $rows")
    assert(linScan >= linMatch && zScan >= zMatch,
      s"a min/max reader can never scan fewer rows than match: $rows")
  }

  test("z-order clustering prunes strictly better than the linear sort " +
      "on the 2-D box probe") {
    val (_, linTouched, linScan, _) = rows("linear")
    val (_, zTouched, zScan, _) = rows("zorder")
    assert(zTouched < linTouched && zScan < linScan,
      s"z-order lost its reason to exist: $rows")
  }
}
