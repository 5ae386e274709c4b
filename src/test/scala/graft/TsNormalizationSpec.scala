package graft

/** Pins the floor semantics of the shared ns→µs normalization
  * (`Tables.nsToMicrosTs`): every nanosecond value — including
  * pre-epoch negatives and exact-millisecond boundaries — must map to
  * FLOOR(ns / 1000) microseconds, matching the DuckDB oracles'
  * `epoch`/`floor` arithmetic. A truncating form passes all of these
  * except the negative non-boundary cases.
  */
class TsNormalizationSpec extends SparkSpec {
  import spark.implicits._

  test("nsToMicrosTs floors for all signs and boundaries") {
    val ns = Seq(-2001L, -2000L, -1999L, -1001L, -1000L, -999L, -1L,
      0L, 1L, 999L, 1000L, 1001L, 1755000000123456789L)
    val got = ns.toDF("ts")
      .selectExpr("ts", s"unix_micros(${Tables.nsToMicrosTs}) AS us")
      .as[(Long, Long)].collect().toMap
    ns.foreach { n =>
      assert(got(n) == Math.floorDiv(n, 1000L),
        s"ns=$n: got ${got(n)}, want ${Math.floorDiv(n, 1000L)}")
    }
  }
}
