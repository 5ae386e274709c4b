package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the progress→query attribution rule of the state-store
  * measurement harness. Both cases were live bugs during round 11:
  * a null progress.name (the file-sink fixture starts its stream
  * without a queryName) threw in the listener and silently dropped
  * that query's metrics, and prefix matching without longest-wins
  * would file every `graft_stream_tumbling_append_N` progress under
  * `stream_tumbling`.
  */
class StreamStateBenchSpec extends AnyFunSuite {
  private val contract = Seq(
    "stream_dedup", "stream_join", "stream_session", "stream_sliding",
    "stream_tumbling", "stream_tumbling_append")

  test("queryName maps to its contract query") {
    assert(StreamStateBench.benchNameFor("graft_stream_dedup_3", contract)
      .contains("stream_dedup"))
  }

  test("longest prefix wins for nested names") {
    assert(StreamStateBench.benchNameFor(
        "graft_stream_tumbling_append_7", contract)
      .contains("stream_tumbling_append"))
    assert(StreamStateBench.benchNameFor(
        "graft_stream_tumbling_7", contract)
      .contains("stream_tumbling"))
  }

  test("null and foreign names attribute to nothing") {
    assert(StreamStateBench.benchNameFor(null, contract).isEmpty)
    assert(StreamStateBench.benchNameFor("someone_elses_query", contract)
      .isEmpty)
    // a bare prefix without the trailing seq separator must not match
    assert(StreamStateBench.benchNameFor("graft_stream_dedup", contract)
      .isEmpty)
  }

  test("StatePeak.max is a componentwise peak plus event count") {
    import StreamStateBench.StatePeak
    val a = StatePeak(10, 100, 5, 1, 1)
    val b = StatePeak(7, 200, 9, 0, 1)
    assert(a.max(b) == StatePeak(10, 200, 9, 1, 2))
  }
}
