package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The dead-pid scratch reaper DELETES directories, so its guards are
  * safety-critical: it must remove only graft-prefixed dirs whose
  * owning pid is provably dead — never a live process's scratch, never
  * a name without a parseable pid. Exercised directly against real
  * dirs in the scratch roots (no SparkSession needed).
  */
class ScratchReaperSpec extends AnyFunSuite {

  // 4194303 = Linux pid_max ceiling; a process at the top of that range
  // existing AND owning graft scratch at test time is practically
  // impossible, and the assertion below fails loudly if it ever does
  private val deadPid = 4194303L

  test("reaper removes dead-pid dirs, keeps live-pid and pid-less names") {
    assert(!ProcessHandle.of(deadPid).isPresent, "sentinel pid is alive")
    val self = ProcessHandle.current().pid()
    val tmp = System.getProperty("java.io.tmpdir")
    val dead = Seq(
      new java.io.File(s"$tmp/graft_src_$deadPid"),
      new java.io.File(s"${Sources.streamScratchRoot}/graft_stream_ckpt_$deadPid"),
      new java.io.File(s"${Sources.streamScratchRoot}/graft_stream_append_${deadPid}_1a_7"))
    // suffixed so the fixture never collides with the JVM's REAL
    // scratch dir (pidOf still parses the leading digits = self)
    val kept = Seq(
      new java.io.File(s"$tmp/graft_src_${self}_reapertest"),
      new java.io.File(s"$tmp/graft_src_nopid"))
    (dead ++ kept).foreach { d =>
      assert(d.mkdirs() || d.isDirectory, s"fixture dir $d")
      // a real file inside each dir so the reap exercises the
      // recursive delete, not just an empty-dir rmdir
      val marker = new java.io.File(d, "marker")
      marker.createNewFile()
      assert(marker.exists(), s"fixture marker in $d")
    }
    try {
      Sources.reapDeadPidScratch()
      dead.foreach(d => assert(!d.exists(), s"$d should be reaped"))
      kept.foreach(d => assert(d.exists(), s"$d must survive"))
    } finally (dead ++ kept).foreach(graft.Fs.rmTree)
  }
}
