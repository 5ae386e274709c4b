package graft

/** Local-filesystem helpers shared by the harness mains and the
  * scratch-dir round-trip queries. Harness/fixture-side only — operator
  * data paths go through Spark's committers, never through this.
  */
object Fs {
  /** Recursive delete; missing paths are fine. */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(); ()
  }
}
