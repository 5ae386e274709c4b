package graft

/** Local-filesystem helpers shared by the harness mains and the
  * scratch-dir round-trip queries. Harness/fixture-side only — operator
  * data paths go through Spark's committers, never through this.
  */
object Fs {
  /** Recursive delete; missing paths are fine. A symlink to a directory
    * is deleted as a LINK, never followed: `File.isDirectory` resolves
    * links, so recursing would delete the target's contents — and the
    * scratch roots this sweeps (`/tmp`, tmpfs) are world-writable, where
    * a planted symlink must not become an arbitrary-tree delete.
    */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(); ()
  }
}
