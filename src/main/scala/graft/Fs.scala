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

  /** Stable 48-bit hex tag identifying a dataset path, for scratch-dir
    * and table-name suffixes. MD5-derived, NOT String.hashCode: 32-bit
    * hashCode collisions between two dataset dirs are birthday-probable
    * across many dirs (and constructible), and a collision makes two
    * datasets silently share a sink/table — one's results read back as
    * the other's. 48 bits puts a same-JVM collision out of reach.
    */
  def pathTag(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
}
