package graft.util

/** Tiny local-filesystem helpers shared by the ephemeral-store paths
  * (index lifecycle, stream staging, bench tools, spec fixtures) — one
  * recursive delete instead of a copy per call site.
  */
object Fs {

  /** Delete `path` and everything under it; missing paths are a no-op.
    * Does not follow symlinks out of the tree (File.delete removes the
    * link itself).
    */
  def deleteRecursively(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go))
      f.delete()
      ()
    }
    go(new java.io.File(path))
  }
}
