package graft.util

/** Tiny local-filesystem helpers shared by the ephemeral-store paths
  * (index lifecycle, stream staging, bench tools, spec fixtures) — one
  * recursive delete instead of a copy per call site.
  */
object Fs {

  /** Delete `path` and everything under it; missing paths are a no-op.
    * Does not follow symlinks out of the tree: a symlinked directory is
    * unlinked, never recursed into (`File.listFiles` WOULD follow it, so
    * the recursion is guarded by `Files.isSymbolicLink` — a stray link
    * inside an index store or temp dir must not delete external data).
    */
  def deleteRecursively(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (!java.nio.file.Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).foreach(_.foreach(go))
      f.delete()
      ()
    }
    go(new java.io.File(path))
  }
}
