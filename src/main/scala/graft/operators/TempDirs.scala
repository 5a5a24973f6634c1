package graft.operators

/** Session-lifetime scratch directories for memoized derived artifacts
  * (the co-purchase edge list, the q194 WAP lake, the shared dedup
  * component assignment). [[scoped]] is `Files.createTempDirectory` plus
  * a JVM shutdown hook that removes the tree — repeated Verify/Bench/test
  * sessions previously accumulated full corpus copies under /tmp because
  * nothing ever deleted the memo parquet (a `deleteOnExit` can't remove a
  * non-empty directory). The hook is best-effort by design: a kill -9
  * still leaks, which is the OS tmp-reaper's job, not ours; what this
  * guarantees is that a NORMAL process exit leaves nothing behind.
  */
object TempDirs {

  private val registered =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.synchronized {
      registered.forEach(p => deleteRecursively(p))
    }
  }, "graft-tempdirs-cleanup"))

  private def deleteRecursively(root: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(root)) {
        val stream = java.nio.file.Files.walk(root)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { val _ = java.nio.file.Files.deleteIfExists(p) })
        finally stream.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort

  /** A fresh temp directory removed at JVM shutdown. */
  def scoped(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
