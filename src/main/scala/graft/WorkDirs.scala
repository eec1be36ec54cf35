package graft

import java.nio.file.Files

/** Anonymous work-dir registry with ONE JVM shutdown hook.
  *
  * Work dirs back lazily-read results during a harness run, so they must
  * outlive the entry's consumption — but not the JVM: before r15 every
  * harness invocation leaked its work tree under /tmp (one 100× s36
  * ScaleCheck leg leaves 2.5 GB; the accumulation tipped a later leg into
  * transient disk-full parquet corruption). r15 added per-call shutdown
  * hooks in three separate objects; r16 centralizes them here because
  * each `sys.addShutdownHook` registers a separate JVM thread, which
  * accumulates unboundedly in a long-lived harness session (ADVICE r15).
  * Explicit workDir resume paths never come through here and are
  * preserved.
  */
object WorkDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  // one hook for the whole JVM, registered on first use
  private lazy val hook: Unit = {
    sys.addShutdownHook {
      var f = dirs.poll()
      while (f != null) { rm(f); f = dirs.poll() }
    }
    ()
  }

  private def rm(f: java.io.File): Unit = {
    // never recurse through a symlink: deleting the LINK is correct,
    // deleting the TARGET's contents is not (ADVICE r16)
    if (!Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** Create a temp dir deleted (recursively) at JVM exit. */
  def tempDir(prefix: String): String = {
    hook
    val d = Files.createTempDirectory(prefix).toFile
    dirs.add(d)
    d.getAbsolutePath
  }
}
