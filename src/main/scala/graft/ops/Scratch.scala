package graft.ops

import java.nio.file.{Files, Path}

/**
 * Scratch dirs for the sink/e2e operator queries. Every invocation writes to
 * a fresh directory (queries must not interfere when run concurrently or
 * repeatedly), and all of them are removed at JVM exit — bench loops and
 * verify runs would otherwise leak one tree per call into the temp dir.
 */
private[ops] object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(p => rm(p.toFile))
  }))

  private def rm(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(rm)
    f.delete()
    ()
  }

  /** Create and register a fresh scratch directory. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
