package graft

import java.nio.file.{Files, Path}
import scala.collection.mutable.ArrayBuffer

/** Scratch-directory registry for queries that need a working dir
  * (streaming feeds, sink tables, file-lifecycle fixtures).
  *
  * Every dir created here is deleted by ONE shutdown hook when the
  * JVM exits. Without this, each full Verify/Bench suite leaves ~40
  * feed/state dirs in the system temp dir (measured: 1,299 orphan
  * dirs, 1.4 GB, after five rounds) — background disk debris that the
  * round-5 review flagged as a bench-stability suspect. Deletion at
  * exit (not eagerly per query) keeps re-reads inside a suite valid:
  * several queries hand a dir to a streaming checkpoint AND read the
  * sink back at the end.
  */
object TempDirs {

  private val created = ArrayBuffer.empty[Path]

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => sweep()))
  }

  /** Create a registered scratch dir; returns its absolute path. */
  def create(prefix: String): String = synchronized {
    val p = Files.createTempDirectory(prefix)
    created += p
    p.toString
  }

  private def deleteRecursively(p: java.io.File): Unit = {
    val children = p.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    p.delete()
    ()
  }

  /** Delete everything registered so far (idempotent). */
  def sweep(): Unit = synchronized {
    created.foreach(p => deleteRecursively(p.toFile))
    created.clear()
  }
}
