package graft

import java.io.IOException
import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes
import scala.collection.mutable.ArrayBuffer

/** Scratch-directory registry for queries that need a working dir
  * (streaming feeds, sink tables, file-lifecycle fixtures).
  *
  * Every dir created here is deleted by ONE shutdown hook when the
  * JVM exits; Bench additionally calls [[sweep]] between queries so
  * the ≤5-sample loop never accumulates a suite's worth of scratch
  * data (measured: 1,299 orphan dirs, 1.4 GB, after five rounds of
  * exit-only sweeping) — background disk debris the round-5 review
  * flagged as a bench-stability suspect. Within one query, re-reads
  * stay valid: a dir is only swept AFTER the query that created it
  * finished.
  *
  * Deletion never follows symlinks (`walkFileTree` without
  * FOLLOW_LINKS visits a dir symlink as a FILE): a link planted
  * inside a scratch dir is deleted as a link, its target untouched —
  * the sweep can never reach outside the registered trees.
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

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) return
    // default walk does NOT follow links: a symlinked dir arrives at
    // visitFile (deleted as the link itself), never traversed into
    Files.walkFileTree(p, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def visitFileFailed(f: Path, e: IOException): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: Path, e: IOException): FileVisitResult = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
    ()
  }

  /** Delete everything registered so far (idempotent). A dir that
    * resists deletion (perms, live handle) never aborts the rest. */
  def sweep(): Unit = synchronized {
    created.foreach { p =>
      try deleteRecursively(p)
      catch { case scala.util.control.NonFatal(_) => }
    }
    created.clear()
  }
}
