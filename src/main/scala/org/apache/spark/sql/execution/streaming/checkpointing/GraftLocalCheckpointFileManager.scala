package org.apache.spark.sql.execution.streaming.checkpointing

import java.io.{FileNotFoundException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{FileAlreadyExistsException => NioExists, Files, NoSuchFileException, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}

import CheckpointFileManager.CancellableFSDataOutputStream

/** Streaming-checkpoint file manager for LOCAL (`file:`) checkpoint
  * roots, built on `java.nio` — the engine's answer to a measured
  * local-mode bottleneck (optimization round 17, guide §1/§7.3):
  *
  * Spark's default `FileContextBasedCheckpointFileManager` issues
  * every `mkdir`/`create` through Hadoop's `FileContext`, which
  * attaches an explicit umask-derived `FsPermission` to each call.
  * On `RawLocalFileSystem` *without the native Hadoop library* (the
  * common case for a plain Spark download — there is no
  * `libhadoop.so` on this box), a non-default permission makes Hadoop
  * FORK A `chmod` PROCESS per directory and per file
  * (`RawLocalFileSystem.setPermission` → `Shell.execCommand`).
  * Thread dumps of a stream-stream join drain showed 32 task threads
  * serialized behind `ProcessImpl.forkAndExec` — state-store delta
  * commits and provider inits each paying a process spawn for a
  * 4 KB file. A stateful drain writes
  * (partitions × state stores) files per micro-batch, so the fork
  * tax scales with exactly the thing the state store is supposed to
  * make cheap.
  *
  * This manager replaces those paths with `java.nio` calls (no
  * permission juggling, no forks, no Hadoop ChecksumFileSystem `.crc`
  * sidecars) while keeping the contract of the stock managers:
  *
  *  - `createAtomic` writes `.<name>.<uuid>.tmp` in the target
  *    directory and atomically renames on close (`ATOMIC_MOVE`);
  *    with `overwriteIfPossible = false` an existing target raises
  *    `FileAlreadyExistsException` — the WAL's concurrent-writer
  *    fence, same check-then-rename the stock local managers do;
  *  - `cancel` closes and removes the temp file;
  *  - `list` on a missing directory throws `FileNotFoundException`
  *    (`HDFSMetadataLog` relies on it);
  *  - `delete` is recursive and silent on a missing path.
  *
  * A NON-`file:` checkpoint root (HDFS, S3, ABFS — the 100 TB
  * deployment) transparently delegates to Spark's default
  * [[FileContextBasedCheckpointFileManager]]: remote stores keep
  * their rename/consistency semantics, and this class is then pure
  * pass-through. Selected via the public
  * `spark.sql.streaming.checkpointFileManagerClass` conf
  * (graft.GraftSession sets it as the DEFAULT; any user conf wins).
  */
class GraftLocalCheckpointFileManager(root: Path, hadoopConf: Configuration)
  extends CheckpointFileManager {

  private val isLocalScheme: Boolean = {
    val s = root.toUri.getScheme
    s == null || s == "file"
  }

  /** Non-local roots keep stock behavior, built lazily so purely
    * local use never touches FileContext. */
  private lazy val delegate: CheckpointFileManager =
    new FileContextBasedCheckpointFileManager(root, hadoopConf)

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)

  // ---- CheckpointFileManager ------------------------------------------

  override def createAtomic(path: Path,
                            overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    if (!isLocalScheme) return delegate.createAtomic(path, overwriteIfPossible)
    val target = nio(path)
    val dir = target.getParent
    if (dir != null && !Files.isDirectory(dir)) Files.createDirectories(dir)
    val tmp = dir.resolve(s".${target.getFileName}.${UUID.randomUUID().toString.take(8)}.tmp")
    val out = Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW,
      StandardOpenOption.WRITE)
    new CancellableFSDataOutputStream(out) {
      private var closed = false
      private var cancelled = false
      override def cancel(): Unit = this.synchronized {
        if (closed || cancelled) return
        cancelled = true
        try out.close() catch { case _: Throwable => }
        try Files.deleteIfExists(tmp) catch { case _: Throwable => }
      }
      override def close(): Unit = this.synchronized {
        if (closed || cancelled) return
        closed = true
        out.close()
        // same fence as the stock local managers: existence check,
        // then rename (rename(2) on one fs — atomic for readers)
        if (!overwriteIfPossible && Files.exists(target)) {
          Files.deleteIfExists(tmp)
          throw new FileAlreadyExistsException(
            s"File already exists: $target (overwrite disallowed)")
        }
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: NioExists if !overwriteIfPossible =>
            Files.deleteIfExists(tmp)
            throw new FileAlreadyExistsException(
              s"File already exists: $target (overwrite disallowed)")
        }
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    if (!isLocalScheme) return delegate.open(path)
    val ch =
      try FileChannel.open(nio(path), StandardOpenOption.READ)
      catch { case _: NoSuchFileException =>
        throw new FileNotFoundException(path.toString) }
    new FSDataInputStream(new GraftLocalCheckpointFileManager.NioInput(ch))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    if (!isLocalScheme) return delegate.list(path, filter)
    val dir = nio(path)
    val out = ArrayBuffer.empty[FileStatus]
    val stream =
      try Files.newDirectoryStream(dir)
      catch {
        case _: NoSuchFileException =>
          throw new FileNotFoundException(path.toString)
        case _: java.nio.file.NotDirectoryException =>
          // a file lists as itself, as Hadoop's listStatus does
          val a = Files.readAttributes(dir,
            classOf[java.nio.file.attribute.BasicFileAttributes])
          val st = new FileStatus(a.size(), false, 1, 33554432L,
            a.lastModifiedTime().toMillis, path)
          return if (filter == null || filter.accept(path)) Array(st)
                 else Array.empty
      }
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val child = it.next()
        val hp = new Path(path, child.getFileName.toString)
        if (filter == null || filter.accept(hp)) {
          try {
            val a = Files.readAttributes(child,
              classOf[java.nio.file.attribute.BasicFileAttributes])
            out += new FileStatus(a.size(), a.isDirectory, 1, 33554432L,
              a.lastModifiedTime().toMillis, hp)
          } catch { case _: NoSuchFileException => /* raced a delete */ }
        }
      }
    } finally stream.close()
    out.toArray
  }

  override def mkdirs(path: Path): Unit = {
    if (!isLocalScheme) { delegate.mkdirs(path); return }
    Files.createDirectories(nio(path))
    ()
  }

  override def exists(path: Path): Boolean =
    if (!isLocalScheme) delegate.exists(path)
    else Files.exists(nio(path))

  override def delete(path: Path): Unit = {
    if (!isLocalScheme) { delegate.delete(path); return }
    val p = nio(path)
    if (!Files.exists(p)) return
    // recursive, silent on missing — matches fs.delete(path, true)
    import java.nio.file.{FileVisitResult, SimpleFileVisitor}
    import java.nio.file.attribute.BasicFileAttributes
    Files.walkFileTree(p, new SimpleFileVisitor[java.nio.file.Path] {
      override def visitFile(f: java.nio.file.Path,
                             a: BasicFileAttributes): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: java.nio.file.Path,
                                      e: java.io.IOException): FileVisitResult = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
    ()
  }

  override def isLocal: Boolean = isLocalScheme

  override def createCheckpointDirectory(): Path = {
    if (!isLocalScheme) return delegate.createCheckpointDirectory()
    Files.createDirectories(nio(root))
    root
  }
}

object GraftLocalCheckpointFileManager {

  /** Seekable/PositionedReadable adapter over a [[FileChannel]] —
    * what [[FSDataInputStream]] requires of its wrapped stream. The
    * heavy readers (LZ4 block streams, metadata-log full reads) pull
    * large chunks, so no extra buffering layer is needed (and one
    * would break `seek`/`getPos` accounting). */
  private[checkpointing] final class NioInput(ch: FileChannel)
    extends InputStream with Seekable with PositionedReadable {

    private val one = ByteBuffer.allocate(1)

    override def read(): Int = {
      one.clear()
      val n = ch.read(one)
      if (n <= 0) -1 else one.get(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      ch.read(ByteBuffer.wrap(b, off, len))

    override def available(): Int = {
      val rem = ch.size() - ch.position()
      if (rem > Int.MaxValue) Int.MaxValue else math.max(0, rem.toInt)
    }

    override def skip(n: Long): Long = {
      val rem = ch.size() - ch.position()
      val d = math.max(0L, math.min(n, rem))
      ch.position(ch.position() + d)
      d
    }

    override def close(): Unit = ch.close()

    // Seekable
    override def seek(pos: Long): Unit = { ch.position(pos); () }
    override def getPos: Long = ch.position()
    override def seekToNewSource(targetPos: Long): Boolean = false

    // PositionedReadable (stateless reads — never move the cursor)
    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int =
      ch.read(ByteBuffer.wrap(buffer, offset, length), position)

    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                           length: Int): Unit = {
      var pos = position
      var off = offset
      var left = length
      while (left > 0) {
        val n = ch.read(ByteBuffer.wrap(buffer, off, left), pos)
        if (n < 0) throw new java.io.EOFException(
          s"EOF at $pos reading $length bytes")
        pos += n; off += n; left -= n
      }
    }

    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
