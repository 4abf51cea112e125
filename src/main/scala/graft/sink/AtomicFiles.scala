package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}

/** Atomic single-file replace for correctness-bearing metadata
  * sidecars (`_schema.json`, `_pq_means.json`): write the new bytes
  * to a hidden temp sibling, then ONE `FileContext.rename(...,
  * Options.Rename.OVERWRITE)` swaps it in. The old delete-then-rename
  * sequence had a window where a crash (or a concurrent reader)
  * between the delete and the rename found NO sidecar at all — for
  * `_schema.json` that silently re-enabled the footer-derived schema
  * roulette the sidecar exists to prevent, and for `_pq_means.json`
  * it bricked the PQ index until a full rebuild (review-caught).
  * `FileSystem.rename` has no overwrite flag (it FAILS on an existing
  * destination, which is why the delete existed); the FileContext API
  * does, and on posix-y stores (local, HDFS) the overwrite rename is
  * one atomic metadata op — a reader sees the old bytes or the new
  * bytes, never nothing. */
private[graft] object AtomicFiles {

  def replace(conf: Configuration, dst: Path, bytes: Array[Byte]): Unit = {
    val fc = FileContext.getFileContext(dst.toUri, conf)
    // ATTEMPT-unique temp: two concurrent replaces of the same dst
    // (e.g. the _dvpf `_current` pointer hint under disjoint-gen
    // writers) each rename their own temp — last wins, neither sees
    // its temp stolen (the fixed-name temp threw FileNotFound when a
    // rival renamed it first).
    val tmp = new Path(dst.getParent, s".${dst.getName}." +
      s"${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(bytes) finally out.close()
    fc.rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  /** PUT-IF-ABSENT: atomically publish `bytes` at `dst` iff no file
    * exists there — the commit primitive optimistic concurrency needs
    * (Delta's LogStore contract: a version's commit file is written
    * exactly once; the loser of a race must see failure, never an
    * overwrite). Returns false when `dst` already exists. On local
    * filesystems the publish is a hard link from the hidden temp
    * (`link(2)` fails atomically on an existing destination); on
    * HDFS-like stores it is a no-overwrite rename, which the namenode
    * serializes. Object stores without atomic create-if-absent need a
    * coordination service — same boundary Delta documents for S3. */
  def createExclusive(conf: Configuration, dst: Path,
                      bytes: Array[Byte]): Boolean = {
    val fs = dst.getFileSystem(conf)
    if (fs.exists(dst)) return false // cheap early exit, not the guard
    val tmp = new Path(dst.getParent,
      s".${dst.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val scheme = Option(dst.toUri.getScheme).getOrElse("file")
    val ok =
      if (scheme == "file") {
        val src = java.nio.file.Paths.get(tmp.toUri.getPath)
        val to = java.nio.file.Paths.get(dst.toUri.getPath)
        try { java.nio.file.Files.createLink(to, src); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else
        try {
          val fc = FileContext.getFileContext(dst.toUri, conf)
          fc.rename(tmp, dst, Options.Rename.NONE)
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.FileNotFoundException => false
        }
    fs.delete(tmp, false)
    ok
  }

  /** The file's full contents, decoded as UTF-8. */
  def readString(conf: Configuration, p: Path): String = {
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, "UTF-8")
  }
}
