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
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(bytes) finally out.close()
    fc.rename(tmp, dst, Options.Rename.OVERWRITE)
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
