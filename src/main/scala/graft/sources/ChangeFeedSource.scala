package graft.sources

import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the engine's change-feed format (the
  * JSON-lines change log `CdcStream.writeChangeLog` produces — the
  * Spark-native stand-in for the reference's Cosmos change feed, S1 in
  * SURVEY.md §2; reference: dataflow/BookingDataTransformation.json:70-72).
  *
  * This is the V2 connector surface done end to end:
  *  - `TableProvider` → `Table` → `ScanBuilder` → `Scan`/`Batch` →
  *    per-file `InputPartition` → `PartitionReader[InternalRow]`;
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only requested fields — a `select(count)` never
  *    builds the string columns;
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparisons on
  *    `event_id`/`user_id` evaluate inside the reader BEFORE any row
  *    surfaces to Spark (rows are dropped at parse time). Handled
  *    filters are reported as pushed; everything else stays residual
  *    and Catalyst re-applies it — standard V2 contract;
  *  - parallelism = one partition per feed file, so a 10 000-file
  *    change log fans out across the cluster with no driver listing
  *    bottleneck beyond the initial enumerate.
  *
  * Usage: `spark.read.format("graft.sources.ChangeFeedSource")
  *   .option("path", dir).load()`.
  */
class ChangeFeedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.streaming.CdcStream.changeSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeFeedTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

class ChangeFeedTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_changefeed($path)"
  override def schema(): StructType = graft.streaming.CdcStream.changeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChangeFeedScanBuilder(
      Option(path).getOrElse(options.get("path")))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ChangeFeedWriteBuilder(
      Option(path).getOrElse(info.options.get("path")), info.schema())
}

/** V2 WRITE path: each task stages its rows as a uniquely-named
  * `.staged` file (invisible to the reader, which lists `*.json`
  * only); the DRIVER commit renames every staged file to `.json` in
  * one pass after all tasks succeeded — a partial job leaves only
  * ignorable staging debris, never a half-visible feed. `truncate`
  * (overwrite mode) deletes the existing `.json` files inside the
  * same commit, AFTER every staged file has been renamed visible —
  * a crash between the two passes leaves old+new (recoverable),
  * never an empty feed. */
class ChangeFeedWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ChangeFeedBatchWrite(path, schema, doTruncate)
  }
}

case class StagedFile(file: String) extends WriterCommitMessage

class ChangeFeedBatchWrite(path: String, schema: StructType,
                           truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    ChangeFeedWriterFactory(path, schema)

  private def fs() = new Path(path).getFileSystem(
    org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs()
    // Snapshot the pre-existing .json files BEFORE renaming, then
    // rename staged→.json FIRST and delete the olds LAST: a driver
    // crash mid-commit leaves old+new feed (re-readable, recoverable),
    // never an empty or partial feed. Deleting first would open a
    // window where the feed has no committed files at all.
    val olds: Seq[Path] = if (truncate) {
      val it = f.listFiles(new Path(path), true)
      val b = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".json"))
          b += st.getPath
      }
      b.toSeq
    } else Nil
    // qualified on BOTH sides: `olds` paths come from listFiles (fully
    // qualified), dsts are built from raw commit-message strings — an
    // unqualified dst would never compare equal and silently disarm
    // the guard below
    val renamed = messages.map { case StagedFile(file) =>
      val src = new Path(file)
      val dst = new Path(file.stripSuffix(".staged"))
      if (!f.rename(src, dst))
        throw new java.io.IOException(s"commit rename failed: $src")
      f.makeQualified(dst)
    }.toSet
    // staged part-<p>-<t> names cannot collide with prior committed
    // names within a session, but guard anyway: never delete a file
    // this commit just made visible
    olds.map(f.makeQualified).filterNot(renamed.contains)
      .foreach(p => f.delete(p, false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs()
    messages.foreach {
      case StagedFile(file) => f.delete(new Path(file), false)
      case _ =>
    }
  }
}

case class ChangeFeedWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new ChangeFeedWriter(path, schema, partitionId, taskId)
}

/** Serializes rows to the feed's JSON-lines format. The staged name
  * carries (partition, task) so speculative/retried attempts never
  * collide; only the committed attempt's file gets renamed. */
class ChangeFeedWriter(path: String, schema: StructType,
                       partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val file =
    s"$path/part-$partitionId-$taskId.json.staged"
  private val p = new Path(file)
  private val out = {
    val f = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      f.create(p, true), "UTF-8"))
  }
  private val names = schema.fields.map(_.name)

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder("{")
    var i = 0
    while (i < names.length) {
      if (i > 0) sb.append(',')
      sb.append('"').append(names(i)).append("\":")
      names(i) match {
        case "event_id" | "user_id" => sb.append(row.getLong(i))
        case "value" => sb.append(row.getDouble(i))
        case _ =>
          // event_type / ts_s carry no JSON-special chars in this
          // format; escape quotes/backslashes anyway for safety
          val s = row.getUTF8String(i).toString
            .replace("\\", "\\\\").replace("\"", "\\\"")
          sb.append('"').append(s).append('"')
      }
      i += 1
    }
    out.write(sb.append('}').toString)
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(file)
  }

  override def abort(): Unit = {
    out.close()
    new Path(file).getFileSystem(
      new org.apache.hadoop.conf.Configuration()).delete(p, false)
  }

  override def close(): Unit = ()
}

class ChangeFeedScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private val full = graft.streaming.CdcStream.changeSchema
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  // A filter may be CLAIMED only if the reader can actually evaluate
  // it: ChangeFeedReader.passes() compares Long values only, so the
  // attribute AND the literal's runtime type must both qualify —
  // claiming on the name alone would let a non-Long literal (schema
  // evolution, different literal type) slip through the reader's
  // `case _ => true` and return silently-unfiltered rows that Catalyst
  // no longer re-checks.
  private def longCol(a: String, v: Any): Boolean =
    (a == "event_id" || a == "user_id") && v.isInstanceOf[java.lang.Long]

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v) => longCol(a, v)
    case GreaterThan(a, v) => longCol(a, v)
    case GreaterThanOrEqual(a, v) => longCol(a, v)
    case LessThan(a, v) => longCol(a, v)
    case LessThanOrEqual(a, v) => longCol(a, v)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(supported)
    pushed = ours
    residual // Catalyst keeps evaluating what the reader can't
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = ChangeFeedScan(path, required, pushed)
}

case class ChangeFeedScan(path: String, required: StructType,
                          filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_changefeed path=$path, PrunedSchema: ${required.simpleString}, " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".json"))
        files += f.getPath.toString
    }
    files.sorted.map(ChangeFeedPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangeFeedReaderFactory(required, filters)
}

case class ChangeFeedPartition(file: String) extends InputPartition

case class ChangeFeedReaderFactory(required: StructType,
                                   filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ChangeFeedReader(p.asInstanceOf[ChangeFeedPartition].file,
      required, filters)
}

/** Streams one feed file: parse line → apply pushed filters → project
  * to the pruned schema. Long comparisons only; a row failing a pushed
  * filter is dropped before an InternalRow is ever built. */
class ChangeFeedReader(file: String, required: StructType,
                       filters: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val path = new Path(file)
  // executor-side: a fresh Configuration resolves the local/default FS;
  // a cluster targeting a non-default FS would ship a
  // SerializableConfiguration through the reader factory instead
  private val in = path.getFileSystem(
    new org.apache.hadoop.conf.Configuration()).open(path)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, "UTF-8"))
  private var row: InternalRow = _

  private def passes(eventId: Long, userId: Long): Boolean =
    filters.forall {
      case EqualTo("event_id", v: Long) => eventId == v
      case GreaterThan("event_id", v: Long) => eventId > v
      case GreaterThanOrEqual("event_id", v: Long) => eventId >= v
      case LessThan("event_id", v: Long) => eventId < v
      case LessThanOrEqual("event_id", v: Long) => eventId <= v
      case EqualTo("user_id", v: Long) => userId == v
      case GreaterThan("user_id", v: Long) => userId > v
      case GreaterThanOrEqual("user_id", v: Long) => userId >= v
      case LessThan("user_id", v: Long) => userId < v
      case LessThanOrEqual("user_id", v: Long) => userId <= v
      case _ => true
    }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        val eventId = node.get("event_id").asLong()
        val userId = node.get("user_id").asLong()
        if (passes(eventId, userId)) {
          val vals = required.fields.map(_.name).map {
            case "event_id" => java.lang.Long.valueOf(eventId)
            case "user_id" => java.lang.Long.valueOf(userId)
            case "event_type" =>
              UTF8String.fromString(node.get("event_type").asText())
            case "value" =>
              java.lang.Double.valueOf(node.get("value").asDouble())
            case "ts_s" => UTF8String.fromString(node.get("ts_s").asText())
          }
          row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
          return true
        }
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
