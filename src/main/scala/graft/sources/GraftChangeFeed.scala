package graft.sources

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** STREAMING CHANGE FEED over a graft table — the continuous spelling of
  * [[Snapshots.changes]]:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("change-feed", "true")
  *     .option("starting-version", 0)   // default 0 = full history
  *     .load(tableDir)
  * }}}
  *
  * Offsets are SNAPSHOT VERSIONS (one long, checkpoint-friendly); each
  * micro-batch replays the commits in `(start, end]`: appended data files
  * stream out as `_change_type = 'insert'` rows (only the added files are
  * read — each poll touches the delta, never the corpus), merge-on-read
  * mutations as `'delete'` rows carrying their equality keys (row_key
  * populated, data columns NULL), with `_commit_version` on every row.
  * Deterministic replay: the same version range plans the same rows, so
  * a restarted query resumes exactly from its checkpoint.
  *
  * Copy-on-write rewrites fail the stream loudly (their per-row delta is
  * not recorded — same contract as the batch feed); compaction dropping a
  * folded delete entry is recognized as housekeeping. This is what keeps
  * a downstream incremental consumer (MV maintenance, index sync,
  * replication) exact across mutations, where the plain file-tailing
  * source must refuse them.
  */
final class GraftChangeFeedTable(
    baseSchema: StructType,
    tableDir: String,
    startingVersion: Long)
    extends Table with SupportsRead {

  // data columns are forced nullable: delete rows carry NULL in every
  // non-key column, and a declared NOT NULL would let the optimizer fold
  // IS NULL checks and codegen read garbage from null slots
  private val feedSchema = StructType(
    baseSchema.fields.map(_.copy(nullable = true)) ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))

  override def name(): String = s"graft-changes.`$tableDir`"
  override def schema(): StructType = feedSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = feedSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftChangeFeedStream(baseSchema, s"$tableDir/data", startingVersion)
        override def description(): String = name()
      }
    }
}

final case class GraftVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** One appended data file of one commit. */
final case class ChangeInsertPartition(path: String, version: Long)
    extends InputPartition

/** The equality-delete keys one commit added (driver-read: delete files
  * are the small side by design). */
final case class ChangeDeletePartition(keys: Array[String], version: Long)
    extends InputPartition

final class GraftChangeFeedStream(
    baseSchema: StructType,
    dataDir: String,
    startingVersion: Long)
    extends MicroBatchStream {

  private def open(): (org.apache.hadoop.fs.FileSystem, Path) = {
    val d = new Path(dataDir)
    (d.getFileSystem(new Configuration()), d)
  }

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion)

  override def latestOffset(): Offset = {
    val (fs, dir) = open()
    GraftVersionOffset(
      Snapshots.list(fs, dir).lastOption.map(_._1).getOrElse(startingVersion))
  }

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val v1 = start.asInstanceOf[GraftVersionOffset].v
    val v2 = end.asInstanceOf[GraftVersionOffset].v
    if (v2 <= v1) return Array.empty
    val (fs, dir) = open()
    def manifestAt(v: Long): Map[String, TableStats.Entry] =
      if (v == 0) Map.empty
      else Snapshots.read(fs, dir, v).getOrElse(throw new IllegalStateException(
        s"graft: change feed needs snapshot v$v of $dataDir but it expired " +
          "(vacuumed) — restart the stream from a newer starting-version"))
    var prev = manifestAt(v1)
    val out = scala.collection.mutable.ArrayBuffer[InputPartition]()
    // every version in the range must still be resolvable: silently
    // skipping a vacuumed snapshot would collapse several commits into
    // one diff (wrong _commit_version) and could hide a COW rewrite that
    // happened entirely inside the gap — determinism demands all-or-fail
    for (v <- (v1 + 1) to v2) {
      val cur = manifestAt(v)
      val added = (cur.keySet -- prev.keySet).toSeq.sorted
      val removed = (prev.keySet -- cur.keySet).toSeq
        .filterNot(GraftDeletes.isDeleteRel)
      if (removed.nonEmpty) throw new IllegalStateException(
        s"graft: change feed of $dataDir crosses a copy-on-write rewrite " +
          s"at v$v (${removed.size} data file(s) left the manifest); use " +
          "write.mutation.mode=merge-on-read for CDC-capable mutations")
      val (delRels, dataRels) = added.partition(GraftDeletes.isDeleteRel)
      dataRels.foreach(rel => out += ChangeInsertPartition(s"$dataDir/$rel", v))
      if (delRels.nonEmpty) {
        require(baseSchema.fieldNames.contains(graft.functions.ColumnNames.RowKey),
          s"graft: delete entries in $dataDir but no row_key column")
        val keys = delRels.flatMap(rel => GraftDeletes.readKeys(fs, dir, rel))
        if (keys.nonEmpty) out += ChangeDeletePartition(keys.toArray, v)
      }
      prev = cur
    }
    out.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftChangeFeedReaderFactory(baseSchema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class GraftChangeFeedReaderFactory(baseSchema: StructType)
    extends PartitionReaderFactory {

  private val keyOrdinal =
    baseSchema.fieldNames.indexOf(graft.functions.ColumnNames.RowKey)

  private def metaRow(changeType: String, version: Long): InternalRow = {
    val r = new GenericInternalRow(2)
    r.update(0, UTF8String.fromString(changeType))
    r.update(1, version)
    r
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case ChangeInsertPartition(path, version) =>
        val meta = metaRow("insert", version)
        val joined = new JoinedRow
        val reader = ParquetRowIO.newReader(
          new Path(path), baseSchema, new Configuration(), None)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            current = reader.read()
            current != null
          }
          override def get(): InternalRow = joined.apply(current, meta)
          override def close(): Unit = reader.close()
        }
      case ChangeDeletePartition(keys, version) =>
        val meta = metaRow("delete", version)
        val joined = new JoinedRow
        new PartitionReader[InternalRow] {
          private var i = -1
          private val base = new GenericInternalRow(baseSchema.length)
          override def next(): Boolean = { i += 1; i < keys.length }
          override def get(): InternalRow = {
            base.update(keyOrdinal, UTF8String.fromString(keys(i)))
            joined.apply(base, meta)
          }
          override def close(): Unit = ()
        }
    }
}
