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
  * micro-batch replays the commits in `(start, end]` by their
  * [[ChangeLog]] kind, exactly like the batch feed: appends as
  * `'insert'` rows (only the added files are read — each poll touches
  * the delta, never the corpus), merge-on-read mutations as `'delete'`
  * rows (equality keys, data columns NULL) with same-commit re-writes
  * PAIRED into `'update_preimage'`/`'update_postimage'`, copy-on-write
  * mutations from their recorded change files (full pre/post images),
  * truncate/partition-DELETE/INSERT OVERWRITE as full-preimage deletes
  * plus inserts, compaction skipped, RESTORE refused. `_commit_version`
  * rides on every row. Deterministic replay: the same version range
  * plans the same rows, so a restarted query resumes exactly from its
  * checkpoint.
  *
  * Delete keys are capped per batch (`spark.graft.deletes.max.bytes`,
  * failing loudly toward compaction) and split across input partitions
  * in bounded chunks, so a mutation-heavy range can never exhaust the
  * driver or a single task.
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

/** One appended data file of one commit; `updateKeys` (sorted) are the
  * commit's delete keys — a row whose key is among them was re-written
  * by the same commit and surfaces as `update_postimage`. */
final case class ChangeInsertPartition(
    path: String, version: Long, updateKeys: Array[String])
    extends InputPartition

/** A bounded chunk of the equality-delete keys one commit added
  * (driver-read: delete files are the small side by design, and large
  * sets split across chunks). `insertedFiles` are the same commit's data
  * files — a key that re-appears there pairs as `update_preimage`. */
final case class ChangeDeletePartition(
    keys: Array[String], version: Long, insertedFiles: Array[String])
    extends InputPartition

/** One recorded change file of a copy-on-write commit (carries its own
  * `_change_type` column — see [[ChangeLog.stageCowChanges]]). */
final case class ChangeCowPartition(path: String, version: Long)
    extends InputPartition

/** One file a replace commit (truncate / partition DELETE / INSERT
  * OVERWRITE) removed: its surviving rows stream out as full-preimage
  * deletes. `dropKeys` (sorted) are equality-delete keys that had
  * already suppressed rows of this file. */
final case class ChangeRemovedPartition(
    path: String, version: Long, dropKeys: Array[String])
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

  /** Key-chunk size for delete partitions: bounds per-task closures while
    * keeping task counts sane. */
  private val KeysPerChunk = 65536

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val v1 = start.asInstanceOf[GraftVersionOffset].v
    val v2 = end.asInstanceOf[GraftVersionOffset].v
    if (v2 <= v1) return Array.empty
    val (fs, dir) = open()
    val key = graft.functions.ColumnNames.RowKey
    val keyed = baseSchema.fieldNames.contains(key)
    def manifestAt(v: Long): Map[String, TableStats.Entry] =
      if (v == 0) Map.empty
      else Snapshots.read(fs, dir, v).getOrElse(throw new IllegalStateException(
        s"graft: change feed needs snapshot v$v of $dataDir but it expired " +
          "(vacuumed) — restart the stream from a newer starting-version"))
    val cap = GraftDeletes.byteCap()
    var delBytes = 0L
    def capCheck(add: Long): Unit = {
      delBytes += add
      if (delBytes > cap) throw new IllegalStateException(
        s"graft: change feed batch ($v1, $v2] of $dataDir would materialize " +
          s"$delBytes bytes of delete keys on the driver (> cap $cap); run " +
          "Compaction.compact (or OPTIMIZE) and restart from a newer version, " +
          "or raise spark.graft.deletes.max.bytes")
    }
    var prev = manifestAt(v1)
    val out = scala.collection.mutable.ArrayBuffer[InputPartition]()
    // every version in the range must still be resolvable: silently
    // skipping a vacuumed snapshot would collapse several commits into
    // one diff (wrong _commit_version) and could hide a rewrite that
    // happened entirely inside the gap — determinism demands all-or-fail
    for (v <- (v1 + 1) to v2) {
      // WAP audit snapshots are side branches: skip WITHOUT advancing
      // prev (adds surface at the publish version, or never if discarded)
      if (ChangeLog.kindOf(fs, dir, v).contains(ChangeLog.Staged)) ()
      else {
      val cur = manifestAt(v)
      val added = (cur.keySet -- prev.keySet).toSeq.sorted
      val removedData = (prev.keySet -- cur.keySet).toSeq.sorted
        .filterNot(GraftDeletes.isDeleteRel)
      def abs(rel: String): String = s"$dataDir/$rel"
      ChangeLog.kindOf(fs, dir, v) match {
        case Some(ChangeLog.Staged) => () // handled above
        case Some(ChangeLog.Maintenance) => () // rows moved, not changed
        case Some(ChangeLog.Restore) =>
          throw new IllegalStateException(
            s"graft: change feed of $dataDir crosses a RESTORE at v$v; " +
              "re-read a full snapshot and restart the stream past it")
        case Some(ChangeLog.Cow) =>
          val cf = ChangeLog.changeFiles(fs, dir, v).getOrElse(
            throw new IllegalStateException(
              s"graft: copy-on-write commit at v$v of $dataDir recorded no " +
                s"change data (no $key column, or ${ChangeLog.RecordProp}=false)"))
          cf.foreach(p => out += ChangeCowPartition(p, v))
        case Some(ChangeLog.Replace) =>
          if (removedData.nonEmpty) {
            val delRels = prev.toSeq.filter(e => GraftDeletes.isDeleteRel(e._1))
            val dkeys =
              if (delRels.isEmpty) Nil
              else {
                capCheck(delRels.map(e => math.max(e._2.bytes, 0L)).sum)
                delRels.flatMap { case (rel, e) =>
                  GraftDeletes.readKeys(fs, dir, rel).map(k => (k, e.seq)) }
              }
            removedData.foreach { rel =>
              val seq = math.max(prev(rel).seq, 0L)
              val ks = dkeys.collect { case (k, ds) if ds > seq => k }
                .distinct.sorted.toArray
              out += ChangeRemovedPartition(abs(rel), v, ks)
            }
          }
          added.filterNot(GraftDeletes.isDeleteRel)
            .foreach(rel => out += ChangeInsertPartition(abs(rel), v, Array.empty))
        case None =>
          if (removedData.nonEmpty) throw new IllegalStateException(
            s"graft: change feed of $dataDir crosses a rewrite at v$v " +
              s"(${removedData.size} data file(s) left the manifest) whose " +
              "per-row delta was not recorded (commit predates change " +
              s"recording, or ${ChangeLog.RecordProp}=false)")
          val (delRels, dataRels) = added.partition(GraftDeletes.isDeleteRel)
          if (delRels.isEmpty)
            dataRels.foreach(rel =>
              out += ChangeInsertPartition(abs(rel), v, Array.empty))
          else {
            require(keyed, s"graft: delete entries in $dataDir but no $key column")
            capCheck(delRels.map(rel => math.max(cur(rel).bytes, 0L)).sum)
            val keys = delRels.flatMap(rel => GraftDeletes.readKeys(fs, dir, rel))
              .distinct.sorted.toArray
            val insFiles = dataRels.map(abs).toArray
            dataRels.foreach(rel => out += ChangeInsertPartition(abs(rel), v, keys))
            keys.grouped(KeysPerChunk).foreach(chunk =>
              out += ChangeDeletePartition(chunk, v, insFiles))
          }
      }
      prev = cur
      }
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

  private def contains(sorted: Array[String], k: String): Boolean =
    sorted.length > 0 &&
      java.util.Arrays.binarySearch(
        sorted.asInstanceOf[Array[AnyRef]], k) >= 0

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case ChangeInsertPartition(path, version, updateKeys) =>
        val insMeta = metaRow("insert", version)
        val postMeta = metaRow("update_postimage", version)
        val joined = new JoinedRow
        val reader = ParquetRowIO.newReader(
          new Path(path), baseSchema, new Configuration(), None)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            current = reader.read()
            current != null
          }
          override def get(): InternalRow = {
            val isUpdate = updateKeys.length > 0 && keyOrdinal >= 0 &&
              !current.isNullAt(keyOrdinal) &&
              contains(updateKeys, current.getUTF8String(keyOrdinal).toString)
            joined.apply(current, if (isUpdate) postMeta else insMeta)
          }
          override def close(): Unit = reader.close()
        }

      case ChangeDeletePartition(keys, version, insertedFiles) =>
        val delMeta = metaRow("delete", version)
        val preMeta = metaRow("update_preimage", version)
        val joined = new JoinedRow
        new PartitionReader[InternalRow] {
          // keys re-written by the same commit pair as updates: read the
          // commit's OWN files' key column (columnar-pruned, bounded by
          // the commit's delta — never the table)
          private lazy val reinserted: java.util.HashSet[String] = {
            val set = new java.util.HashSet[String]()
            if (keyOrdinal >= 0) {
              val keySchema = StructType(Seq(baseSchema(keyOrdinal)))
              val conf = new Configuration()
              insertedFiles.foreach { f =>
                val r = ParquetRowIO.newReader(new Path(f), keySchema, conf, None)
                try {
                  var row = r.read()
                  while (row != null) {
                    if (!row.isNullAt(0)) set.add(row.getUTF8String(0).toString)
                    row = r.read()
                  }
                } finally r.close()
              }
            }
            set
          }
          private var i = -1
          private val base = new GenericInternalRow(baseSchema.length)
          override def next(): Boolean = { i += 1; i < keys.length }
          override def get(): InternalRow = {
            base.update(keyOrdinal, UTF8String.fromString(keys(i)))
            joined.apply(base,
              if (reinserted.contains(keys(i))) preMeta else delMeta)
          }
          override def close(): Unit = ()
        }

      case ChangeCowPartition(path, version) =>
        // recorded change files carry their own _change_type column; only
        // _commit_version is appended here
        val verRow = new GenericInternalRow(1)
        verRow.update(0, version)
        val joined = new JoinedRow
        val reader = ParquetRowIO.newReader(new Path(path),
          ChangeLog.changeSchema(baseSchema), new Configuration(), None)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            current = reader.read()
            current != null
          }
          override def get(): InternalRow = joined.apply(current, verRow)
          override def close(): Unit = reader.close()
        }

      case ChangeRemovedPartition(path, version, dropKeys) =>
        val meta = metaRow("delete", version)
        val joined = new JoinedRow
        val reader = ParquetRowIO.newReader(
          new Path(path), baseSchema, new Configuration(), None)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            current = reader.read()
            // rows an earlier equality delete already suppressed are not
            // deletes of THIS commit — skip them
            while (current != null && dropKeys.length > 0 && keyOrdinal >= 0 &&
                !current.isNullAt(keyOrdinal) &&
                contains(dropKeys, current.getUTF8String(keyOrdinal).toString))
              current = reader.read()
            current != null
          }
          override def get(): InternalRow = joined.apply(current, meta)
          override def close(): Unit = reader.close()
        }
    }
}
