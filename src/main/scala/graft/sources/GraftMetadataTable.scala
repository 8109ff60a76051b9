package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Queryable metadata tables, Iceberg-style: `` t$files ``,
  * `` t$snapshots ``, `` t$wap `` resolve through [[GraftCatalog]] to
  * relational views of a table's OWN metadata — find the biggest files,
  * watch snapshot growth, audit pending write-audit-publish stages, all
  * in SQL and joinable against anything:
  *
  * {{{ SELECT partition, SUM(rows) FROM graft.ns.`docs$files` GROUP BY 1 }}}
  *
  * Rows come from the side files the engine already maintains (stats
  * registry, snapshot log, tags) — the same driver-resident metadata
  * every scan plans from, read once at planInputPartitions; no data file
  * is opened. */
final class GraftMetadataTable(base: GraftTable, kind: String)
    extends Table with SupportsRead {

  override def name(): String = s"${base.name()}$$$kind"
  override def schema(): StructType = GraftMetadataTable.schemaOf(kind)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = schema()
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftMetadataPartition(
            GraftMetadataTable.rows(base, kind), schema()))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftMetadataReaderFactory
      }
    }
}

object GraftMetadataTable {
  val Kinds: Set[String] = Set("files", "snapshots", "wap", "partitions")

  def schemaOf(kind: String): StructType = kind match {
    case "files" => StructType.fromDDL(
      "file STRING, partition STRING, rows BIGINT, bytes BIGINT, " +
        "seq BIGINT, sorted BOOLEAN, is_delete BOOLEAN")
    case "partitions" => StructType.fromDDL(
      "partition STRING, files BIGINT, rows BIGINT, bytes BIGINT")
    case "snapshots" => StructType.fromDDL(
      "version BIGINT, kind STRING, files BIGINT, rows BIGINT, " +
        "bytes BIGINT, tags STRING")
    case "wap" => StructType.fromDDL(
      "wap_id STRING, files BIGINT, rows BIGINT, audit_version BIGINT")
  }

  /** Driver-side row materialization from the metadata side files. */
  def rows(base: GraftTable, kind: String): Seq[Seq[Any]] = {
    val dataDir = new Path(base.dataDir)
    val fs = dataDir.getFileSystem(new Configuration())
    kind match {
      case "files" =>
        TableStats.read(fs, dataDir).toSeq.sortBy(_._1).map { case (rel, e) =>
          val i = rel.lastIndexOf('/')
          val part = if (i < 0) "" else rel.substring(0, i)
          Seq(rel, part, e.rows, e.bytes, e.seq, e.sorted,
            GraftDeletes.isDeleteRel(rel))
        }
      case "partitions" =>
        // the skew/size view ops actually wants: one row per partition,
        // straight off the registry — "which day is oversized" at 100 TB
        // without listing a single data file. Merge-on-read delete files
        // live under a table-global `_deletes/` prefix, not inside any
        // partition — they are excluded here (per-file attribution is in
        // `$files.is_delete`; the table-level count in DESCRIBE DETAIL).
        // Rows are REGISTERED counts: upper bounds while equality
        // deletes are outstanding, exact otherwise.
        TableStats.read(fs, dataDir).toSeq
          .filterNot(e => GraftDeletes.isDeleteRel(e._1))
          .groupBy { case (rel, _) =>
            val i = rel.lastIndexOf('/')
            if (i < 0) "" else rel.substring(0, i)
          }
          .toSeq.sortBy(_._1)
          .map { case (part, es) =>
            Seq(part, es.size.toLong,
              es.map(_._2.rows).sum,
              es.map(e => math.max(e._2.bytes, 0L)).sum)
          }
      case "snapshots" =>
        val tags = Snapshots.tags(fs, dataDir).toSeq
          .groupBy(_._2).map { case (v, ts) => v -> ts.map(_._1).sorted }
        Snapshots.list(fs, dataDir).map { case (v, _) =>
          val m = Snapshots.read(fs, dataDir, v).getOrElse(Map.empty)
          val k = ChangeLog.kindOf(fs, dataDir, v).map(_.name).getOrElse("commit")
          Seq(v, k, m.size.toLong, m.valuesIterator.map(_.rows).sum,
            m.valuesIterator.map(e => math.max(e.bytes, 0L)).sum,
            tags.getOrElse(v, Nil).mkString(","))
        }
      case "wap" =>
        Snapshots.listWap(fs, dataDir).map { id =>
          val adds = Snapshots.readWap(fs, dataDir, id).getOrElse(Map.empty)
          val auditV = Snapshots.resolveTag(fs, dataDir, Snapshots.wapTag(id))
            .getOrElse(-1L)
          Seq(id, adds.size.toLong, adds.valuesIterator.map(_.rows).sum, auditV)
        }
      case other => throw new IllegalArgumentException(
        s"graft: unknown metadata table kind '$other'")
    }
  }
}

final case class GraftMetadataPartition(rows: Seq[Seq[Any]], schema: StructType)
    extends InputPartition

object GraftMetadataReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val GraftMetadataPartition(rows, schema) = p
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val vals = it.next().zip(schema.fields).map {
          case (null, _) => null
          case (v: String, _) => UTF8String.fromString(v)
          case (v, _) => v
        }
        cur = InternalRow.fromSeq(vals)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
