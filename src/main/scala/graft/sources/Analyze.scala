package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANALYZE TABLE analog: one distributed pass computes per-column NDV
  * (HyperLogLog++, the sketch that scales to 100 TB — never an exact
  * distinct) and null counts, persisted as the `_ndv.tsv` side file next
  * to the stats registry. [[GraftScan.estimateStatistics]] surfaces them
  * as `distinctCount`/`nullCount` column statistics, which is what
  * Spark's CBO needs to size joins and pick build sides over graft
  * tables. Advisory by design: a stale NDV degrades estimates, never
  * correctness — re-run after large loads (the file records the snapshot
  * version it was computed at).
  */
object Analyze {
  val FileName = "_ndv.tsv"

  /** @return per analyzed column: (ndv, nullCount) */
  def run(spark: SparkSession, table: GraftTable,
          cols: Seq[String] = Nil): Map[String, (Long, Long)] = {
    val names =
      if (cols.nonEmpty) cols
      else table.schema0.fields.map(_.name).toSeq
    val dataDir = new Path(table.dataDir)
    val fs = dataDir.getFileSystem(new Configuration())
    val tableDir = dataDir.getParent.toString
    val df = spark.read.format("graft").load(tableDir)
    val aggs = names.flatMap(c => Seq(
      approx_count_distinct(col(c)).as(s"__ndv_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"__null_$c")))
    val row = df.select(aggs: _*).head()
    val out = names.zipWithIndex.map { case (c, i) =>
      c -> (row.getLong(2 * i), if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1))
    }.toMap
    val version = Snapshots.list(fs, dataDir).lastOption.map(_._1).getOrElse(0L)
    write(fs, dataDir, out, version)
    out
  }

  private def write(fs: FileSystem, dataDir: Path,
                    stats: Map[String, (Long, Long)], version: Long): Unit = {
    val body = (s"#version\t$version" +:
      stats.toSeq.sorted.map { case (c, (ndv, nulls)) => s"$c\t$ndv\t$nulls" })
      .mkString("", "\n", "\n")
    val tmp = new Path(dataDir.getParent, s".$FileName.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    TableStats.renameOverwrite(fs, tmp, new Path(dataDir, FileName))
  }

  /** The persisted column stats, or empty if the table was never analyzed. */
  def read(fs: FileSystem, dataDir: Path): Map[String, (Long, Long)] = {
    val p = new Path(dataDir, FileName)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    text.split('\n').filter(l => l.nonEmpty && !l.startsWith("#")).flatMap { l =>
      l.split('\t') match {
        case Array(c, ndv, nulls) =>
          for (n <- ndv.toLongOption; z <- nulls.toLongOption) yield c -> (n, z)
        case _ => None
      }
    }.toMap
  }
}
