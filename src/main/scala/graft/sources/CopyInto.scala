package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Idempotent external-file ingest — the COPY INTO analog. Landing zones
  * (an upstream job's output directory, a vendor drop, an exported
  * partition) are loaded into a graft table EXACTLY ONCE per file, no
  * matter how often the loader runs or where it crashes:
  *
  *  - the set of already-loaded files lives in a LOG TABLE (one row per
  *    file name) — queryable lineage, not a hidden sidecar;
  *  - each call lists the source directory, anti-joins the log, and
  *    commits the new files' rows AND their log entries in ONE
  *    multi-table transaction ([[Transactions]]): after a crash anywhere
  *    the batch is all-visible or all-rolled-back, so a re-run either
  *    sees the log advanced (skips the batch) or finds the transaction
  *    rolled back and re-loads it — never half, never twice;
  *  - files are identified BY NAME (the landing-zone contract:
  *    immutable, uniquely-named drops — the same contract every
  *    production COPY INTO assumes). A re-dropped name is deliberately
  *    skipped; rewritten-in-place content is NOT re-ingested.
  *
  * Scale shape: the listing is one directory's batch (bounded by the
  * drop cadence, never the table), the anti-join streams the log table
  * against the batch-sized listing (the candidate side broadcasts, the
  * log is never collected), and the data move reads only the new files.
  * Run ONE loader per (table, source) at a time — concurrent loaders
  * could both see a file as new (same discipline as any streaming
  * maintainer); crashed predecessors converge via
  * [[Transactions.recover]] at loader startup.
  */
object CopyInto {

  /** Load every not-yet-loaded `*.parquet` file under `sourceDir` into
    * `table`, recording each loaded file name in `logTable`
    * (`file_name STRING, n_bytes BIGINT`), atomically.
    *
    * @return the file names loaded by THIS call (empty = nothing new;
    *         no commit at all happens then) */
  def run(spark: SparkSession, coordDir: String, table: String,
          logTable: String, sourceDir: String): Seq[String] = {
    // resolve the target BEFORE any work (the Transactions discipline):
    // a typo'd table must fail identically on empty and non-empty batches
    val ident = spark.sessionState.sqlParser.parseMultipartIdentifier(table)
    val (cat, tid) = GraftViewBridge.resolveIdent(spark, ident).getOrElse(
      throw new IllegalArgumentException(s"graft: $table is not in a graft catalog"))
    val schema = cat.loadTable(tid).asInstanceOf[GraftTable].schema0

    val src = new Path(sourceDir)
    val fs = src.getFileSystem(new Configuration())
    if (!fs.exists(src)) return Seq.empty
    // one landing zone's listing: batch-sized by the drop cadence
    val listed = fs.listStatus(src).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getPath.toString, s.getLen))
      .sortBy(_._1)
    if (listed.isEmpty) return Seq.empty

    // new = listed ∖ log, computed DISTRIBUTIVELY: the log table can be
    // millions of rows at 100 TB — it is never collected; the batch-sized
    // listing is the broadcast side of the anti-join
    import spark.implicits._
    val cand = listed.map(_._1).toDF("file_name")
    val loaded = spark.table(logTable).select(col("file_name"))
    val newNames = cand.join(loaded, Seq("file_name"), "left_anti")
      .collect().map(_.getString(0)).toSet // batch-sized: names only
    val newFiles = listed.filter(f => newNames.contains(f._1))
    if (newFiles.isEmpty) return Seq.empty

    // read the new files with the TABLE's column list — a source file
    // missing a table column fails analysis loudly (never silent nulls
    // from a malformed drop)
    val rows = spark.read.parquet(newFiles.map(_._2): _*)
      .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    val logRows = newFiles.map(f => (f._1, f._3)).toDF("file_name", "n_bytes")

    // data + log advance together or not at all (Transactions' crash
    // matrix): a replayed batch sees the log advanced and skips
    Transactions.run(spark, coordDir) { txn =>
      txn.write(table, rows)
      txn.write(logTable, logRows.select(col("file_name"),
        col("n_bytes").cast("long").as("n_bytes")))
    }
    newFiles.map(_._1)
  }
}
