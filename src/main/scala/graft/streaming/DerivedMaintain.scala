package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.max
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.{GraftTable, GraftViewBridge, TableStats, Transactions}

/** EXACTLY-ONCE streaming maintenance of derived tables: tail an
  * append-only source table and, per micro-batch, derive rows from the
  * source's outstanding delta and commit them TOGETHER with a watermark
  * advance in one multi-table transaction ([[graft.sources.Transactions]]).
  *
  * This is the streaming production shape of q154's incremental ANN
  * index: postings derived from each ingest batch must land in the
  * index tables exactly once — an at-least-once `foreachBatch` that
  * appended postings and then crashed before recording the watermark
  * would double-encode the batch on replay. The bracket closes that
  * hole:
  *
  *  - the WATERMARK (max of `metaTable`'s `indexed_version` column, an
  *    append-only log) names the last source version the derived
  *    tables cover;
  *  - each batch derives from the verified incremental scan
  *    `(watermark, live]` — the stream itself is only a commit
  *    notification, so batch boundaries never matter;
  *  - derived appends + the new watermark row commit ATOMICALLY: a
  *    replayed batch either sees the advanced watermark (empty range,
  *    no-op) or finds the transaction rolled back by [[Transactions
  *    .recover]] and re-derives — never half;
  *  - recover() runs once at maintainer start, healing any transaction
  *    a previous maintainer left mid-protocol (single maintainer per
  *    source — two would race the watermark, same as any single-writer
  *    streaming sink).
  *
  * Scale shape: per batch the source contributes only the delta rows
  * (incremental snapshot scan — never the corpus), `derive` is the
  * user's distributed plan over that delta (for the ANN index: the
  * frozen-quantizer encode against KB-sized broadcast tables), and the
  * commit is one marker create + one registry swap per derived table.
  */
object DerivedMaintain {

  /** Start the maintainer.
    *
    * @param source     append-only catalog-qualified source table
    * @param metaTable  watermark log `(indexed_version BIGINT)`; empty
    *                   means derive from the beginning
    * @param derive     delta rows => (derived table, rows to append)*;
    *                   must be deterministic given the delta
    * @param recoverAgeMillis age guard for rolling back an undecided
    *                   transaction found at start. Default matches
    *                   [[Transactions.recover]]'s own (1 h): the source's
    *                   coordinator may be SHARED with other maintainers
    *                   (one warehouse = one coordinator), and a 0 guard
    *                   would roll back a LIVE sibling's between-intent-
    *                   and-decide stage — its fold silently lost while it
    *                   reports success. Pass 0 only when provably no
    *                   other coordinator user can be alive (tests).
    */
  def start(spark: SparkSession, source: String, metaTable: String,
      checkpoint: String,
      derive: DataFrame => Seq[(String, DataFrame)],
      trigger: Trigger = Trigger.AvailableNow(),
      recoverAgeMillis: Long = 3600L * 1000,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {

    def tableDir(name: String): String = {
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(name)
      val (cat, id) = GraftViewBridge.resolveIdent(spark, parts).getOrElse(
        throw new IllegalArgumentException(
          s"graft: $name is not in a graft catalog"))
      cat.loadTable(id).asInstanceOf[GraftTable].tableDir
    }
    val srcDir = tableDir(source)
    // the source's own table dir coordinates this maintainer's
    // transactions (<srcDir>/_txn): self-contained, and recover() here
    // can only ever touch this source's maintenance transactions
    Transactions.recover(spark, srcDir, recoverAgeMillis)

    def liveVersion(): Long = {
      val d = new Path(srcDir, "data")
      TableStats.liveVersion(d.getFileSystem(new Configuration()), d).getOrElse(0L)
    }
    spark.readStream.format("graft")
      .load(srcDir)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        val recorded = spark.table(metaTable)
          .agg(max("indexed_version")).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
        val now = liveVersion()
        if (now > recorded) {
          // end pinned at `now`: a commit racing this batch must not be
          // derived here AND again after the watermark advances to `now`
          val delta = spark.read.option("since-version", recorded)
            .option("snapshot-version", now).table(source)
          val outs = derive(delta)
          import spark.implicits._
          Transactions.run(spark, srcDir) { txn =>
            outs.foreach { case (t, df) => txn.write(t, df) }
            txn.write(metaTable, Seq(now).toDF("indexed_version"))
          }
          onBatch(recorded, now)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
