package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.{GraftTable, GraftViewBridge, MaterializedViews}

/** Continuous materialized-view maintenance: tail the base table's
  * streaming change feed and run `REFRESH MATERIALIZED VIEW` after each
  * delivered micro-batch, so the MV tracks the base with incremental
  * per-batch cost instead of a scheduled full recompute.
  *
  * This composes three pieces that are each already verified in
  * isolation, and adds NO new correctness surface:
  *
  *  - the change-feed streaming source
  *    ([[graft.sources.GraftMicroBatchStream]]) provides checkpointed
  *    commit offsets and restart resume — the maintainer survives a
  *    driver restart and never re-processes a drained range;
  *  - `foreachBatch` serializes batches, so refreshes never overlap
  *    from one maintainer;
  *  - the refresh router ([[graft.sources.MaterializedViews]]) picks
  *    fold / cdc group-repair / full per range, with the pending-marker
  *    crash bracket.
  *
  * The stream's CONTENT is deliberately ignored: it acts purely as a
  * commit notification. REFRESH re-reads the exact outstanding range
  * `(recorded, current]` from commit metadata — including hydrated MOR
  * preimages, which the streaming feed itself cannot carry (its offsets
  * are the hydration anchor, see MergeOnReadSpec's hydrated-batch-feed
  * pattern). That makes the maintainer self-healing under every failure
  * interleaving: if a refresh crashes after the batch is checkpointed,
  * the NEXT batch's refresh covers the missed commits too (the range is
  * derived from the MV's recorded version, not from stream offsets),
  * and a re-run refresh over an already-applied range is a "noop".
  * The one at-least-once caveat: if the base stops committing forever,
  * a refresh lost to a crash on the final batch leaves the MV stale
  * until the next commit or a manual REFRESH.
  *
  * Scale shape at 100 TB: each micro-batch triggers one refresh whose
  * cost is O(that range's delta) — appended files for the fold tier,
  * affected groups for the cdc tier — while the stream itself moves only
  * commit metadata into the driver. `Trigger.AvailableNow()` drains a
  * backlog as capped batches and terminates (batch jobs);
  * `Trigger.ProcessingTime` keeps a long-running maintainer.
  */
object MvMaintain {

  /** Start a maintainer for materialized view `mv` (a dotted
    * catalog-qualified name). The base table is resolved from the MV's
    * own recorded properties, so callers name only the view. Each
    * refresh reports `(baseVersion, mode)` to `onRefresh` — route
    * census for tests and monitoring ("full" showing up where
    * "incremental"/"incremental-cdc" is expected is a regression
    * signal, not a correctness problem). */
  def start(spark: SparkSession, mv: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onRefresh: (Long, String) => Unit = (_, _) => ()): StreamingQuery = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(mv)
    val quoted = parts.map(p => s"`$p`").mkString(".")
    val (cat, id) = GraftViewBridge.resolveIdent(spark, parts).getOrElse(
      throw new IllegalArgumentException(
        s"graft: $mv is not in a graft catalog"))
    val t = cat.loadTable(id).asInstanceOf[GraftTable]
    val base = Option(t.properties().get(MaterializedViews.BaseProp))
      .getOrElse(throw new IllegalArgumentException(
        s"graft: $mv is not a materialized view"))
    val (bCat, bId) =
      GraftViewBridge.resolveIdent(spark, base.split('.').toSeq).getOrElse(
        throw new IllegalArgumentException(
          s"graft: base table $base of $mv not found"))
    val baseDir = bCat.loadTable(bId).asInstanceOf[GraftTable].tableDir
    spark.readStream.format("graft")
      .option("change-feed", "true")
      .load(baseDir)
      .writeStream
      // an always-refresh (vs inspecting the batch) costs one metadata
      // read when there is nothing to do — REFRESH itself reports "noop"
      .foreachBatch { (_: DataFrame, _: Long) =>
        val r = spark.sql(s"REFRESH MATERIALIZED VIEW $quoted").collect().head
        onRefresh(r.getLong(0), r.getString(1))
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
