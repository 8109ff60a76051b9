package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.{ChangeLog, GraftTable, GraftViewBridge, Snapshots, TableStats, Transactions}

/** Streaming maintenance for the persisted retrieval indexes (the FTS
  * tables of q170/q171, the ANN tables of q154/q172): tail the ingest
  * table's change feed and, per micro-batch, drive the SAME transactional
  * fold routines the batch gates verify — so an ingesting corpus keeps
  * its indexes fresh with no orchestration and NO manual fold calls.
  *
  * [[DerivedMaintain]] is this maintainer's append-only ancestor; the
  * difference is mutation support. Each batch classifies its outstanding
  * interval `(watermark, live]` by the change feed's own content:
  *
  *  - inserts only → `foldAppend` gets the verified incremental snapshot
  *    scan of the delta (cheapest path: O(delta), no tombstones, no
  *    endpoint-state reads — an append-only workload never accretes
  *    tombstone debt from its maintainer);
  *  - any delete/update → `foldFeed` gets the commit-recorded change
  *    feed for the interval (the q171/q172 endpoint-state fold: affected
  *    ids from the feed, content re-read WHOLE from the source pinned at
  *    the interval end).
  *
  * The stream itself is only a COMMIT NOTIFICATION (the MvMaintain
  * discipline): each batch re-derives the interval from the index's own
  * recorded watermark to the source's live head, both ends pinned, so
  * batch boundaries never matter, a crashed batch is covered whole by
  * the next one, and a replayed batch (fresh checkpoint, restarted
  * query) sees watermark == head and no-ops. Exactly-once comes from the
  * fold routines themselves: they advance the watermark IN the same
  * multi-table transaction as the index rows. `recover()` at start heals
  * any transaction a previous maintainer left mid-protocol
  * (single-maintainer per index, like any single-writer sink).
  *
  * The classification probe costs one delta-sized job per batch (does
  * the feed hold a non-insert row?) — O(batch), never O(table). Scale
  * shape at 100 TB: per trigger, one metadata read (watermark + head),
  * one delta-sized classification, one fold at O(batch tokens).
  *
  * Single-maintainer is ENFORCED, not discipline: every fold this
  * maintainer drives carries a [[Transactions.Txn.precondition]] that
  * the index watermark still equals the value this batch derived its
  * interval from, re-checked under the coordinator's commit lock. If a
  * second maintainer is (mis)started against the same index, both fold
  * the same interval but exactly ONE commits — the loser's
  * [[Transactions.PreconditionFailed]] is caught below and the interval
  * skipped (the winner indexed it; the next batch re-derives from the
  * advanced watermark). Without the check, the duplicate fold's same-rev
  * postings would survive their own tombstones and double every score.
  */
object IndexMaintain {

  /** Append one row to a maintainer ops-census table
    * `(v_from BIGINT, v_to BIGINT, route STRING, won BOOLEAN)` — the
    * queryable record of what the maintenance loop DID, replacing
    * stderr prints and silent booleans: at 100 TB an operator asks the
    * census "which intervals were lost to a sibling? when did the debt
    * policies fire?" instead of grepping driver logs. [[start]] appends
    * interval outcomes itself when given `censusTable`; onBatch debt
    * hooks call this directly for their compaction decisions (route =
    * "compact-dict" / "compact-index", won = whether it fired).
    *
    * The census is OBSERVABILITY, deliberately outside the fold's
    * transaction: a crash between a fold's commit and its census append
    * loses that one row (at-most-once census, never an invented row) —
    * folding it into the transaction would make the ops log a
    * correctness participant and every hook a commit dependency. Cost:
    * one metadata-sized append per interval. */
  def census(spark: SparkSession, table: String, vFrom: Long, vTo: Long,
      route: String, won: Boolean): Unit = {
    import spark.implicits._
    Seq((vFrom, vTo, route, won)).toDF("v_from", "v_to", "route", "won")
      .writeTo(table).append()
  }

  /** Live watermark of an index's `(indexed_version BIGINT)` meta table
    * (0 when never advanced) — the value every fold's interval starts
    * from and the single-maintainer precondition re-checks at commit. */
  def watermark(spark: SparkSession, metaTable: String): Long =
    spark.table(metaTable).agg(max("indexed_version")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }

  /** Start the maintainer.
    *
    * @param source     catalog-qualified ingest table (row-keyed if it
    *                   is ever mutated — the change feed needs identity)
    * @param metaTable  the index's watermark log `(indexed_version
    *                   BIGINT)` — the SAME table the folds advance
    * @param coordDir   the folds' transaction coordinator directory
    *                   (recover() runs against it at start). Often
    *                   SHARED between maintainers (one warehouse = one
    *                   coordinator) — which is why `recoverAgeMillis`
    *                   defaults to [[Transactions.recover]]'s 1 h guard:
    *                   a 0 guard at start would roll back a live
    *                   sibling's between-intent-and-decide stage,
    *                   silently losing its fold. Pass 0 only when
    *                   provably no other coordinator user is alive
    *                   (tests).
    * @param foldAppend (delta pinned to `(watermark, head]`, watermark,
    *                   head) — e.g. `Engine3.fts2Fold` with
    *                   `expect = Some(watermark)`
    * @param foldFeed   (change feed for `(watermark, head]`, watermark,
    *                   head) — e.g. `Engine3.fts2FoldFeed` with
    *                   `expect = Some(watermark)`. Both fold lambdas
    *                   MUST thread the watermark into their fold's
    *                   `expect` — that precondition is what makes a
    *                   duplicate maintainer's fold abort instead of
    *                   double-indexing (see the object scaladoc)
    * @param onBatch    (watermark, head, mutated) per non-empty batch —
    *                   route census for tests/monitoring; not called
    *                   for an interval lost to a concurrent maintainer.
    *                   The place for the debt policies
    *                   (`dictCompactIfDebt` then `fts2CompactIfDebt` /
    *                   `annCompactIfDebt` — dict first, it keys on the
    *                   tombstones the index compaction clears)
    * @param preFold    (change feed, watermark, head) — runs BEFORE the
    *                   interval's fold, OUTSIDE its transaction, for
    *                   every non-empty interval (both routes). For side
    *                   state whose contract is fold-FIRST ordering: the
    *                   fuzzy dictionary (`Engine3.dictFold` over the
    *                   affected docs' head state) — a crash between
    *                   preFold and fold leaves superset side state + an
    *                   un-advanced watermark, so the interval re-runs
    *                   whole; the reverse order would advance the
    *                   watermark and lose the interval's side state
    *                   forever. A lost-race interval re-runs preFold on
    *                   the re-derived interval, so side-state folds
    *                   must be idempotent-superset (the dict's
    *                   anti-join shape)
    */
  def start(spark: SparkSession, source: String, metaTable: String,
      checkpoint: String, coordDir: String,
      foldAppend: (DataFrame, Long, Long) => Unit,
      foldFeed: (DataFrame, Long, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow(),
      recoverAgeMillis: Long = 3600L * 1000,
      onBatch: (Long, Long, Boolean) => Unit = (_, _, _) => (),
      preFold: (DataFrame, Long, Long) => Unit = (_, _, _) => (),
      censusTable: Option[String] = None): StreamingQuery = {

    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(source)
    val (cat, id) = GraftViewBridge.resolveIdent(spark, parts).getOrElse(
      throw new IllegalArgumentException(
        s"graft: $source is not in a graft catalog"))
    val tbl = cat.loadTable(id).asInstanceOf[GraftTable]
    Transactions.recover(spark, coordDir, recoverAgeMillis)

    def liveVersion(): Long = {
      val d = new Path(tbl.tableDir, "data")
      TableStats.liveVersion(d.getFileSystem(new Configuration()), d).getOrElse(0L)
    }
    spark.readStream.format("graft")
      // the change-feed source checkpoints offsets across every commit
      // kind (appends, COW, MOR); its CONTENT is ignored — the fold
      // re-reads its interval from commit metadata with both ends pinned
      .option("change-feed", "true")
      .load(tbl.tableDir)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        val recorded = watermark(spark, metaTable)
        val now = liveVersion()
        if (now > recorded) {
          val feed = Snapshots.changes(spark, tbl,
            since = recorded, end = Some(now), hydrateMor = true)
          // ONE delta-sized probe classifies the interval: row kinds
          // present decide the fold — and an EMPTY interval (zero-row
          // appends, healed aborts) advances the watermark ALONE, so the
          // index tables never accrete empty postings stages or zero
          // constants rows from noise versions, and the interval is
          // never reclassified
          val kinds = feed.groupBy(col(ChangeLog.TypeCol)).count()
            .collect().iterator.map(_.getString(0)).toSet
          val mutated = (kinds - "insert").nonEmpty
          // the catch is scoped to the preFold/fold/advance sequence
          // ONLY: a PreconditionFailed escaping onBatch below (e.g. a
          // future checked compaction hook) must not be mislogged as a
          // lost interval — by then the fold committed and the
          // watermark advanced
          val route =
            if (mutated) "feed" else if (kinds.nonEmpty) "append" else "advance"
          val won =
            try {
              if (kinds.nonEmpty) preFold(feed, recorded, now)
              if (mutated) foldFeed(feed, recorded, now)
              else if (kinds.nonEmpty)
                foldAppend(spark.read.option("since-version", recorded)
                  .option("snapshot-version", now).table(source), recorded, now)
              else {
                import spark.implicits._
                Transactions.run(spark, coordDir) { txn =>
                  // even the data-free advance is guarded, so ALL meta
                  // appends under dual maintainers serialize through the
                  // same check — one watermark row per interval, never an
                  // interleaved double-advance
                  txn.precondition(
                    s"$metaTable watermark == $recorded (single-maintainer)") {
                    watermark(spark, metaTable) == recorded
                  }
                  txn.write(metaTable, Seq(now).toDF("indexed_version"))
                }
              }
              true
            } catch {
              case e: Transactions.PreconditionFailed =>
                // a concurrent maintainer folded (recorded, x] first; OUR
                // fold rolled back whole. Skipping is safe: the interval's
                // rows are indexed (by the winner), and the next batch
                // re-derives its interval from the advanced watermark.
                // The census row below (won = false) is the record; the
                // console echo is debug-gated ([[graft.GraftLog]]).
                graft.GraftLog.debug(
                  s"graft: IndexMaintain on $metaTable lost interval " +
                    s"($recorded, $now] to a concurrent maintainer — " +
                    s"skipped (${e.getMessage})")
                false
            }
          // the queryable ops record (lost intervals INCLUDED — the
          // stderr line above is best-effort console noise, this is the
          // census an operator actually queries); see [[census]] for
          // why it sits outside the fold's transaction. The append is
          // guarded to match: observability outside the correctness
          // path must not KILL the maintainer stream when the census
          // table is missing/dropped or its write transiently fails —
          // at-most-once means a lost row, never a lost maintainer
          censusTable.foreach { t =>
            try census(spark, t, recorded, now, route, won)
            catch { case scala.util.control.NonFatal(e) =>
              System.err.println(s"graft: IndexMaintain census append to " +
                s"$t failed (row dropped): ${e.getMessage}")
            }
          }
          if (won) onBatch(recorded, now, mutated)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
