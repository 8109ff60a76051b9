package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming incremental dedup — the continuous twin of the q143 batch
  * gate (`queries/Engine2.scala`): tail an ingest table's change feed
  * (`readStream.option("change-feed", "true")` →
  * `foreachBatch(DedupIngest.applyBatch(_, state, accept))`) and keep
  *
  *  - `stateTable`  (fp STRING, keeper BIGINT) — every fingerprint ever
  *    seen, with the doc that owns it;
  *  - `acceptTable` (the ingest table's data columns) — the deduplicated
  *    corpus: exactly the first-seen doc per fingerprint.
  *
  * Per batch: fingerprint the new docs, keep each fingerprint's first
  * occurrence WITHIN the batch (one batch-sized window), then two keyed
  * MERGEs — accepted docs by id, novel fingerprints by fp. Ordering
  * matters: both MERGEs' sources classify lazily against the state table,
  * so the accept-side MERGE runs FIRST (before the state MERGE makes
  * every batch fingerprint "seen"); the state MERGE itself is one
  * statement and reads the pre-merge state by definition.
  *
  * Exactly-once corpus from an at-least-once contract: on replay every
  * fingerprint is already in the state, so classification accepts
  * nothing new, and both MERGEs (insert-if-absent) are no-ops — the
  * fixed point is the deduplicated corpus.
  *
  * Scale shape: work per batch is O(batch + state join) — the corpus is
  * never re-read, nothing is collected, and the state join is a keyed
  * equi-join a 1000-executor cluster shuffles by fingerprint.
  */
object DedupIngest {

  /** Sentinel fingerprint for NULL text — never a hex md5, so it cannot
    * collide with a real fingerprint. Shared by the streaming consumer,
    * the q143 batch gate, and its oracle, so the two paths can never
    * disagree on what counts as a duplicate. */
  val NullTextFp = "null-text"

  /** The canonical content fingerprint: md5 of the raw text, with NULL
    * text mapped to [[NullTextFp]] (a NULL fp would equal nothing in
    * joins/MERGEs, so null-text docs would never dedup). */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(md5(text.cast("binary")), lit(NullTextFp))

  /** Classify one change-feed micro-batch and fold it into
    * `stateTable`/`acceptTable`. Only `insert` rows are consumed (an
    * ingest feed is append-only; deletes/updates upstream do not
    * invalidate fingerprints already seen). */
  def applyBatch(batch: DataFrame, stateTable: String, acceptTable: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val meta = Set("_change_type", "_commit_version")
    val dataCols = batch.columns.filterNot(meta).toSeq
    val inserts = batch.filter(col("_change_type") === "insert")
      .select((dataCols.map(col) :+ col("_commit_version")): _*)
      .withColumn("_fp", fingerprint(col(textCol)))
    // first occurrence per fingerprint within the batch, ordered by
    // (_commit_version, id): when the trigger drains several commits as
    // one batch the keeper is the same doc sequential per-commit
    // processing would keep — batching-invariant. Batch-sized window,
    // never corpus-sized.
    val firsts = inserts
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_fp"))
          .orderBy(col("_commit_version"), col(idCol))))
      .filter(col("_rn") === 1).drop("_rn", "_commit_version")
    // fresh = first-in-batch AND absent from the (pre-merge) state;
    // persisted so the classification (md5 + window + state join) runs
    // ONCE, not once per MERGE — and so the second MERGE cannot lazily
    // re-classify against a state its predecessor already advanced
    val fresh = firsts.join(
      spark.table(stateTable).select(col("fp").as("_fp")), Seq("_fp"), "left_anti")
      .persist()
    val view = "graft_dedup_batch_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    fresh.createOrReplaceTempView(view)
    try {
      val insCols = dataCols.map(c => s"`$c`").mkString(", ")
      val insVals = dataCols.map(c => s"s.`$c`").mkString(", ")
      // accepted docs first (classified against the pre-batch state)
      spark.sql(
        s"""MERGE INTO $acceptTable t USING $view s
           |ON t.`$idCol` = s.`$idCol`
           |WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin)
      // then the novel fingerprints advance the state
      spark.sql(
        s"""MERGE INTO $stateTable t USING $view s
           |ON t.fp = s.`_fp`
           |WHEN NOT MATCHED THEN INSERT (fp, keeper) VALUES (s.`_fp`, s.`$idCol`)""".stripMargin)
    } finally {
      // a continuous stream runs this per micro-batch: leaked temp views /
      // cached plans would grow without bound over the job's lifetime
      spark.catalog.dropTempView(view)
      fresh.unpersist()
    }
  }
}
