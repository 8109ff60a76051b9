package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Apply a graft change-feed micro-batch to a downstream table — the
  * canonical CDC consumer (`readStream.option("change-feed", "true")` →
  * `foreachBatch(CdcApply.applyBatch(_, "cat.ns.replica"))`), keeping a
  * replica, a materialized projection, or a served copy converged to the
  * source table without ever re-reading it.
  *
  * A micro-batch may span SEVERAL source commits (AvailableNow drains the
  * whole backlog as one batch; a busy source lands multiple versions per
  * trigger), so rows are first reduced to each key's LAST effective change
  * by `_commit_version` — an insert at v5 followed by a delete at v7 must
  * apply as only the delete. `update_preimage` rows are dropped (the
  * postimage carries the row), then ONE keyed MERGE applies the survivors:
  * delete → DELETE, anything else → upsert.
  *
  * Exactly-once table state from an at-least-once contract: foreachBatch
  * may re-run a batch after failure, but the reduced MERGE is idempotent —
  * re-upserting a row or re-deleting an absent key leaves the target
  * unchanged — so replay converges to the same state.
  *
  * Scale shape: one window over the batch keyed by `keyCol` (batch-sized,
  * not table-sized) + one MERGE, which on a graft target is itself a keyed
  * row-level operation (merge-on-read writes only delta files). Nothing is
  * collected; the replica table is never scanned outside the MERGE's own
  * matching read.
  */
object CdcApply {

  /** Reduce `batch` (a change-feed frame: data columns + `_change_type`,
    * `_commit_version`) to last-change-per-key and MERGE it into `target`.
    * `keyCol` must be the source table's row-identity column. */
  def applyBatch(batch: DataFrame, target: String,
      keyCol: String = "row_key"): Unit = {
    val spark = batch.sparkSession
    val meta = Set("_change_type", "_commit_version")
    val valueCols = batch.columns.filterNot(c => meta(c) || c == keyCol)
    // same-version tie-break is an EXPLICIT priority (delete wins, then the
    // update postimage, then insert): a graft feed pre-pairs updates so one
    // effective change exists per key+version, but a malformed or foreign
    // feed carrying an unpaired insert+delete at one version must resolve
    // to the delete — the lexicographic accident ("insert" > "delete")
    // would resurrect the row
    val changePriority = when(col("_change_type") === "delete", 3)
      .when(col("_change_type") === "update_postimage", 2)
      .when(col("_change_type") === "insert", 1)
      .otherwise(0)
    val latest = batch
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("_commit_version").desc, changePriority.desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val view = "graft_cdc_batch_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    latest.createOrReplaceTempView(view)
    try {
      val insCols = (keyCol +: valueCols).map(c => s"`$c`").mkString(", ")
      val insVals = (keyCol +: valueCols).map(c => s"s.`$c`").mkString(", ")
      // a key-only target has nothing to update — `UPDATE SET` with zero
      // assignments is a parse error, so the clause is dropped (matched
      // non-delete rows are correctly a no-op there)
      val updateClause =
        if (valueCols.isEmpty) Nil
        else Seq("WHEN MATCHED THEN UPDATE SET " +
          valueCols.map(c => s"t.`$c` = s.`$c`").mkString(", "))
      spark.sql((Seq(
        s"MERGE INTO $target t USING $view s ON t.`$keyCol` = s.`$keyCol`",
        "WHEN MATCHED AND s._change_type = 'delete' THEN DELETE") ++
        updateClause ++ Seq(
        "WHEN NOT MATCHED AND s._change_type != 'delete'",
        s"  THEN INSERT ($insCols) VALUES ($insVals)")).mkString("\n"))
    } finally spark.catalog.dropTempView(view)
  }
}
