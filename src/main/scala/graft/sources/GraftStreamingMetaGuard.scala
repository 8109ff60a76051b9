package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2

/** Refuse `_file`/`_version` on STREAMING graft reads at analysis time.
  *
  * Spark 4.1 wires DSv2 `SupportsMetadataColumns` only for batch scans:
  * the analyzer happily resolves a metadata column against a streaming
  * relation's `metadataOutput`, but `V2ScanRelationPushDown` (which tells
  * the scan to produce it) never runs for streams — the executed plan
  * then expects a column the readers cannot emit and dies mid-batch with
  * an opaque row-arity error. Failing fast with a named error beats that;
  * batch reads of the same columns are unaffected.
  */
final case class GraftStreamingMetaGuard(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val meta = Set(GraftTable.FileColumnName, GraftTable.VersionColumnName)
    plan.foreach {
      case r: StreamingRelationV2 if r.table.isInstanceOf[GraftTable] =>
        val bad = r.output.map(_.name).filter(meta)
        if (bad.nonEmpty)
          throw new UnsupportedOperationException(
            s"graft: metadata column(s) ${bad.mkString(", ")} are not " +
              "available on streaming reads (Spark's DSv2 metadata-column " +
              "wiring is batch-only); drop them from the streaming " +
              "projection or read the table in batch")
      case _ => ()
    }
    plan
  }
}
