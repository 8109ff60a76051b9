package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed iteration checkpoints for driver-driven fixpoint loops
  * (connected components, label propagation, Lloyd variants whose state is
  * a DataFrame rather than a k×d model).
  *
  * Each round's state is written to
  * `<spark.graft.checkpoint.dir>/<run>/<name>` and read back, which CUTS
  * the lineage: the next round plans from a file scan, not from the whole
  * chain of previous rounds. Unlike `localCheckpoint` (executor-local
  * block storage — lost with the executor, fatal under dynamic
  * allocation), parquet rounds live on the shared filesystem and survive
  * executor loss at any cluster size; unlike `persist`, a task retry
  * recomputes from the round file, never from round zero.
  *
  * Rounds accumulate one directory each; [[reclaim]] drops every round
  * except the one backing the frame still in use.
  */
object IterCheckpoint {

  /** Session conf key for the checkpoint root. Defaults to the local tmp
    * dir — fine for local mode; on a cluster point it at shared storage. */
  val DirProp = "spark.graft.checkpoint.dir"

  def root(spark: SparkSession): String =
    spark.conf.getOption(DirProp).getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints")

  /** A fresh directory for one iterative run. */
  def newRun(spark: SparkSession): String =
    s"${root(spark)}/${java.util.UUID.randomUUID()}"

  /** Materialize `df` as round `name` of `runDir` and return the frame
    * re-read from storage (constant-depth lineage). */
  def round(df: DataFrame, runDir: String, name: String): DataFrame = {
    val path = s"$runDir/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Delete every round of `runDir` except `keep` (the one backing a
    * frame still in use; pass None to drop the whole run). */
  def reclaim(spark: SparkSession, runDir: String, keep: Option[String]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(runDir)
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (fs.exists(dir)) keep match {
      case None => fs.delete(dir, true)
      case Some(k) => fs.listStatus(dir).foreach { st =>
        if (st.getPath.getName != k) fs.delete(st.getPath, true)
      }
    }
  }
}
