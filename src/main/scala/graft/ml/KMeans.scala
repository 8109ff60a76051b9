package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the training
  * loop for the IVF coarse quantizer (q40 uses fixed seed centroids; this
  * produces trained ones with the same dataflow):
  *
  *  - init: the first k vectors by id (deterministic, no RNG — scripts
  *    and retries converge identically);
  *  - assign: broadcast the k centroids, one narrow pass computes each
  *    vector's nearest centroid by quantized cosine (ties → lower id);
  *  - update: per-cluster mean via the order-independent quantized sums
  *    (same scheme as [[graft.functions.CentroidAgg]]).
  *
  * Each iteration is one broadcast join + one shuffle by cluster id —
  * the standard scalable shape (centroids small, corpus never collected).
  */
object KMeans {

  /** @param emb (id: Long, e: array<double>) input
    * @return (cluster: Int, centroid: array<double>) after `iters` steps */
  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    var centroids = emb.orderBy(col("id")).limit(k)
      .select(col("id").cast("int").as("cluster"), col("e").as("c"))
    for (_ <- 1 to iters) {
      val next = update(assign(emb, centroids))
      // materialize the k x d model state (a few KB) after each step:
      // without this, lazy lineage re-executes iteration N's whole
      // dataflow inside iteration N+1 — quadratic work in `iters`. The
      // collect is of the MODEL, never the corpus, and the values are
      // exact (quantized means), so the round-trip changes nothing.
      val schema = next.schema
      val rows = next.orderBy(col("cluster")).collect().toIndexedSeq
      centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    }
    centroids
  }

  /** Lloyd's to convergence with a hard iteration cap: stops as soon as an
    * update reproduces the previous model EXACTLY (quantized means are
    * deterministic, so the fixed point is decidable by value equality — no
    * epsilon). Because Lloyd's update is idempotent at a fixed point,
    * `fitConverged(e, k, maxIters)` equals `fit(e, k, maxIters)` whenever
    * convergence happens within the cap — which is what lets a SQL oracle
    * replay it by unconditionally unrolling `maxIters` iterations.
    *
    * @return (centroids, iterations actually computed) */
  def fitConverged(emb: DataFrame, k: Int, maxIters: Int): (DataFrame, Int) = {
    val spark = emb.sparkSession
    var centroids = emb.orderBy(col("id")).limit(k)
      .select(col("id").cast("int").as("cluster"), col("e").as("c"))
    var prev: Option[IndexedSeq[(Int, Seq[Double])]] = None
    var used = 0
    var converged = false
    while (used < maxIters && !converged) {
      val next = update(assign(emb, centroids))
      val schema = next.schema
      val rows = next.orderBy(col("cluster")).collect().toIndexedSeq
      used += 1
      val key = rows.map(r => (r.getInt(0), r.getSeq[Double](1)))
      if (prev.contains(key)) converged = true // fixed point: model is final
      else {
        prev = Some(key)
        centroids = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
      }
    }
    (centroids, used)
  }

  /** Nearest-centroid assignment: (id, e, cluster). Argmax by
    * (sim DESC, cluster ASC) via max_by over struct(sim, -cluster) — a
    * hash aggregate with map-side partial merge, no sort shuffle (ties
    * are impossible: cluster ids are unique per row). */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("dot",
        expr("aggregate(zip_with(e, c, (x, y) -> round(x * y * 1e9)), 0D, (a, p) -> a + p)"))
      .withColumn("cn2",
        expr("aggregate(c, 0D, (a, x) -> a + round(x * x * 1e9))"))
      .withColumn("sim", expr("dot / sqrt(cn2)")) // ∝ cosine for fixed e
      .groupBy(col("id"))
      .agg(
        first(col("e")).as("e"),
        expr("max_by(cluster, struct(sim, -cluster))").as("cluster"))

  /** Quantized-exact per-cluster means: (cluster, c). */
  def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(expr("round(x * 1e9)")).as("s"), count(lit(1)).as("n"))
      .withColumn("m", expr("(s / n) / 1e9"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), p -> p.m)").as("c"))

  /** Mean cosine of each vector to its assigned centroid — the objective
    * (higher is better); used to check convergence. */
  def objective(emb: DataFrame, centroids: DataFrame): Double =
    assign(emb, centroids)
      .join(centroids, "cluster")
      .withColumn("dot",
        expr("aggregate(zip_with(e, c, (x, y) -> round(x * y * 1e9)), 0D, (a, p) -> a + p)"))
      .withColumn("en2", expr("aggregate(e, 0D, (a, x) -> a + round(x * x * 1e9))"))
      .withColumn("cn2", expr("aggregate(c, 0D, (a, x) -> a + round(x * x * 1e9))"))
      .withColumn("cos", expr("dot / sqrt(en2 * cn2)"))
      .agg(avg(col("cos"))).head().getDouble(0)

  /** Convenience: embeddings table → (id, e) frame. */
  def embFrame(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("e"))
}
