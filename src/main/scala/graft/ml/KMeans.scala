package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic Lloyd's k-means over an embedding column — the training
  * loop for the IVF coarse quantizer (q40 uses fixed seed centroids; this
  * produces trained ones with the same dataflow):
  *
  *  - init: the first k vectors by id (deterministic, no RNG — scripts
  *    and retries converge identically);
  *  - assign: the k×d model rides into the plan as a LITERAL array of
  *    (cluster, centroid, ‖centroid‖²) structs and each row picks its
  *    argmax-sim cluster with nested higher-order functions — a purely
  *    NARROW map over the corpus, zero shuffle, zero per-row join;
  *  - update: per-cluster quantized means via [[graft.functions.CentroidAggD]]
  *    — ONE hash aggregate with map-side partial merge, so the only
  *    shuffle per iteration moves O(partitions × k × d) buffer bytes,
  *    independent of corpus size.
  *
  * The corpus is cached across iterations (the standard iterative-ML
  * shape: scan the source once, not once per step); the k×d model is the
  * only thing ever collected.
  */
object KMeans {

  private val centroidD =
    udaf(graft.functions.CentroidAggD, ExpressionEncoder[Seq[Double]]())

  /** Driver-side model: (cluster, centroid, Σ round(cᵢ²·1e9)). */
  private type Model = IndexedSeq[(Int, IndexedSeq[Double], Double)]

  /** Matches SQL `quant_dot(c, c, 1e9)`:
    * x² ≥ 0 so HALF_UP coincides with math.round's toward-+∞ tie rule. */
  private def norm2Q(c: IndexedSeq[Double]): Double =
    c.foldLeft(0d)((a, x) => a + math.round(x * x * 1e9).toDouble)

  private def toModel(rows: Seq[Row]): Model =
    rows.map { r =>
      val c = r.getSeq[Double](1).toIndexedSeq
      (r.getInt(0), c, norm2Q(c))
    }.toIndexedSeq.sortBy(_._1)

  /** The model as a literal column: array<struct<cluster, c, cn2>>,
    * ascending cluster so the fold's strict `>` keeps the lower cluster
    * on sim ties (same rule as max_by(cluster, struct(sim, -cluster))). */
  private def modelLit(m: Model): Column =
    array(m.map { case (cl, c, cn2) =>
      struct(lit(cl).as("cluster"), typedLit(c.toSeq).as("c"), lit(cn2).as("cn2"))
    }: _*)

  /** Adds `cluster` to each row by argmax quantized cosine against the
    * literal model — narrow, no shuffle. Same arithmetic as the oracle:
    * sim = Σ round(eᵢ·cᵢ·1e9) / sqrt(Σ round(cᵢ²·1e9)). The inner
    * product is the native `quant_dot` (bit-identical to the spelled-out
    * aggregate/zip_with — QuantProdSumSpec): the per-CENTROID fold stays
    * a higher-order lambda (k steps/row, model-sized), but the per-
    * ELEMENT work — k×d/row, the entire cost of Lloyd's at corpus
    * scale — runs as one compiled loop instead of an interpreted
    * closure + BigDecimal round per element. */
  private def withCluster(emb: DataFrame, m: Model): DataFrame = {
    graft.functions.QuantProdSum.register(emb.sparkSession)
    emb.withColumn("cents", modelLit(m))
      .withColumn("cluster", expr(
        """aggregate(
          |  transform(cents, cc -> struct(
          |    cc.cluster AS cluster,
          |    quant_dot(e, cc.c, 1e9) / sqrt(cc.cn2) AS sim)),
          |  struct(CAST(-1 AS INT) AS cluster, CAST('-Infinity' AS DOUBLE) AS sim),
          |  (best, s) -> CASE WHEN s.sim > best.sim THEN s ELSE best END
          |).cluster""".stripMargin))
      .drop("cents")
  }

  /** One Lloyd step: model in, model out (rows sorted by cluster). */
  private def step(emb: DataFrame, m: Model): Model =
    toModel(
      withCluster(emb, m)
        .groupBy(col("cluster"))
        .agg(centroidD(col("e")).as("c"))
        .collect().toIndexedSeq)

  private def initModel(emb: DataFrame, k: Int): Model =
    toModel(
      emb.orderBy(col("id")).limit(k)
        .select(col("id").cast("int").as("cluster"), col("e").as("c"))
        .collect().toIndexedSeq)

  private def modelFrame(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.map { case (cl, c, _) => (cl, c.toSeq) }.toDF("cluster", "c")
  }

  /** Caches `emb` for the iteration loop unless the caller already did;
    * returns the unpersist handle (no-op when we didn't persist). */
  private def ensureCached(emb: DataFrame): () => Unit =
    if (emb.storageLevel == StorageLevel.NONE) {
      emb.persist(StorageLevel.MEMORY_AND_DISK)
      () => { emb.unpersist(); () }
    } else () => ()

  /** SemDeDup-style cluster count: k grows WITH the corpus so the
    * expected cluster stays near `targetClusterSize` and the
    * within-cluster pair space (Σ cᵢ² ≈ n · target) stays LINEAR in the
    * corpus — a fixed k makes clusters grow with n and the pair space
    * quadratic again. Clamped to [2, maxK]; beyond maxK · target rows,
    * raise maxK (the model is k×d driver bytes) or pre-shard the corpus. */
  def sizeK(n: Long, targetClusterSize: Int = 64, maxK: Int = 4096): Int =
    math.min(maxK.toLong,
      math.max(2L, (n + targetClusterSize - 1) / targetClusterSize)).toInt

  /** SEVERAL independent k-means fits in ONE dataflow, keyed by `g` —
    * for the PQ-codebook shape (8 subspace fits) and the whole
    * requantize retrain (8 subspaces + the coarse fit as a 9th group,
    * different dimensionality per group is fine: every step is
    * array-length-agnostic). Per iteration the grouped fit runs ONE
    * narrow assignment map + ONE (g, cluster) hash aggregate for ALL
    * groups, where g separate [[fit]] calls pay g × iters stage
    * barriers — at small data that's the whole cost (job overhead), at
    * 100 TB it's g× fewer full-corpus scans if the caller's input
    * couldn't be cached.
    *
    * Bit-identical to running [[fit]] per group: init is the first k
    * ids WITHIN each group (same rows), the assignment fold and the
    * quantized means are per-group arithmetic with no cross-group
    * interaction, and ties break identically (the model rides in
    * cluster-ascending per group).
    *
    * @param emb (g: Int, id: Long, e: array<double>)
    * @return (g: Int, cluster: Int, c: array<double>) */
  def fitGrouped(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    graft.functions.QuantProdSum.register(emb.sparkSession)
    val release = ensureCached(emb)
    try {
      // grouped model: g -> Model, g contiguous from 0 (validated below)
      def toGrouped(rows: Seq[Row]): Map[Int, Model] =
        rows.groupBy(_.getInt(0)).view.mapValues { rs =>
          rs.map { r =>
            val c = r.getSeq[Double](2).toIndexedSeq
            (r.getInt(1), c, norm2Q(c))
          }.toIndexedSeq.sortBy(_._1)
        }.toMap
      val wInit = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("id"))
      var m: Map[Int, Model] = toGrouped(
        emb.withColumn("rn", row_number().over(wInit))
          .filter(col("rn") <= k)
          .select(col("g"), col("id").cast("int").as("cluster"), col("e").as("c"))
          .collect().toIndexedSeq)
      val groups = m.keys.toSeq.sorted
      require(groups == (0 until groups.size),
        s"graft: fitGrouped needs contiguous groups from 0, got $groups")
      def groupedLit(mm: Map[Int, Model]): Column =
        array(groups.map(g => modelLit(mm(g))): _*)
      for (_ <- 1 to iters)
        m = toGrouped(
          emb.withColumn("cents", element_at(groupedLit(m), col("g") + 1))
            .withColumn("cluster", expr(
              """aggregate(
                |  transform(cents, cc -> struct(
                |    cc.cluster AS cluster,
                |    quant_dot(e, cc.c, 1e9) / sqrt(cc.cn2) AS sim)),
                |  struct(CAST(-1 AS INT) AS cluster, CAST('-Infinity' AS DOUBLE) AS sim),
                |  (best, s) -> CASE WHEN s.sim > best.sim THEN s ELSE best END
                |).cluster""".stripMargin))
            .groupBy(col("g"), col("cluster"))
            .agg(centroidD(col("e")).as("c"))
            .collect().toIndexedSeq)
      import emb.sparkSession.implicits._
      m.toSeq.sortBy(_._1).flatMap { case (g, model) =>
        model.map { case (cl, c, _) => (g, cl, c.toSeq) }
      }.toDF("g", "cluster", "c")
    } finally release()
  }

  /** @param emb (id: Long, e: array<double>) input
    * @return (cluster: Int, centroid: array<double>) after `iters` steps */
  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val release = ensureCached(emb)
    try {
      var m = initModel(emb, k)
      for (_ <- 1 to iters) m = step(emb, m)
      modelFrame(emb.sparkSession, m)
    } finally release()
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
    val release = ensureCached(emb)
    try {
      var m = initModel(emb, k)
      var used = 0
      var converged = false
      while (used < maxIters && !converged) {
        val next = step(emb, m)
        used += 1
        if (next.map(c => (c._1, c._2)) == m.map(c => (c._1, c._2)))
          converged = true // fixed point: model is final
        else m = next
      }
      (modelFrame(emb.sparkSession, m), used)
    } finally release()
  }

  /** Nearest-centroid assignment: (id, e, cluster). Narrow — the model is
    * collected (k×d, a few KB) and folded into a literal; ties break to
    * the lower cluster id exactly like max_by(cluster, struct(sim, -cluster)). */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    withCluster(emb, toModel(centroids.collect().toIndexedSeq))
      .select(col("id"), col("e"), col("cluster"))

  /** Quantized-exact per-cluster means: (cluster, c) — one map-side-
    * combining hash aggregate ([[graft.functions.CentroidAggD]]). */
  def update(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cluster")).agg(centroidD(col("e")).as("c"))

  /** Mean cosine of each vector to its assigned centroid — the objective
    * (higher is better); used to check convergence. */
  def objective(emb: DataFrame, centroids: DataFrame): Double = {
    graft.functions.QuantProdSum.register(emb.sparkSession)
    assign(emb, centroids)
      .join(centroids.select(col("cluster"), col("c")), "cluster")
      .withColumn("dot",
        expr("quant_dot(e, c, 1e9)"))
      .withColumn("en2", expr("quant_dot(e, e, 1e9)"))
      .withColumn("cn2", expr("quant_dot(c, c, 1e9)"))
      .withColumn("cos", expr("dot / sqrt(en2 * cn2)"))
      .agg(avg(col("cos"))).head().getDouble(0)
  }

  /** Convenience: embeddings table → (id, e) frame. */
  def embFrame(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("e"))
}
