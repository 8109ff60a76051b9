package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IterCheckpoint

/** Alternating large-star / small-star connected components (the
  * "Connected Components in MapReduce and Beyond" two-operation scheme,
  * Kiveris et al., SoCC 2014).
  *
  * Plain min-label propagation (the shape of q92) needs O(diameter)
  * rounds — a 100-hop duplicate chain costs 100 shuffles. Large-star /
  * small-star contracts the graph toward component stars in
  * O(log² n) rounds regardless of diameter, each round two shuffles over
  * the CURRENT edge set (which shrinks as stars form):
  *
  *  - large-star: for each node u with symmetric neighborhood N(u),
  *    m = min(N(u) ∪ {u}); every STRICTLY LARGER neighbor re-points to m —
  *    emit (v, m) for v ∈ N(u), v > u.
  *  - small-star: orient every edge to (larger, smaller); for each node u
  *    with (now all-smaller) neighborhood N(u), m = min(N(u) ∪ {u});
  *    emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m.
  *
  * Both keep every node attached to its component's minimum candidate, so
  * the fixpoint is exactly the star graph (node → component min). Rounds
  * checkpoint through [[IterCheckpoint]] (constant lineage depth,
  * executor-loss-safe); convergence is detected by an order-independent
  * edge-set digest (count + sum of per-edge hashes), one cheap aggregate
  * instead of a set-difference shuffle.
  */
object ConnectedComponents {

  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("m"))
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val m = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
    val nbr = oriented.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.filter(col("u") =!= col("m"))
      .select(col("u"), col("m").as("v"))
    nbr.union(self).distinct()
  }

  private def digest(e: DataFrame): (Long, String) = {
    // decimal(38,0) sum: order-independent and overflow-free under ANSI
    // (a raw long sum of hashes throws ARITHMETIC_OVERFLOW)
    val r = e.agg(
      count(lit(1)).cast("long"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head()
    (r.getLong(0), String.valueOf(r.get(1)))
  }

  /** Component labels for every node incident to an edge:
    * `(id, label)` where `label` is the component's minimum node id.
    * Self-loops and duplicate edges are tolerated. */
  def labels(
      spark: SparkSession,
      edges: DataFrame,
      src: String,
      dst: String,
      maxRounds: Int = 20): DataFrame =
    labelsWithRounds(spark, edges, src, dst, maxRounds)._1

  /** [[labels]] plus the number of large+small-star rounds it took to
    * converge (maxRounds when the cap hit first). */
  def labelsWithRounds(
      spark: SparkSession,
      edges: DataFrame,
      src: String,
      dst: String,
      maxRounds: Int = 20): (DataFrame, Int) = {
    val run = IterCheckpoint.newRun(spark)
    var e = IterCheckpoint.round(
      edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct(),
      run, "r0")
    var last = digest(e)
    var round = 0
    var converged = false
    var finalRound = "r0"
    while (round < maxRounds && !converged) {
      val name = s"r${round + 1}"
      val next = IterCheckpoint.round(smallStar(largeStar(e)), run, name)
      val d = digest(next)
      e = next
      finalRound = name
      round += 1
      if (d == last) converged = true else last = d
    }
    IterCheckpoint.reclaim(spark, run, Some(finalRound))
    // Star graph: every edge is (node, componentMin); roots appear only on
    // the right. The min-agg guards the (unconverged-cap) general case
    // where a node still carries several candidate parents.
    val members = e.groupBy(col("u").as("id")).agg(min(col("v")).as("label"))
    val roots = e.select(col("v")).distinct()
      .join(e.select(col("u").as("v")).distinct(), Seq("v"), "left_anti")
      .select(col("v").as("id"), col("v").as("label"))
    (members.unionByName(roots), round)
  }
}
