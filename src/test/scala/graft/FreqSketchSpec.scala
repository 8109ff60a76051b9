package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.FreqSketchAgg

/** The Misra–Gries frequent-items aggregator, in both regimes:
  *
  *  - EXACTNESS: while distinct keys ≤ capacity, the summary is the
  *    exact count map (q149's oracle-checked configuration);
  *  - APPROXIMATION: with capacity < distinct keys, the mergeable-
  *    summaries guarantees hold under Spark's arbitrary partial-merge
  *    order — never overcounts, undercount ≤ N/(capacity+1), and every
  *    key above that threshold survives trimming.
  */
class FreqSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Zipf-ish multiset: key k appears 2^(12-k) times for k in 1..12,
    * plus 400 singleton keys of count 1 (the long tail). */
  private def corpus: Seq[String] =
    (1 to 12).flatMap(k => Seq.fill(1 << (12 - k))(s"k$k")) ++
      (1 to 400).map(i => s"tail$i")

  private def runSketch(capacity: Int, partitions: Int): Map[String, Long] = {
    import spark.implicits._
    // deterministic spread across partitions, shuffled order
    val shuffled = new scala.util.Random(7).shuffle(corpus)
    spark.createDataset(shuffled).repartition(partitions)
      .select(FreqSketchAgg(capacity).toColumn.name("m"))
      .head()
  }

  private lazy val trueCounts: Map[String, Long] =
    corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
  private lazy val n: Long = corpus.size.toLong

  test("exactness regime: capacity >= distinct keys reproduces exact counts") {
    val est = runSketch(capacity = trueCounts.size + 8, partitions = 7)
    assert(est == trueCounts)
  }

  test("approximation regime: MG guarantees hold under distributed merges") {
    for (capacity <- Seq(8, 32); partitions <- Seq(3, 11)) {
      val est = runSketch(capacity, partitions)
      val bound = n / (capacity + 1)
      assert(est.size <= capacity, s"cap=$capacity: ${est.size} entries")
      est.foreach { case (k, v) =>
        val t = trueCounts(k)
        assert(v <= t, s"cap=$capacity p=$partitions: overcounted $k: $v > $t")
        assert(t - v <= bound,
          s"cap=$capacity p=$partitions: undercount of $k exceeds N/(cap+1): " +
            s"true=$t est=$v bound=$bound")
      }
      // every true heavy hitter (count > N/(cap+1)) must be present
      trueCounts.foreach { case (k, t) =>
        if (t > bound)
          assert(est.contains(k),
            s"cap=$capacity p=$partitions: heavy hitter $k (count $t > $bound) missing")
      }
    }
  }

  test("capacity 1e4 is practical: deferred trims keep per-token cost amortized") {
    // the 100 TB configuration: capacity ~1e4 with a vocabulary far past
    // it. A per-insert trim at capacity would sort 1e4 counts for EVERY
    // token once the buffer fills (~250k sorts here — minutes); deferred
    // trimming runs one O(cap log cap) pass per ~capacity NEW keys, so
    // the whole fold stays well under the wall bound.
    val capacity = 10000
    val agg = FreqSketchAgg(capacity)
    val rnd = new scala.util.Random(11)
    val total = 300000
    val t0 = System.nanoTime()
    var b = agg.zero
    var i = 0
    while (i < total) {
      // heavy head (200 hot keys) + unbounded tail → constant trim pressure
      val tok = if (rnd.nextInt(4) == 0) s"hot${rnd.nextInt(200)}"
                else s"tail${rnd.nextInt(1000000)}"
      b = agg.reduce(b, tok)
      i += 1
    }
    // a distributed fold also merges partials: exercise the merge path
    // at the same capacity
    val merged = agg.finish(agg.merge(b, b))
    val wallMs = (System.nanoTime() - t0) / 1000000L
    assert(wallMs < 30000L, s"300k tokens at capacity 1e4 took ${wallMs}ms — " +
      "trimming is not amortized")
    assert(merged.size <= capacity)
    // MG bounds at this scale: hot keys (true count ~375 each in b, doubled
    // by the self-merge) all survive; estimates never exceed truth
    // recompute true counts with the same seed/sequence
    val rnd2 = new scala.util.Random(11)
    val truth = scala.collection.mutable.Map[String, Long]()
    (0 until total).foreach { _ =>
      val tok = if (rnd2.nextInt(4) == 0) s"hot${rnd2.nextInt(200)}"
                else s"tail${rnd2.nextInt(1000000)}"
      truth(tok) = truth.getOrElse(tok, 0L) + 1L
    }
    val bound = 2L * total / (capacity + 1)
    merged.foreach { case (k, v) =>
      assert(v <= 2L * truth(k), s"$k overcounted: $v > ${2L * truth(k)}")
    }
    (0 until 200).map(i => s"hot$i").foreach { k =>
      val t = 2L * truth.getOrElse(k, 0L)
      if (t > bound) {
        assert(merged.contains(k), s"heavy hitter $k (count $t > $bound) missing")
        assert(t - merged(k) <= bound,
          s"undercount of $k exceeds bound: $t - ${merged(k)} > $bound")
      }
    }
  }

  test("capacity 1e5 (the advertised 100 TB configuration) holds its wall and " +
      "MG bounds") {
    // the scaladoc advertises ~1e5 capacities for 100 TB corpora
    // (FreqSketchAgg.scala): exercise exactly that configuration — heavy
    // head + unbounded tail far past capacity, reduce AND merge paths —
    // under a wall bound that fails if trim amortization ever regresses
    // to per-insert sorting (which at 1e5 would be ~minutes).
    val capacity = 100000
    val agg = FreqSketchAgg(capacity)
    val rnd = new scala.util.Random(13)
    val total = 600000
    def tok(r: scala.util.Random): String =
      if (r.nextInt(4) == 0) s"hot${r.nextInt(300)}" else s"tail${r.nextInt(5000000)}"
    val t0 = System.nanoTime()
    var b = agg.zero
    var i = 0
    while (i < total) { b = agg.reduce(b, tok(rnd)); i += 1 }
    val merged = agg.finish(agg.merge(b, b))
    val wallMs = (System.nanoTime() - t0) / 1000000L
    assert(wallMs < 30000L,
      s"600k tokens at capacity 1e5 took ${wallMs}ms — not amortized")
    assert(merged.size <= capacity)
    val rnd2 = new scala.util.Random(13)
    val truth = scala.collection.mutable.Map[String, Long]()
    (0 until total).foreach { _ =>
      val k = tok(rnd2); truth(k) = truth.getOrElse(k, 0L) + 1L
    }
    val bound = 2L * total / (capacity + 1)
    merged.foreach { case (k, v) =>
      assert(v <= 2L * truth(k), s"$k overcounted: $v > ${2L * truth(k)}")
    }
    (0 until 300).map(i => s"hot$i").foreach { k =>
      val t = 2L * truth.getOrElse(k, 0L)
      if (t > bound) {
        assert(merged.contains(k), s"heavy hitter $k (count $t > $bound) missing")
        assert(t - merged(k) <= bound,
          s"undercount of $k exceeds bound: $t - ${merged(k)} > $bound")
      }
    }
  }

  test("plan: the sketch aggregates map-side (partial before the exchange)") {
    import spark.implicits._
    val ds = spark.createDataset(corpus).repartition(5)
      .select(FreqSketchAgg(16).toColumn.name("m"))
    val plan = ds.queryExecution.executedPlan.toString
    // ObjectHashAggregate runs twice: partial (pre-shuffle) + final
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregate pair:\n${plan.take(2000)}")
  }
}
