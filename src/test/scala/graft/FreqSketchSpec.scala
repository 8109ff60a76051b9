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
