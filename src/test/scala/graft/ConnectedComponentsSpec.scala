package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.ConnectedComponents

/** Large-star/small-star must produce exact component-min labels, converge
  * in far fewer rounds than the component diameter, and tolerate
  * self-loops/duplicate/reversed edges. */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Reference labels by driver-side union-find over collected edges. */
  private def bruteLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)], maxRounds: Int = 20) = {
    import spark.implicits._
    val (df, rounds) = ConnectedComponents.labelsWithRounds(
      spark, edges.toDF("s", "d"), "s", "d", maxRounds)
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("random graph: labels equal union-find, every incident node labeled") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(500)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
    val clean = edges.filter(e => e._1 != e._2)
    val (got, _) = run(edges)
    val want = bruteLabels(clean)
    assert(got == want)
  }

  test("a 200-hop chain converges in O(log n) rounds, not O(diameter)") {
    val edges = (0L until 200L).map(i => (i, i + 1))
    val (got, rounds) = run(edges)
    assert(got.size == 201 && got.values.forall(_ == 0L))
    // ~log²(n) + 1 confirmation round; propagation would need 200.
    assert(rounds <= 10, s"took $rounds rounds on a 200-hop chain")
  }

  test("self-loops, duplicates and reversed edges are tolerated") {
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (8L, 9L))
    val (got, _) = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("q111 equals q92 on the corpus pairs") {
    val a = SparkEntry.queries("q111_dup_clusters_bigstar")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = SparkEntry.queries("q92_dup_clusters_fixpoint")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a.nonEmpty && a == b)
  }
}
