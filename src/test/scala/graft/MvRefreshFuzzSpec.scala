package graft

import java.nio.file.Files

import scala.util.Random

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Randomized soundness harness for the incremental-refresh ROUTER: a
  * seeded stream of mutations (appends with NULLs, predicate COW/MOR
  * deletes, updates, INSERT OVERWRITE, RESTORE) interleaved with
  * REFRESH MATERIALIZED VIEW, over both mutation modes. After EVERY
  * refresh the MV must equal a from-scratch aggregation of the base
  * (computed with the rewrite disabled, so the check can never be
  * served circularly from the MV under test), whatever route the
  * refresh picked — append fold, cdc group repair (hydrated for MOR),
  * or full recompute. The route itself must come from the legal set,
  * and a RESTORE in the range must never route incrementally.
  *
  * This is the fuzz companion to MvRewriteSpec's directed cases: the
  * directed tests pin each route's behavior, this one hunts for op
  * ORDERINGS where the metadata classification and the actual row
  * delta disagree.
  */
class MvRefreshFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_mvfuzz").toString

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.catalog.mvf", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.mvf.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def truth(table: String): Seq[Seq[Any]] = {
    // the ground-truth aggregate must BYPASS the rewrite — after a
    // refresh the MV is fresh and would serve this exact query
    spark.conf.set(graft.sources.MaterializedViews.EnabledConf, "false")
    try spark.sql(
      s"""SELECT g, count(*) AS cnt, count(x) AS cx, sum(x) AS sx,
         |       min(x) AS mnx, max(x) AS mxx
         |FROM $table GROUP BY g ORDER BY g""".stripMargin)
      .collect().toSeq.map(_.toSeq)
    finally spark.conf.set(graft.sources.MaterializedViews.EnabledConf, "true")
  }

  private def mvRows(mv: String): Seq[Seq[Any]] =
    spark.sql(s"SELECT g, cnt, cx, sx, mnx, mxx FROM $mv ORDER BY g")
      .collect().toSeq.map(_.toSeq)

  private def runSequence(seed: Long, mor: Boolean): Unit = {
    val rnd = new Random(seed)
    val suffix = (if (mor) "m" else "c") + seed
    val tbl = s"mvf.f.base_$suffix"
    val mv = s"mvf.f.mv_$suffix"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvf.f")
    val props = if (mor)
      s"TBLPROPERTIES ('${graft.sources.GraftDeletes.ModeProp}' = 'merge-on-read')"
    else ""
    spark.sql(s"CREATE TABLE $tbl (row_key STRING, g INT, x BIGINT) $props")
    var nextKey = 0
    def insert(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        val k = nextKey; nextKey += 1
        val g = rnd.nextInt(5)
        val x = if (rnd.nextInt(5) == 0) "NULL" else (rnd.nextInt(100) - 20).toString
        s"('k$k', $g, $x)"
      }
      spark.sql(s"INSERT INTO $tbl VALUES ${rows.mkString(", ")}")
    }
    insert(6)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $mv AS
         |SELECT g, count(*) AS cnt, count(x) AS cx, sum(x) AS sx,
         |       min(x) AS mnx, max(x) AS mxx
         |FROM $tbl GROUP BY g""".stripMargin)

    val legal = Set("noop", "incremental", "incremental-cdc", "full")
    var restoredSinceRefresh = false
    def refreshAndCheck(tag: String): Unit = {
      val mode = spark.sql(s"REFRESH MATERIALIZED VIEW $mv")
        .collect().head.getString(1)
      assert(legal.contains(mode), s"[$tag seed=$seed mor=$mor] illegal mode $mode")
      seenModes += mode
      if (restoredSinceRefresh)
        assert(mode == "full" || mode == "noop",
          s"[$tag seed=$seed mor=$mor] RESTORE in range must recompute, got $mode")
      restoredSinceRefresh = false
      assert(mvRows(mv) === truth(tbl),
        s"[$tag seed=$seed mor=$mor] MV diverged after a '$mode' refresh")
    }

    var restorable = List.empty[Long] // committed versions we may RESTORE to
    for (op <- 1 to 30) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          insert(1 + rnd.nextInt(4))
        case 3 =>
          spark.sql(s"DELETE FROM $tbl WHERE x % ${2 + rnd.nextInt(5)} = 0")
        case 4 =>
          spark.sql(s"UPDATE $tbl SET x = x + ${1 + rnd.nextInt(9)} " +
            s"WHERE g = ${rnd.nextInt(5)} AND x IS NOT NULL")
        case 5 =>
          // whole-table replace: removed files stay on disk, so the
          // replace commit's preimages are fully recoverable
          val rows = (0 until 2 + rnd.nextInt(3)).map { _ =>
            val k = nextKey; nextKey += 1
            s"('k$k', ${rnd.nextInt(5)}, ${rnd.nextInt(50)})"
          }
          spark.sql(s"INSERT OVERWRITE TABLE $tbl VALUES ${rows.mkString(", ")}")
        case 6 =>
          val dataDir = s"$warehouse/f/base_$suffix"
          if (restorable.nonEmpty && rnd.nextBoolean()) {
            graft.sources.Snapshots.restore(dataDir, restorable.head)
            restoredSinceRefresh = true
          } else {
            val fs = new org.apache.hadoop.fs.Path(dataDir, "data")
              .getFileSystem(new org.apache.hadoop.conf.Configuration())
            val vs = graft.sources.Snapshots.list(fs,
              new org.apache.hadoop.fs.Path(dataDir, "data"))
            if (vs.nonEmpty) restorable = vs.last._1 :: Nil
          }
        case _ =>
          refreshAndCheck(s"op$op")
      }
    }
    refreshAndCheck("final")
  }

  /** Routes observed across every sequence — the fuzz must actually
    * EXERCISE the interesting paths, not pass by recomputing fully. */
  private val seenModes = scala.collection.mutable.Set[String]()

  test("cow: randomized mutation/refresh sequences stay exact") {
    Seq(11L, 42L, 1337L).foreach(runSequence(_, mor = false))
  }

  test("mor: randomized mutation/refresh sequences stay exact") {
    Seq(7L, 23L, 99L).foreach(runSequence(_, mor = true))
    // deterministic seeds → a stable route census; the sequences must
    // have driven the fold, the cdc repair, AND the full fallback
    assert(Set("incremental", "incremental-cdc", "full").subsetOf(seenModes),
      s"fuzz exercised only $seenModes")
  }
}
