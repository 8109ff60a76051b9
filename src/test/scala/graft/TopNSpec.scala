package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.LongType

import graft.sources.{GraftScan, TableStats}

/** ORDER BY + LIMIT (TopN) file pruning: the scan must return a superset
  * of every correct top-n answer while provably-preceded files are never
  * listed. Unit-tests the pruning math on adversarial layouts (overlap,
  * nulls, legacy registry entries) and end-to-end SQL equivalence over a
  * multi-file graft table in all four direction × null-ordering modes.
  */
class TopNSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_topn").toString

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.catalog.topn", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.topn.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- pruning math ------------------------------------------------------

  private def file(rel: String): (String, Long, Seq[Any], Long) =
    (s"$warehouse/unit/data/$rel", 1000L, Seq.empty, 0L)

  private def entry(rows: Long, range: Option[(String, String)],
                    nulls: Option[Long]): TableStats.Entry =
    TableStats.Entry(rows,
      cols = range.map(r => Map("k" -> r)).getOrElse(Map.empty),
      bytes = 1000L,
      nulls = nulls.map(n => if (n > 0) Map("k" -> n) else Map.empty[String, Long]))

  private def prune(files: Seq[String], stats: Map[String, TableStats.Entry],
                    desc: Boolean, nullsFirst: Boolean, n: Int): Set[String] =
    GraftScan.pruneTopN(files.map(file), stats,
      GraftScan.TopN("k", LongType, desc, nullsFirst, n))
      .map(f => TableStats.relOf(f._1)).toSet

  test("disjoint sorted files: ascending top-k keeps only the lowest file") {
    val stats = Map(
      "f1" -> entry(10, Some(("0", "9")), Some(0)),
      "f2" -> entry(10, Some(("10", "19")), Some(0)),
      "f3" -> entry(10, Some(("20", "29")), Some(0)))
    assert(prune(Seq("f1", "f2", "f3"), stats, desc = false, nullsFirst = false, 5)
      === Set("f1"))
    // descending keeps only the highest file
    assert(prune(Seq("f1", "f2", "f3"), stats, desc = true, nullsFirst = false, 5)
      === Set("f3"))
    // n spanning two files keeps two
    assert(prune(Seq("f1", "f2", "f3"), stats, desc = false, nullsFirst = false, 15)
      === Set("f1", "f2"))
  }

  test("overlapping ranges block pruning (strict-precedence rule)") {
    val stats = Map(
      "wide" -> entry(10, Some(("0", "100")), Some(0)),
      "inner" -> entry(10, Some(("5", "50")), Some(0)))
    // neither file's rows provably precede the other's
    assert(prune(Seq("wide", "inner"), stats, desc = false, nullsFirst = false, 15)
      === Set("wide", "inner"))
    // a shared boundary value is NOT strict precedence: max(f1)=10=min(f2)
    val touching = Map(
      "f1" -> entry(10, Some(("0", "10")), Some(0)),
      "f2" -> entry(10, Some(("10", "20")), Some(0)))
    assert(prune(Seq("f1", "f2"), touching, desc = false, nullsFirst = false, 5)
      === Set("f1", "f2"))
  }

  test("null ordering: all-null files prune or survive by NULLS FIRST/LAST") {
    val stats = Map(
      "vals" -> entry(10, Some(("0", "9")), Some(0)),
      "nulls" -> entry(10, None, Some(10)))
    // NULLS FIRST: ten nulls precede every value — value file pruned
    assert(prune(Seq("vals", "nulls"), stats, desc = false, nullsFirst = true, 5)
      === Set("nulls"))
    // NULLS LAST: ten values precede every null — null file pruned
    assert(prune(Seq("vals", "nulls"), stats, desc = false, nullsFirst = false, 5)
      === Set("vals"))
    // a file that MIGHT hold nulls is unprunable under NULLS FIRST
    val mixed = Map(
      "a" -> entry(10, Some(("0", "9")), Some(1)),   // 9 values + 1 null
      "b" -> entry(10, Some(("100", "109")), Some(1)))
    assert(prune(Seq("a", "b"), mixed, desc = false, nullsFirst = true, 5)
      === Set("a", "b"))
    // ...but under NULLS LAST b's values are preceded by a's 9 values ≥ 5
    // and b's null by the same — b is pruned
    assert(prune(Seq("a", "b"), mixed, desc = false, nullsFirst = false, 5)
      === Set("a"))
  }

  test("legacy registry entries (no null counts) are conservative") {
    // legacy entry: nulls unknown => contributes nothing, blocks pruning
    val stats = Map(
      "legacy" -> entry(10, Some(("0", "9")), None),
      "high" -> entry(10, Some(("100", "109")), Some(0)))
    assert(prune(Seq("legacy", "high"), stats, desc = false, nullsFirst = false, 5)
      === Set("legacy", "high"))
    // an unregistered file disables pruning entirely
    assert(prune(Seq("legacy", "high", "ghost"),
      stats, desc = false, nullsFirst = false, 5)
      === Set("legacy", "high", "ghost"))
  }

  test("null-count registry field round-trips (and legacy lines read back None)") {
    val entries = Map(
      "a.parquet" -> TableStats.Entry(10, Map("k" -> (("0", "9"))), 100L, 3L,
        sorted = true, nulls = Some(Map("k" -> 2L))),
      "b.parquet" -> TableStats.Entry(5, Map.empty, 50L, 4L,
        nulls = Some(Map.empty)),
      "c.parquet" -> TableStats.Entry(7, Map("k" -> (("1", "2"))), 70L, 5L))
    val back = TableStats.deserialize(TableStats.serialize(entries))
    assert(back("a.parquet").nulls === Some(Map("k" -> 2L)))
    assert(back("a.parquet").cols === Map("k" -> (("0", "9"))))
    assert(back("a.parquet").sorted)
    assert(back("b.parquet").nulls === Some(Map.empty))
    assert(back("c.parquet").nulls === None)
    // a 6-field line written by an old serializer still parses
    val legacy = "old.parquet\t9\t90\tk=0,9\t2\t1\n"
    assert(TableStats.deserialize(legacy)("old.parquet").nulls === None)
  }

  test("sum registry field round-trips; 7-field lines read back sums=None") {
    val entries = Map(
      // negative and extreme sums, plus a sum-dead column (absent key)
      "a.parquet" -> TableStats.Entry(10, Map("k" -> (("-5", "9"))), 100L, 3L,
        nulls = Some(Map("k" -> 2L)), sums = Some(Map("k" -> -42L, "v" -> Long.MaxValue))),
      "b.parquet" -> TableStats.Entry(5, Map.empty, 50L, 4L,
        nulls = Some(Map.empty), sums = Some(Map.empty)),
      "c.parquet" -> TableStats.Entry(7, Map("k" -> (("1", "2"))), 70L, 5L,
        nulls = Some(Map("k" -> 1L))))
    val back = TableStats.deserialize(TableStats.serialize(entries))
    assert(back == entries)
    // a 7-field (nulls-era) line reads back sums = None — the SUM/COUNT
    // pushdown gates must then withhold
    val nullsEra = "old.parquet\t9\t90\tk=0,9\t2\t1\tk=3\n"
    val e = TableStats.deserialize(nullsEra)("old.parquet")
    assert(e.nulls === Some(Map("k" -> 3L)) && e.sums === None)
  }

  // ---- end-to-end SQL ----------------------------------------------------

  test("ORDER BY + LIMIT over a multi-file table prunes files and stays exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS topn.t")
    spark.sql("DROP TABLE IF EXISTS topn.t.ev")
    spark.sql("CREATE TABLE topn.t.ev (k BIGINT, v STRING)")
    // four disjoint batches + one overlapping + one with nulls — six files
    spark.sql("INSERT INTO topn.t.ev SELECT id, concat('a', id) FROM range(0, 100)")
    spark.sql("INSERT INTO topn.t.ev SELECT id, concat('b', id) FROM range(100, 200)")
    spark.sql("INSERT INTO topn.t.ev SELECT id, concat('c', id) FROM range(200, 300)")
    spark.sql("INSERT INTO topn.t.ev SELECT id, concat('d', id) FROM range(300, 400)")
    spark.sql("INSERT INTO topn.t.ev SELECT id, concat('e', id) FROM range(150, 250)")
    spark.sql("INSERT INTO topn.t.ev SELECT CAST(NULL AS BIGINT), concat('n', id) FROM range(0, 10)")

    def expect(sql: String): Seq[(Option[Long], String)] = {
      val rows = spark.sql(sql).collect()
      rows.map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1))).toSeq
    }

    val before = GraftScan.topNPrunedFiles.get()
    val asc = expect("SELECT k, v FROM topn.t.ev ORDER BY k ASC NULLS LAST, v LIMIT 5")
    assert(asc === (0L to 4L).map(i => (Some(i), s"a$i")))
    assert(GraftScan.topNPrunedFiles.get() > before,
      "ascending top-5 should have pruned high files")

    val desc = expect("SELECT k, v FROM topn.t.ev ORDER BY k DESC NULLS LAST, v LIMIT 5")
    assert(desc === (0 until 5).map(i => (Some(399L - i), s"d${399 - i}")))

    // NULLS FIRST: the ten null rows are the top of the order
    val nf = expect("SELECT k, v FROM topn.t.ev ORDER BY k ASC NULLS FIRST, v LIMIT 12")
    assert(nf.take(10).forall(_._1.isEmpty))
    assert(nf.drop(10) === Seq((Some(0L), "a0"), (Some(1L), "a1")))

    // NULLS LAST descending with a limit deep enough to need nulls
    val all = spark.sql("SELECT k, v FROM topn.t.ev").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
    val expDeep = all.sortBy { case (k, v) => (k.isEmpty, -k.getOrElse(0L), v) }.take(505)
    val deep = expect("SELECT k, v FROM topn.t.ev ORDER BY k DESC NULLS LAST, v LIMIT 505")
    assert(deep === expDeep.toSeq)
  }

  test("property: pruning never loses a top-n value (200 random layouts)") {
    // Synthetic file contents -> registry entries (some LEGACY without
    // null counts, some all-null) -> pruneTopN; the sorted top-n VALUE
    // multiset over the kept files must equal the one over all files, in
    // every direction x null-ordering x n. Ties are interchangeable, so
    // comparing value multisets is exactly the correctness contract.
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val nFiles = 1 + rnd.nextInt(8)
      val contents: Seq[(String, Seq[Option[Long]])] = (0 until nFiles).map { i =>
        val rows = 1 + rnd.nextInt(12)
        val lo = rnd.nextInt(100)
        val span = 1 + rnd.nextInt(40)
        s"f$i" -> Seq.fill(rows)(
          if (rnd.nextInt(5) == 0) None // ~20% nulls
          else Some((lo + rnd.nextInt(span)).toLong))
      }
      val stats: Map[String, TableStats.Entry] = contents.map { case (rel, rows) =>
        val vals = rows.flatten
        val nulls = rows.count(_.isEmpty).toLong
        val range =
          if (vals.isEmpty) Map.empty[String, (String, String)]
          else Map("k" -> ((vals.min.toString, vals.max.toString)))
        val legacy = rnd.nextInt(4) == 0 // ~25% legacy entries
        rel -> TableStats.Entry(rows.size.toLong, range, 100L,
          nulls = if (legacy) None else Some(
            if (nulls > 0) Map("k" -> nulls) else Map.empty[String, Long]))
      }.toMap
      for (desc <- Seq(false, true); nullsFirst <- Seq(false, true)) {
        val n = 1 + rnd.nextInt(15)
        val kept = prune(contents.map(_._1), stats, desc, nullsFirst, n)
        def topVals(files: Set[String]): Seq[Option[Long]] =
          contents.filter(c => files.contains(c._1)).flatMap(_._2)
            .sortBy { v =>
              val nullKey = if (nullsFirst) v.isDefined else v.isEmpty
              (nullKey, v.map(x => if (desc) -x else x).getOrElse(0L))
            }.take(n)
        assert(topVals(kept) === topVals(contents.map(_._1).toSet),
          s"trial $trial desc=$desc nullsFirst=$nullsFirst n=$n kept=$kept " +
            s"stats=$stats")
      }
    }
  }

  test("a widened sort column withholds TopN pruning (and stays exact)") {
    // pre-widening files registered ranges in FLOAT's external form;
    // parsed as double they can differ from the widened read-back values
    // (0.1f reads as 0.10000000149...), so pruning must not trust them
    spark.sql("DROP TABLE IF EXISTS topn.t.wid")
    spark.sql("CREATE TABLE topn.t.wid (k FLOAT, v STRING)")
    spark.sql("INSERT INTO topn.t.wid SELECT cast(id AS FLOAT) / 10, concat('a', id) FROM range(0, 50)")
    spark.sql("ALTER TABLE topn.t.wid ALTER COLUMN k TYPE DOUBLE")
    spark.sql("INSERT INTO topn.t.wid SELECT cast(id AS DOUBLE) / 10, concat('b', id) FROM range(50, 100)")
    val before = GraftScan.topNPrunedFiles.get()
    val got = spark.sql("SELECT k, v FROM topn.t.wid ORDER BY k ASC NULLS LAST, v LIMIT 5")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(GraftScan.topNPrunedFiles.get() === before,
      "widened-column ranges must not drive pruning")
    val all = spark.sql("SELECT k, v FROM topn.t.wid").collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    assert(got === all.sortBy { case (k, v) => (k, v) }.take(5).toSeq)
  }

  test("randomized layouts: pushed TopN ≡ full sort in all four modes") {
    val rnd = new scala.util.Random(42)
    spark.sql("DROP TABLE IF EXISTS topn.t.rand")
    spark.sql("CREATE TABLE topn.t.rand (k BIGINT, v STRING)")
    val rows = scala.collection.mutable.ArrayBuffer[(Option[Long], String)]()
    for (b <- 0 until 8) {
      val lo = rnd.nextInt(1000)
      val hi = lo + 1 + rnd.nextInt(500)
      val nNull = rnd.nextInt(3)
      val vals = (0 until 30).map(i => lo + rnd.nextInt(hi - lo)) ++
        Seq.fill(nNull)(-1)
      val sql = vals.zipWithIndex.map { case (k, i) =>
        if (k < 0) s"(CAST(NULL AS BIGINT), 'b$b-$i')" else s"($k, 'b$b-$i')"
      }.mkString(", ")
      spark.sql(s"INSERT INTO topn.t.rand VALUES $sql")
      rows ++= vals.zipWithIndex.map { case (k, i) =>
        (if (k < 0) None else Some(k.toLong), s"b$b-$i")
      }
    }
    for (desc <- Seq(false, true); nullsFirst <- Seq(false, true); n <- Seq(3, 17, 60)) {
      val dir = if (desc) "DESC" else "ASC"
      val no = if (nullsFirst) "NULLS FIRST" else "NULLS LAST"
      val got = spark.sql(
        s"SELECT k, v FROM topn.t.rand ORDER BY k $dir $no, v LIMIT $n").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1))).toSeq
      val exp = rows.toSeq.sortBy { case (k, v) =>
        val nullKey = if (nullsFirst) k.isDefined else k.isEmpty
        val valKey = k.map(x => if (desc) -x else x).getOrElse(0L)
        (nullKey, valKey, v)
      }.take(n)
      assert(got === exp, s"mode $dir $no LIMIT $n")
    }
  }
}
