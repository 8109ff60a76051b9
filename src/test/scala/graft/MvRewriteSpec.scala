package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized-view auto-rewrite: a matching aggregate over the base
  * table must re-plan against a FRESH MV (plan shape asserted via the
  * scanned table name), fall back to the base the moment the MV is stale,
  * and resume after REFRESH. Values must be identical either way.
  */
class MvRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_mv").toString

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.catalog.mvc", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.mvc.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def scansMv(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("dailies") &&
      !df.queryExecution.optimizedPlan.toString.contains("base_ev")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("setup: base table and materialized view") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvc.m")
    spark.sql("CREATE TABLE mvc.m.base_ev (day STRING, etype STRING, v BIGINT, d DOUBLE)")
    spark.sql("""INSERT INTO mvc.m.base_ev VALUES
      ('d1', 'click', 1, 0.5), ('d1', 'click', 2, 1.5), ('d1', 'view', 3, 2.0),
      ('d2', 'click', 4, 0.25), ('d2', 'view', 5, 4.0), ('d2', 'view', 6, 1.0)""")
    val v = spark.sql(
      """CREATE MATERIALIZED VIEW mvc.m.dailies AS
        |SELECT day, etype, count(*) AS cnt, sum(v) AS sv, min(v) AS mnv,
        |       max(d) AS mxd
        |FROM mvc.m.base_ev GROUP BY day, etype""".stripMargin).collect()
    assert(v.head.getLong(0) >= 1)
    assert(rows(spark.sql("SELECT * FROM mvc.m.dailies")).size === 4)
  }

  test("same-grouping aggregate re-plans against the MV") {
    val q = spark.sql(
      """SELECT day, etype, count(*) AS cnt, sum(v) AS sv
        |FROM mvc.m.base_ev GROUP BY day, etype""".stripMargin)
    assert(scansMv(q), q.queryExecution.optimizedPlan.toString)
    assert(rows(q.orderBy("day", "etype")) === Seq(
      Seq("d1", "click", 2L, 3L), Seq("d1", "view", 1L, 3L),
      Seq("d2", "click", 1L, 4L), Seq("d2", "view", 2L, 11L)))
  }

  test("rollup to fewer grouping columns folds MV partials") {
    val q = spark.sql(
      """SELECT day, count(*) AS cnt, sum(v) AS sv, min(v) AS mnv, max(d) AS mxd
        |FROM mvc.m.base_ev GROUP BY day""".stripMargin)
    assert(scansMv(q), q.queryExecution.optimizedPlan.toString)
    assert(rows(q.orderBy("day")) === Seq(
      Seq("d1", 3L, 6L, 1L, 2.0), Seq("d2", 3L, 15L, 4L, 4.0)))
    // global rollup (no GROUP BY)
    val g = spark.sql("SELECT count(*) AS cnt, sum(v) AS sv FROM mvc.m.base_ev")
    assert(scansMv(g), g.queryExecution.optimizedPlan.toString)
    assert(rows(g) === Seq(Seq(6L, 21L)))
  }

  test("filter on MV grouping columns commutes and rewrites") {
    val q = spark.sql(
      """SELECT day, sum(v) AS sv FROM mvc.m.base_ev
        |WHERE etype = 'view' GROUP BY day""".stripMargin)
    assert(scansMv(q), q.queryExecution.optimizedPlan.toString)
    assert(rows(q.orderBy("day")) === Seq(Seq("d1", 3L), Seq("d2", 11L)))
  }

  test("filter on a non-grouping column blocks the rewrite") {
    val q = spark.sql(
      "SELECT day, count(*) AS cnt FROM mvc.m.base_ev WHERE v > 2 GROUP BY day")
    assert(!scansMv(q), q.queryExecution.optimizedPlan.toString)
    assert(rows(q.orderBy("day")) === Seq(Seq("d1", 1L), Seq("d2", 3L)))
  }

  test("unsupported aggregates (avg w/o stored count(col), distinct) keep the base plan") {
    // avg(v) needs BOTH count(v) and sum(v) in the MV; dailies stores
    // only count(*) + sum(v), so the base plan stays (the COUNT(col)+AVG
    // rewrite test below covers the served case)
    val avg = spark.sql("SELECT day, avg(v) AS a FROM mvc.m.base_ev GROUP BY day")
    assert(!scansMv(avg))
    val dist = spark.sql(
      "SELECT day, count(DISTINCT etype) AS c FROM mvc.m.base_ev GROUP BY day")
    assert(!scansMv(dist))
    assert(rows(dist.orderBy("day")) === Seq(Seq("d1", 2L), Seq("d2", 2L)))
  }

  test("a base commit makes the MV stale: fall back, REFRESH resumes") {
    spark.sql("INSERT INTO mvc.m.base_ev VALUES ('d3', 'click', 10, 9.0)")
    val stale = spark.sql(
      "SELECT day, count(*) AS cnt, sum(v) AS sv FROM mvc.m.base_ev GROUP BY day")
    assert(!scansMv(stale), "stale MV must not serve queries")
    assert(rows(stale.orderBy("day")) === Seq(
      Seq("d1", 3L, 6L), Seq("d2", 3L, 15L), Seq("d3", 1L, 10L)))

    // append-only range + integral sums => the refresh is INCREMENTAL
    // (only the appended files are read, delta MERGEd into the MV) — and
    // SINGLE-PASS: the grouped delta is persisted on the executors (no
    // driver collect of grouped rows), so the one delta file is READ
    // exactly once, not once to verify and again for the MERGE
    val inc0 = graft.sources.GraftScan.incrementalReaderOpens.get()
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies").collect()
    assert(r.head.getString(1) === "incremental", r.mkString(","))
    val incN = graft.sources.GraftScan.incrementalReaderOpens.get() - inc0
    assert(incN == 1, s"incremental refresh read the 1-file delta $incN times, want 1")
    val fresh = spark.sql(
      "SELECT day, count(*) AS cnt, sum(v) AS sv FROM mvc.m.base_ev GROUP BY day")
    assert(scansMv(fresh), fresh.queryExecution.optimizedPlan.toString)
    assert(rows(fresh.orderBy("day")) === Seq(
      Seq("d1", 3L, 6L), Seq("d2", 3L, 15L), Seq("d3", 1L, 10L)))
    // the MERGEd MV contents equal a from-scratch aggregation, incl.
    // min/max folds and the new d3 group's insert
    assert(rows(spark.sql(
      "SELECT day, etype, cnt, sv, mnv, mxd FROM mvc.m.dailies ORDER BY day, etype"))
      === Seq(
        Seq("d1", "click", 2L, 3L, 1L, 1.5), Seq("d1", "view", 1L, 3L, 3L, 2.0),
        Seq("d2", "click", 1L, 4L, 4L, 0.25), Seq("d2", "view", 2L, 11L, 5L, 4.0),
        Seq("d3", "click", 1L, 10L, 10L, 9.0)))
    // nothing changed since => noop
    val r2 = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies").collect()
    assert(r2.head.getString(1) === "noop")
  }

  test("a COW mutation without recorded change data forces a FULL refresh") {
    // base_ev has no row_key column, so the COW DELETE records no change
    // files — its row delta is unknowable and the range is OPAQUE (keyed
    // tables instead take the incremental-cdc group-repair path; see the
    // cdc tests below)
    spark.sql("DELETE FROM mvc.m.base_ev WHERE v = 10")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies").collect()
    assert(r.head.getString(1) === "full", r.mkString(","))
    val q = spark.sql(
      "SELECT day, count(*) AS cnt, sum(v) AS sv FROM mvc.m.base_ev GROUP BY day")
    assert(scansMv(q), q.queryExecution.optimizedPlan.toString)
    assert(rows(q.orderBy("day")) === Seq(Seq("d1", 3L, 6L), Seq("d2", 3L, 15L)))
  }

  test("double-typed SUM columns refuse the FOLD path AND the rewrite") {
    spark.sql("DROP TABLE IF EXISTS mvc.m.dsum")
    spark.sql(
      """CREATE MATERIALIZED VIEW mvc.m.dsum AS
        |SELECT day, sum(d) AS sd FROM mvc.m.base_ev GROUP BY day""".stripMargin)
    // rewrite refusal: re-summing double partials changes the floating
    // summation order — the same query must not return bitwise-different
    // totals depending on MV freshness
    val q = spark.sql("SELECT day, sum(d) AS sd FROM mvc.m.base_ev GROUP BY day")
    assert(!q.queryExecution.optimizedPlan.toString.contains("dsum"),
      q.queryExecution.optimizedPlan.toString)
    spark.sql("INSERT INTO mvc.m.base_ev VALUES ('d4', 'view', 11, 2.5)")
    // a double sum must never FOLD (order-dependent) — but the refresh
    // still repairs incrementally by RECOMPUTING each affected group
    // from the base, the same aggregation a full recompute would run
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dsum").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(rows(spark.sql("SELECT day, sd FROM mvc.m.dsum ORDER BY day")) ===
      rows(spark.sql(
        "SELECT day, sum(d) AS sd FROM mvc.m.base_ev GROUP BY day ORDER BY day")))
    spark.sql("DROP MATERIALIZED VIEW mvc.m.dsum")
    spark.sql("DELETE FROM mvc.m.base_ev WHERE day = 'd4'")
    spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies")
  }

  test("a leftover pending marker forces a FULL refresh (crash-retry safety)") {
    // simulate a crash between the incremental MERGE and the version
    // stamp: the marker is present, so whether the delta applied is
    // unknowable — retry must recompute, never re-fold
    spark.sql("INSERT INTO mvc.m.base_ev VALUES ('d9', 'click', 7, 1.0)")
    spark.sql("ALTER TABLE mvc.m.dailies SET TBLPROPERTIES ('graft.mv.pending' = '1:2')")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies").collect()
    assert(r.head.getString(1) === "full", r.mkString(","))
    // marker cleared, values exact, next refresh is a noop again
    assert(rows(spark.sql(
      "SELECT cnt, sv FROM mvc.m.dailies WHERE day = 'd9'")) === Seq(Seq(1L, 7L)))
    val r2 = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies").collect()
    assert(r2.head.getString(1) === "noop")
    spark.sql("DELETE FROM mvc.m.base_ev WHERE day = 'd9'")
    spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies")
  }

  test("SHOW MATERIALIZED VIEWS reports base and live freshness") {
    val r = rows(spark.sql("SHOW MATERIALIZED VIEWS IN mvc.m"))
    assert(r.size === 1)
    assert(r.head(0) === "dailies")
    assert(r.head(1) === "mvc.m.base_ev")
    assert(r.head(3) === true, s"expected fresh after refresh: $r")
    spark.sql("INSERT INTO mvc.m.base_ev VALUES ('d5', 'view', 12, 1.0)")
    val stale = rows(spark.sql("SHOW MATERIALIZED VIEWS IN mvc.m"))
    assert(stale.head(3) === false, s"expected stale after append: $stale")
    spark.sql("REFRESH MATERIALIZED VIEW mvc.m.dailies")
  }

  test("time travel on the base never rewrites") {
    val q = spark.sql(
      "SELECT day, count(*) AS cnt FROM mvc.m.base_ev VERSION AS OF 1 GROUP BY day")
    assert(!scansMv(q), q.queryExecution.optimizedPlan.toString)
    assert(rows(q.orderBy("day")) === Seq(Seq("d1", 3L), Seq("d2", 3L)))
  }

  test("rewrite planning cost is metadata-bounded (registry reads per query)") {
    // an MV-rewritten query must not multiply metadata I/O: with the
    // per-invocation caches, planning + executing the rewritten
    // aggregate stays within a small constant number of registry reads
    // however many times the fixed-point optimizer batch re-runs the
    // rule (before the caches, every batch iteration re-listed the
    // snapshot log and re-loaded every candidate MV)
    val r0 = graft.sources.TableStats.registryReads.get()
    spark.sql(
      "SELECT day, count(*) AS cnt FROM mvc.m.base_ev GROUP BY day").collect()
    val reads = graft.sources.TableStats.registryReads.get() - r0
    assert(reads <= 10, s"MV-rewritten query planned with $reads registry reads")
  }

  test("kill-switch disables the rewrite") {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try {
      val q = spark.sql(
        "SELECT day, count(*) AS cnt FROM mvc.m.base_ev GROUP BY day")
      assert(!scansMv(q))
    } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("an unhealed crash orphan on the base does not break REFRESH") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import graft.sources.{Snapshots, TableStats}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvc.o")
    spark.sql("CREATE TABLE mvc.o.base (day STRING, v BIGINT)")
    spark.sql("INSERT INTO mvc.o.base VALUES ('d1', 1)")
    spark.sql("""CREATE MATERIALIZED VIEW mvc.o.mv AS
      |SELECT day, count(*) AS cnt, sum(v) AS sv
      |FROM mvc.o.base GROUP BY day""".stripMargin)
    spark.sql("INSERT INTO mvc.o.base VALUES ('d2', 5)") // MV now stale
    // a crashed commit's orphan ABOVE the live head: snapshot recorded,
    // registry never swapped (same primitives as TableStats.write)
    val d = new Path(s"$warehouse/o/base/data")
    val fs = d.getFileSystem(new Configuration())
    TableStats.withLock(fs, d) {
      val head = TableStats.liveVersion(fs, d)
      val next = Snapshots.nextVersion(fs, d)
      val stats = TableStats.read(fs, d) +
        ("part-orphan-mv.parquet" -> TableStats.Entry(3, seq = next))
      Snapshots.recordAt(fs, d, stats, next, base = head)
    }
    // REFRESH must target the LIVE head, not the max recorded snapshot —
    // pinning the orphan would trip the crashed-commit guard and fail
    // every refresh until another base commit healed it
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.o.mv").collect()
    assert(Seq("incremental", "full").contains(r.head.getString(1)),
      r.mkString(","))
    assert(rows(spark.sql("SELECT cnt, sv FROM mvc.o.mv WHERE day = 'd2'"))
      === Seq(Seq(1L, 5L)))
  }

  test("COUNT(col) + AVG rewrite from stored non-null counts") {
    spark.sql("CREATE TABLE mvc.m.avb (row_key STRING, g STRING, x BIGINT)")
    spark.sql("""INSERT INTO mvc.m.avb VALUES
      ('k1', 'a', 10), ('k2', 'a', NULL), ('k3', 'a', 20), ('k4', 'b', NULL),
      ('k5', 'b', NULL), ('k6', 'c', 7)""")
    spark.sql(
      """CREATE MATERIALIZED VIEW mvc.m.avmv AS
        |SELECT g, count(*) AS cnt, count(x) AS cx, sum(x) AS sx
        |FROM mvc.m.avb GROUP BY g""".stripMargin)
    def served(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("avmv") &&
        !df.queryExecution.optimizedPlan.toString.contains("avb")
    // count(x) ignores NULLs; avg(x) = exact sum / non-null count, NULL
    // for the all-NULL group — both must serve from the MV
    val q = spark.sql(
      "SELECT g, count(x) AS cx, avg(x) AS ax FROM mvc.m.avb GROUP BY g")
    assert(served(q), q.queryExecution.optimizedPlan.toString)
    assert(rows(q.orderBy("g")) === Seq(
      Seq("a", 2L, 15.0), Seq("b", 0L, null), Seq("c", 1L, 7.0)))
    // global AVG folds partial sums/counts across MV rows
    val g = spark.sql("SELECT avg(x) AS ax, count(x) AS cx FROM mvc.m.avb")
    assert(served(g), g.queryExecution.optimizedPlan.toString)
    assert(rows(g) === Seq(Seq(37.0 / 3, 3L)))
    // an MV without the matching COUNT(col) must NOT serve avg
    val noServe = spark.sql("SELECT day, avg(v) FROM mvc.m.base_ev GROUP BY day")
    assert(!noServe.queryExecution.optimizedPlan.toString.contains("dailies"),
      noServe.queryExecution.optimizedPlan.toString)
  }

  test("COUNT(col) folds through incremental, cdc-repair, and full refresh") {
    // append with NULLs: fold tier must add non-null counts only, and a
    // brand-new all-NULL group must insert cx = 0 (not NULL)
    spark.sql(
      "INSERT INTO mvc.m.avb VALUES ('k7', 'a', NULL), ('k8', 'a', 5), ('k9', 'z', NULL)")
    val r1 = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.avmv").collect()
    assert(r1.head.getString(1) === "incremental", r1.mkString(","))
    def mvNow: Seq[Seq[Any]] = rows(spark.sql(
      "SELECT g, cnt, cx, sx FROM mvc.m.avmv ORDER BY g"))
    assert(mvNow === rows(spark.sql(
      """SELECT g, count(*) AS cnt, count(x) AS cx, sum(x) AS sx
        |FROM mvc.m.avb GROUP BY g ORDER BY g""".stripMargin)))
    assert(mvNow.find(_.head == "z").get === Seq("z", 1L, 0L, null))
    // keyed COW delete of a non-null row: the cdc repair recomputes the
    // touched group, whose count(x) falls back to 2
    spark.sql("DELETE FROM mvc.m.avb WHERE x = 5")
    val r2 = spark.sql("REFRESH MATERIALIZED VIEW mvc.m.avmv").collect()
    assert(r2.head.getString(1) === "incremental-cdc", r2.mkString(","))
    assert(mvNow === rows(spark.sql(
      """SELECT g, count(*) AS cnt, count(x) AS cx, sum(x) AS sx
        |FROM mvc.m.avb GROUP BY g ORDER BY g""".stripMargin)))
  }

  // ------------- incremental refresh across MUTATING commits (cdc) -------

  private def fullAgg(table: String): Seq[Seq[Any]] = rows(spark.sql(
    s"""SELECT day, etype, count(*) AS cnt, sum(v) AS sv, min(v) AS mnv,
       |       max(v) AS mxv
       |FROM $table GROUP BY day, etype ORDER BY day, etype""".stripMargin))

  private def mvRows: Seq[Seq[Any]] = rows(spark.sql(
    "SELECT day, etype, cnt, sv, mnv, mxv FROM mvc.c.kmv ORDER BY day, etype"))

  test("cdc: COW deletes + appends repair groups incrementally") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvc.c")
    spark.sql(
      "CREATE TABLE mvc.c.kb (row_key STRING, day STRING, etype STRING, v BIGINT)")
    spark.sql("""INSERT INTO mvc.c.kb VALUES
      ('k1','d1','click',1), ('k2','d1','click',2), ('k3','d1','view',3),
      ('k4','d2','click',4), ('k5','d2','view',5), ('k6','d2','view',6)""")
    spark.sql(
      """CREATE MATERIALIZED VIEW mvc.c.kmv AS
        |SELECT day, etype, count(*) AS cnt, sum(v) AS sv, min(v) AS mnv,
        |       max(v) AS mxv
        |FROM mvc.c.kb GROUP BY day, etype""".stripMargin)
    // the range mixes every repair shape: a whole-group COW delete
    // ((d1,view) must LEAVE the MV), a delete of a group's max row
    // ((d2,view) max must fall 6 -> 5 — the case a fold can never
    // derive), and an append into an existing group ((d1,click) folds)
    spark.sql("DELETE FROM mvc.c.kb WHERE row_key = 'k3'")
    spark.sql("DELETE FROM mvc.c.kb WHERE row_key = 'k6'")
    spark.sql("INSERT INTO mvc.c.kb VALUES ('k8','d1','click',10)")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.kmv").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(mvRows === fullAgg("mvc.c.kb"))
    assert(!mvRows.exists(r => r(0) == "d1" && r(1) == "view"),
      s"vanished group must be DELETEd from the MV: $mvRows")
    assert(mvRows.find(r => r(0) == "d2" && r(1) == "view").get ===
      Seq("d2", "view", 1L, 5L, 5L, 5L))
    assert(mvRows.find(r => r(0) == "d1" && r(1) == "click").get ===
      Seq("d1", "click", 3L, 13L, 1L, 10L))
    // fresh again: the rewrite serves from the repaired MV
    val q = spark.sql(
      "SELECT day, count(*) AS cnt FROM mvc.c.kb GROUP BY day")
    assert(q.queryExecution.optimizedPlan.toString.contains("kmv"),
      q.queryExecution.optimizedPlan.toString)
  }

  test("cdc: an UPDATE moving a row between groups repairs both sides") {
    // preimage decrements (d2,view) — its last row, so the group
    // vanishes; postimage lands in brand-new (d9,view), an insert-only
    // group the fold tier creates
    spark.sql("UPDATE mvc.c.kb SET day = 'd9' WHERE row_key = 'k5'")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.kmv").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(mvRows === fullAgg("mvc.c.kb"))
    assert(!mvRows.exists(r => r(0) == "d2" && r(1) == "view"))
    assert(mvRows.find(r => r(0) == "d9").get === Seq("d9", "view", 1L, 5L, 5L, 5L))
  }

  test("cdc: a sum returns to NULL when its last non-null value leaves") {
    // the pure signed fold CANNOT derive this (t.sv - 7 = 0, not NULL) —
    // the group lost a row, so it recomputes and lands on SUM = NULL
    spark.sql("""INSERT INTO mvc.c.kb VALUES
      ('k10','dn','view',7), ('k11','dn','view',NULL)""")
    spark.sql("REFRESH MATERIALIZED VIEW mvc.c.kmv")
    spark.sql("DELETE FROM mvc.c.kb WHERE row_key = 'k10'")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.kmv").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(mvRows === fullAgg("mvc.c.kb"))
    assert(mvRows.find(r => r(0) == "dn").get === Seq("dn", "view", 1L, null, null, null))
  }

  test("cdc: INSERT OVERWRITE (replace, unkeyed) repairs from file preimages") {
    // replace commits read removed files straight off disk for their
    // preimages — no row_key needed, so even unkeyed tables refresh
    // incrementally across an overwrite
    spark.sql("CREATE TABLE mvc.c.ub (day STRING, etype STRING, v BIGINT)")
    spark.sql("""INSERT INTO mvc.c.ub VALUES
      ('d1','click',1), ('d1','view',2), ('d2','click',3)""")
    spark.sql(
      """CREATE MATERIALIZED VIEW mvc.c.umv AS
        |SELECT day, count(*) AS cnt, sum(v) AS sv
        |FROM mvc.c.ub GROUP BY day""".stripMargin)
    spark.sql("""INSERT OVERWRITE TABLE mvc.c.ub VALUES
      ('d1','click',9), ('d3','view',4)""")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.umv").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(rows(spark.sql("SELECT day, cnt, sv FROM mvc.c.umv ORDER BY day")) ===
      Seq(Seq("d1", 1L, 9L), Seq("d3", 1L, 4L)))
  }

  test("cdc: merge-on-read deletes repair via hydrated preimages") {
    spark.sql(
      s"""CREATE TABLE mvc.c.mb (row_key STRING, day STRING, etype STRING,
         |  v BIGINT)
         |TBLPROPERTIES ('${graft.sources.GraftDeletes.ModeProp}' = 'merge-on-read')"""
        .stripMargin)
    spark.sql("""INSERT INTO mvc.c.mb VALUES
      ('m1','d1','click',1), ('m2','d1','click',2), ('m3','d2','view',3)""")
    spark.sql(
      """CREATE MATERIALIZED VIEW mvc.c.mmv AS
        |SELECT day, count(*) AS cnt, sum(v) AS sv
        |FROM mvc.c.mb GROUP BY day""".stripMargin)
    // a MOR delete records only equality KEYS — but the prior snapshot
    // still holds the deleted row, so the hydrated feed recovers its
    // full preimage and the refresh repairs ONLY group d1
    spark.sql("DELETE FROM mvc.c.mb WHERE row_key = 'm2'")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.mmv").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(rows(spark.sql("SELECT day, cnt, sv FROM mvc.c.mmv ORDER BY day")) ===
      Seq(Seq("d1", 1L, 1L), Seq("d2", 1L, 3L)))
  }

  test("cdc: a MOR group-vanishing delete + same-commit rewrite (UPDATE)") {
    // UPDATE on a merge-on-read table commits delete keys + replacement
    // rows together; the hydrated feed pairs them as update_preimage
    // (real prior values) + update_postimage. Moving m3 from d2 into d1
    // must vanish group d2 (DELETE from the MV) and repair d1.
    spark.sql("UPDATE mvc.c.mb SET day = 'd1' WHERE row_key = 'm3'")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.mmv").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(rows(spark.sql("SELECT day, cnt, sv FROM mvc.c.mmv ORDER BY day")) ===
      Seq(Seq("d1", 2L, 4L)))
    // pure MOR delete of the group's max row: min/max must recompute
    spark.sql("DELETE FROM mvc.c.mb WHERE row_key = 'm3'")
    val r2 = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.mmv").collect()
    assert(r2.head.getString(1) === "incremental-cdc", r2.mkString(","))
    assert(rows(spark.sql("SELECT day, cnt, sv FROM mvc.c.mmv ORDER BY day")) ===
      Seq(Seq("d1", 1L, 1L)))
  }

  test("cdc: hydrated MOR deletes count ROWS, not keys (duplicate keys)") {
    // two physical rows under one row_key (append twice): a MOR delete of
    // that key removes BOTH; hydration emits one preimage per row, so the
    // repaired count falls by 2 — a key-echo feed would subtract only 1
    spark.sql(
      s"""CREATE TABLE mvc.c.db (row_key STRING, day STRING, v BIGINT)
         |TBLPROPERTIES ('${graft.sources.GraftDeletes.ModeProp}' = 'merge-on-read')"""
        .stripMargin)
    spark.sql("INSERT INTO mvc.c.db VALUES ('x','d1',1), ('y','d1',10)")
    spark.sql("INSERT INTO mvc.c.db VALUES ('x','d1',2)")
    spark.sql(
      """CREATE MATERIALIZED VIEW mvc.c.dmv AS
        |SELECT day, count(*) AS cnt, sum(v) AS sv
        |FROM mvc.c.db GROUP BY day""".stripMargin)
    spark.sql("DELETE FROM mvc.c.db WHERE row_key = 'x'")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvc.c.dmv").collect()
    assert(r.head.getString(1) === "incremental-cdc", r.mkString(","))
    assert(rows(spark.sql("SELECT day, cnt, sv FROM mvc.c.dmv ORDER BY day")) ===
      Seq(Seq("d1", 1L, 10L)))
  }

  test("DROP MATERIALIZED VIEW deregisters; plain tables are refused") {
    intercept[Exception] {
      spark.sql("DROP MATERIALIZED VIEW mvc.m.base_ev")
    }
    spark.sql("DROP MATERIALIZED VIEW mvc.m.dailies")
    val q = spark.sql("SELECT day, count(*) AS cnt FROM mvc.m.base_ev GROUP BY day")
    assert(!scansMv(q))
    assert(rows(q).size === 3)
    intercept[Exception] {
      spark.sql("DROP MATERIALIZED VIEW mvc.m.dailies")
    }
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS mvc.m.dailies") // no-op
  }

  // ---- streaming maintenance: MvMaintain tails the change feed ---------

  private def recomputeS: Seq[Seq[Any]] = rows(spark.sql(
    "SELECT day, count(*) AS cnt, sum(v) AS sv FROM mvc.s.sb GROUP BY day ORDER BY day"))
  private def mvS: Seq[Seq[Any]] = rows(spark.sql(
    "SELECT day, cnt, sv FROM mvc.s.smv ORDER BY day"))

  test("streaming maintainer: MV tracks appends and COW deletes, never full") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvc.s")
    spark.sql("CREATE TABLE mvc.s.sb (row_key STRING, day STRING, v BIGINT)")
    spark.sql("INSERT INTO mvc.s.sb VALUES ('a','d1',1), ('b','d1',2), ('c','d2',3)")
    spark.sql(
      """CREATE MATERIALIZED VIEW mvc.s.smv AS
        |SELECT day, count(*) AS cnt, sum(v) AS sv
        |FROM mvc.s.sb GROUP BY day""".stripMargin)
    val modes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ckpt = Files.createTempDirectory("mv_maintain").toString
    def drain(): Unit = graft.streaming.MvMaintain.start(
      spark, "mvc.s.smv", ckpt,
      onRefresh = (_, m) => { modes.add(m); () }).awaitTermination()
    // the maintainer is started with commits already outstanding — its
    // first drained batch must fold them in (append-only => fold tier)
    spark.sql("INSERT INTO mvc.s.sb VALUES ('d','d2',4), ('e','d3',5)")
    drain()
    assert(mvS === recomputeS, "after append drain")
    // a mutation commit routes the NEXT drain through the cdc repair
    spark.sql("DELETE FROM mvc.s.sb WHERE row_key = 'b'")
    spark.sql("INSERT INTO mvc.s.sb VALUES ('f','d1',6)")
    drain()
    assert(mvS === recomputeS, "after delete+append drain")
    import scala.jdk.CollectionConverters._
    val census = modes.asScala.toSeq.filter(_ != "noop")
    assert(census.nonEmpty && census.forall(m =>
      m == "incremental" || m == "incremental-cdc"),
      s"route census must never contain 'full': $census")
    assert(census.contains("incremental-cdc"),
      s"the delete range must repair via cdc: $census")
  }

  test("streaming maintainer: checkpoint resume does not re-refresh") {
    // same checkpoint, no new commits: the source delivers nothing (or an
    // empty batch whose refresh is a noop) — recorded version is stable
    val modes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ckpt = Files.createTempDirectory("mv_maintain2").toString
    def drain(): Unit = graft.streaming.MvMaintain.start(
      spark, "mvc.s.smv", ckpt,
      onRefresh = (_, m) => { modes.add(m); () }).awaitTermination()
    drain() // fresh checkpoint replays the whole feed; refresh is a noop
    val before = mvS
    drain() // resumed checkpoint: nothing outstanding
    import scala.jdk.CollectionConverters._
    assert(modes.asScala.forall(_ == "noop"),
      s"an already-fresh MV must only ever see noop refreshes: ${modes.asScala}")
    assert(mvS === before)
  }

  test("streaming maintainer refuses non-MV and non-graft names") {
    intercept[IllegalArgumentException] {
      graft.streaming.MvMaintain.start(spark, "mvc.s.sb",
        Files.createTempDirectory("mv_maintain3").toString)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.MvMaintain.start(spark, "nosuch.ns.mv",
        Files.createTempDirectory("mv_maintain4").toString)
    }
  }
}
