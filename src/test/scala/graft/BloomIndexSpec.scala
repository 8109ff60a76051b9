package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{BloomIndex, GraftScan, TableStats}

/** Registry-level per-file Bloom pruning ([[BloomIndex]]): equality
  * lookups on UNCLUSTERED columns — where every file's [min, max] spans
  * the domain and range disproof can never skip — plan only the files
  * whose bitset might contain the probe value.
  */
class BloomIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()

  private lazy val wh = java.nio.file.Files
    .createTempDirectory("graft-bloom").toString

  override def afterAll(): Unit = spark.stop()

  // ---- unit level -------------------------------------------------------

  test("builder/probe: inserted values are always found (no false negatives)") {
    val b = new BloomIndex.Builder(8192)
    val vals = (0 until 500).map(i => s"value-$i")
    vals.foreach(b.add)
    val ser = b.serialize.get
    vals.foreach(v => assert(BloomIndex.mightContain(ser, v), s"lost $v"))
  }

  test("builder: all-zero bitset serializes empty and proves emptiness") {
    val b = new BloomIndex.Builder(8192)
    assert(b.serialize.contains(""))
    assert(!BloomIndex.mightContain("", "anything"))
  }

  test("builder: a saturated bitset is dropped, not served") {
    val b = new BloomIndex.Builder(512)
    (0 until 5000).foreach(i => b.add(s"v$i"))
    assert(b.fillRatio > BloomIndex.MaxFill)
    assert(b.serialize.isEmpty)
  }

  test("disproves: filter algebra is conservative") {
    import org.apache.spark.sql.sources._
    val b = new BloomIndex.Builder(8192)
    Seq("a", "b").foreach(b.add)
    val blooms = Map("k" -> b.serialize.get)
    assert(BloomIndex.disproves(EqualTo("k", "z"), blooms))
    assert(!BloomIndex.disproves(EqualTo("k", "a"), blooms))
    assert(!BloomIndex.disproves(EqualTo("other", "z"), blooms)) // unknown col
    assert(!BloomIndex.disproves(EqualTo("k", null), blooms))
    assert(BloomIndex.disproves(EqualNullSafe("k", "z"), blooms))
    assert(BloomIndex.disproves(In("k", Array("z", "y")), blooms))
    assert(!BloomIndex.disproves(In("k", Array("z", "a")), blooms))
    // a null IN-member never matches any row (three-valued logic), so the
    // non-null members alone decide skippability
    assert(BloomIndex.disproves(In("k", Array("z", null)), blooms))
    assert(!BloomIndex.disproves(In("k", Array("a", null)), blooms))
    assert(BloomIndex.disproves(
      And(EqualTo("k", "z"), GreaterThan("k", "a")), blooms))
    assert(!BloomIndex.disproves(
      Or(EqualTo("k", "z"), GreaterThan("k", "a")), blooms))
    assert(BloomIndex.disproves(
      Or(EqualTo("k", "z"), EqualTo("k", "y")), blooms))
    assert(!BloomIndex.disproves(GreaterThan("k", "z"), blooms)) // not equality
  }

  test("registry round-trip: blooms survive serializeLine/parseLine") {
    val b = new BloomIndex.Builder(512)
    Seq("x", "y").foreach(b.add)
    val e = TableStats.Entry(2L, Map("k" -> ("x", "y")), 100L, 3L,
      sorted = false, nulls = Some(Map.empty), sums = Some(Map.empty),
      blooms = Some(Map("k" -> b.serialize.get, "empty" -> "")))
    val (rel, back) = TableStats.parseLine(TableStats.serializeLine("f.parquet", e))
    assert(rel == "f.parquet")
    assert(back == e, s"round-trip mismatch: $back")
    // pre-blooms 8-field lines still parse (blooms read back None)
    val noBloom = e.copy(blooms = None)
    val (_, back2) = TableStats.parseLine(TableStats.serializeLine("f.parquet", noBloom))
    assert(back2 == noBloom)
  }

  // ---- end to end -------------------------------------------------------

  private def setupCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.gbloom",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbloom.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbloom.t")
  }

  /** 8 single-file commits with fully OVERLAPPING k-ranges but disjoint
    * value sets: file c holds {c + 16j : j < 50} (residue c mod 8, stride
    * 16). Range disproof can never separate them; only the blooms can. */
  private def writeInterleaved(tbl: String): Unit = {
    import spark.implicits._
    for (c <- 0 until 8) {
      (0 until 50).map(j => (c + 16L * j, s"row-$c-$j")).toDF("k", "v")
        .coalesce(1).writeTo(tbl).append()
    }
  }

  test("point lookup on an unclustered column plans only the bloom-matching file") {
    setupCatalog()
    spark.sql(
      """CREATE TABLE gbloom.t.ids (k BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    writeInterleaved("gbloom.t.ids")

    val pruned0 = GraftScan.bloomPrunedFiles.get()
    val hit = spark.sql("SELECT k, v FROM gbloom.t.ids WHERE k = 16").collect()
    assert(hit.map(_.getString(1)).toSeq == Seq("row-0-1"))
    assert(GraftScan.bloomPrunedFiles.get() - pruned0 >= 7,
      "expected the 7 non-matching files bloom-pruned")

    // value in every file's [min, max] but in NO value set: all 8 pruned,
    // zero rows without opening a single file
    val pruned1 = GraftScan.bloomPrunedFiles.get()
    assert(spark.sql("SELECT * FROM gbloom.t.ids WHERE k = 8").count() == 0)
    assert(GraftScan.bloomPrunedFiles.get() - pruned1 >= 8,
      "an absent value should prune every file")

    // IN-list across two files
    val in = spark.sql(
      "SELECT k FROM gbloom.t.ids WHERE k IN (16, 17)").collect().map(_.getLong(0))
    assert(in.sorted.toSeq == Seq(16L, 17L))

    // correctness spot-check: bloom pruning never drops matching rows
    val every = spark.sql("SELECT count(*) FROM gbloom.t.ids WHERE k % 16 = 0")
      .head().getLong(0)
    assert(every == 50, s"file c=0 holds exactly the multiples of 16: got $every")
  }

  test("runtime filtering: a broadcast join's IN-list bloom-prunes files") {
    import spark.implicits._
    setupCatalog()
    spark.sql(
      """CREATE TABLE gbloom.t.fact (k BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    for (c <- 0 until 8) {
      (0 until 50).map(j => (c + 16L * j, s"row-$c-$j")).toDF("k", "v")
        .coalesce(1).writeTo("gbloom.t.fact").append()
    }
    // the scan ADVERTISES the bloom column for runtime filtering...
    import org.apache.spark.sql.sources.In
    val cat = spark.sessionState.catalogManager.catalog("gbloom")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val t = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("t"), "fact"))
    val scan = t.asInstanceOf[graft.sources.GraftTable]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
      .build().asInstanceOf[graft.sources.GraftScan]
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("k"))
    // ...and a runtime IN-list arriving mid-plan re-prunes to the one
    // file whose bloom can hold the keys (both residue 0 mod 8)
    val before = scan.toBatch.planInputPartitions().length
    assert(before == 8)
    val pruned0 = GraftScan.bloomPrunedFiles.get()
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("k", Array(16L, 32L))))
    val after = scan.toBatch.planInputPartitions().length
    assert(after == 1, s"runtime IN-list must bloom-prune: before=$before after=$after")
    assert(GraftScan.bloomPrunedFiles.get() - pruned0 >= 7)
    // a runaway runtime IN-list on a data column is advisory — skipped,
    // never probed file-by-file
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("k", Array.tabulate(5000)(i => java.lang.Long.valueOf(i.toLong)))))
    assert(scan.toBatch.planInputPartitions().length == 1,
      "an oversized runtime IN-list must be ignored (stays at the prior pruning)")

    // end-to-end: a broadcast join through the indexed column stays correct
    (Seq((16L, "a"), (32L, "b")).toDF("k", "name")).createOrReplaceTempView("dim")
    val rows = spark.sql(
      """SELECT f.k, f.v, d.name FROM gbloom.t.fact f
        |JOIN dim d ON f.k = d.k""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set((16L, "a"), (32L, "b")))
  }

  test("long strings: range-dead (>64 chars) but bloom-alive") {
    import spark.implicits._
    setupCatalog()
    spark.sql(
      """CREATE TABLE gbloom.t.docs (id BIGINT, body STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'body')""".stripMargin)
    val pad = "x" * 100
    for (c <- 0 until 4) {
      (0 until 20).map(j => (c * 100L + j, s"$pad-doc-$c-$j")).toDF("id", "body")
        .coalesce(1).writeTo("gbloom.t.docs").append()
    }
    val pruned0 = GraftScan.bloomPrunedFiles.get()
    val r = spark.sql(s"SELECT id FROM gbloom.t.docs WHERE body = '$pad-doc-2-5'")
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(205L))
    assert(GraftScan.bloomPrunedFiles.get() - pruned0 >= 3,
      "the 3 other files should be bloom-pruned despite dead ranges")
  }

  test("saturated blooms withdraw; queries stay correct without pruning") {
    import spark.implicits._
    setupCatalog()
    spark.sql(
      """CREATE TABLE gbloom.t.sat (k BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k',
        |               'index.bloom.bits' = '512')""".stripMargin)
    (0 until 2000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).writeTo("gbloom.t.sat").append()
    val pruned0 = GraftScan.bloomPrunedFiles.get()
    assert(spark.sql("SELECT v FROM gbloom.t.sat WHERE k = 1234")
      .head().getString(0) == "v1234")
    assert(GraftScan.bloomPrunedFiles.get() == pruned0,
      "a saturated bitset must not serve (it was dropped at write)")
  }

  test("point DELETE on a bloom-indexed column rewrites only the matching file") {
    import spark.implicits._
    setupCatalog()
    spark.sql(
      """CREATE TABLE gbloom.t.del (k BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    for (c <- 0 until 8) {
      (0 until 50).map(j => (c + 16L * j, s"row-$c-$j")).toDF("k", "v")
        .coalesce(1).writeTo("gbloom.t.del").append()
    }
    // the COW rewrite selects its victim FILES through the same pruned
    // scan: 7 of 8 files provably lack k=32 and are left byte-identical
    val survivors0 = spark.sql("SELECT file FROM gbloom.t.`del$files`")
      .collect().map(_.getString(0)).toSet
    spark.sql("DELETE FROM gbloom.t.del WHERE k = 32")
    val survivors1 = spark.sql("SELECT file FROM gbloom.t.`del$files`")
      .collect().map(_.getString(0)).toSet
    assert((survivors0 -- survivors1).size == 1,
      s"exactly one file should be replaced, got ${(survivors0 -- survivors1).size}")
    assert((survivors0 intersect survivors1).size == 7,
      "the 7 bloom-pruned files must remain untouched")
    assert(spark.sql("SELECT count(*) FROM gbloom.t.del WHERE k = 32")
      .head().getLong(0) == 0)
    assert(spark.sql("SELECT count(*) FROM gbloom.t.del").head().getLong(0) == 399)
    // the rewritten file carries a FRESH bloom: the lookup still prunes
    val pruned0 = GraftScan.bloomPrunedFiles.get()
    assert(spark.sql("SELECT v FROM gbloom.t.del WHERE k = 16").head()
      .getString(0) == "row-0-1")
    assert(GraftScan.bloomPrunedFiles.get() - pruned0 >= 7)
  }

  test("int→long widening keeps blooms live: old files still prune, values exact") {
    import spark.implicits._
    setupCatalog()
    // canonical decimal-integer hashing is width-independent ("123" is
    // "123" as int or long), so the bitsets written BEFORE the widening
    // must keep disproving point lookups after it — the stale-widened
    // exclusion applies only to re-canonicalizing widenings (int→double)
    spark.sql(
      """CREATE TABLE gbloom.t.widl (k INT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    for (c <- 0 until 4)
      (0 until 50).map(j => (c + 16 * j, s"row-$c-$j")).toDF("k", "v")
        .coalesce(1).writeTo("gbloom.t.widl").append()
    spark.sql("ALTER TABLE gbloom.t.widl ALTER COLUMN k TYPE BIGINT")
    // post-widening writes keep indexing (property survives, hashes agree)
    Seq((1000L, "late")).toDF("k", "v").coalesce(1).writeTo("gbloom.t.widl").append()
    val pruned0 = GraftScan.bloomPrunedFiles.get()
    assert(spark.sql("SELECT v FROM gbloom.t.widl WHERE k = 17").head()
      .getString(0) == "row-1-1")
    assert(GraftScan.bloomPrunedFiles.get() - pruned0 >= 3,
      "pre-widening bitsets must still disprove after int->long")
    val pruned1 = GraftScan.bloomPrunedFiles.get()
    assert(spark.sql("SELECT v FROM gbloom.t.widl WHERE k = 1000").head()
      .getString(0) == "late")
    assert(GraftScan.bloomPrunedFiles.get() - pruned1 >= 4,
      "post-widening bitset lookups must prune the four seed files")
  }

  test("widened columns never disprove — bloom (int→double) or range (float→double)") {
    import spark.implicits._
    setupCatalog()
    // pre-widening bloom hashed "123"; after ALTER ... TYPE DOUBLE the
    // probe arrives as 123.0 — the stale bitset must be IGNORED, not
    // wrongly skip the file holding the row
    spark.sql(
      """CREATE TABLE gbloom.t.wid (k INT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    Seq((123, "a"), (456, "b")).toDF("k", "v")
      .coalesce(1).writeTo("gbloom.t.wid").append()
    spark.sql("ALTER TABLE gbloom.t.wid ALTER COLUMN k TYPE DOUBLE")
    assert(spark.sql("SELECT v FROM gbloom.t.wid WHERE k = 123").collect()
      .map(_.getString(0)).toSeq == Seq("a"))

    // float→double: the registry range string "0.1" reparses as a
    // DIFFERENT double than the widened reader yields for 0.1f — range
    // disproof on the widened column must not skip the file
    spark.sql("CREATE TABLE gbloom.t.widf (x FLOAT, v STRING)")
    Seq((0.1f, "hit"), (7.5f, "other")).toDF("x", "v")
      .coalesce(1).writeTo("gbloom.t.widf").append()
    spark.sql("ALTER TABLE gbloom.t.widf ALTER COLUMN x TYPE DOUBLE")
    val asDouble = 0.1f.toDouble // 0.10000000149011612
    assert(spark.sql(s"SELECT v FROM gbloom.t.widf WHERE x = CAST($asDouble AS DOUBLE)")
      .collect().map(_.getString(0)).toSeq == Seq("hit"))
  }

  test("RENAME/DROP/widen keep column-list properties writable") {
    import spark.implicits._
    setupCatalog()
    // rename: the bloom (and sort) property follows the new name — the
    // table must stay writable and the index keeps working for new files
    spark.sql(
      """CREATE TABLE gbloom.t.ren (doc_id BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'doc_id',
        |               'write.sort.columns' = 'doc_id')""".stripMargin)
    Seq((1L, "a")).toDF("doc_id", "v").coalesce(1).writeTo("gbloom.t.ren").append()
    spark.sql("ALTER TABLE gbloom.t.ren RENAME COLUMN doc_id TO id")
    Seq((2L, "b")).toDF("id", "v").coalesce(1).writeTo("gbloom.t.ren").append()
    val props = spark.sql("SHOW TBLPROPERTIES gbloom.t.ren").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("index.bloom.columns").contains("id"), props.toString)
    assert(props.get("write.sort.columns").contains("id"), props.toString)
    assert(spark.sql("SELECT v FROM gbloom.t.ren WHERE id = 2").head()
      .getString(0) == "b")

    // drop: the dropped column leaves the property; writes keep working
    spark.sql(
      """CREATE TABLE gbloom.t.dropc (a BIGINT, b BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'a,b')""".stripMargin)
    Seq((1L, 10L, "x")).toDF("a", "b", "v").coalesce(1)
      .writeTo("gbloom.t.dropc").append()
    spark.sql("ALTER TABLE gbloom.t.dropc DROP COLUMN b")
    Seq((2L, "y")).toDF("a", "v").coalesce(1).writeTo("gbloom.t.dropc").append()
    val props2 = spark.sql("SHOW TBLPROPERTIES gbloom.t.dropc").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2.get("index.bloom.columns").contains("a"), props2.toString)

    // widening to a bloom-ineligible type retires the column from the
    // index automatically; writes keep working
    spark.sql(
      """CREATE TABLE gbloom.t.widp (k INT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    Seq((1, "a")).toDF("k", "v").coalesce(1).writeTo("gbloom.t.widp").append()
    spark.sql("ALTER TABLE gbloom.t.widp ALTER COLUMN k TYPE DOUBLE")
    Seq((2.5, "b")).toDF("k", "v").coalesce(1).writeTo("gbloom.t.widp").append()
    val props3 = spark.sql("SHOW TBLPROPERTIES gbloom.t.widp").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!props3.contains("index.bloom.columns"), props3.toString)

    // columns referenced by CHECK constraints or generated columns refuse
    // RENAME/DROP loudly — the stored SQL would silently stop resolving
    // and every later INSERT would fail analysis
    spark.sql(
      "CREATE TABLE gbloom.t.ck (a BIGINT, q DOUBLE, CONSTRAINT pos CHECK (q > 0))")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gbloom.t.ck RENAME COLUMN q TO qq")
    }
    assert(e3.getMessage.contains("CHECK constraint pos"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE gbloom.t.ck DROP COLUMN q")
    }
    assert(e4.getMessage.contains("CHECK constraint pos"), e4.getMessage)
    spark.sql(
      "CREATE TABLE gbloom.t.gen (a BIGINT, d BIGINT GENERATED ALWAYS AS (a * 2))")
    val e5 = intercept[Exception] {
      spark.sql("ALTER TABLE gbloom.t.gen RENAME COLUMN a TO b")
    }
    assert(e5.getMessage.contains("generated column d"), e5.getMessage)
  }

  test("index.bloom.columns is validated loudly at write") {
    import spark.implicits._
    setupCatalog()
    spark.sql(
      """CREATE TABLE gbloom.t.badcol (k BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'kk')""".stripMargin)
    val e1 = intercept[Exception] {
      Seq((1L, "a")).toDF("k", "v").coalesce(1).writeTo("gbloom.t.badcol").append()
    }
    assert(e1.getMessage.contains("unknown column kk"), e1.getMessage)
    spark.sql(
      """CREATE TABLE gbloom.t.badtype (k DOUBLE, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    val e2 = intercept[Exception] {
      Seq((1.5, "a")).toDF("k", "v").coalesce(1).writeTo("gbloom.t.badtype").append()
    }
    assert(e2.getMessage.contains("not bloom-indexable"), e2.getMessage)
  }

  test("nulls: bloom covers non-null values only and col = v skips all-null files") {
    import spark.implicits._
    setupCatalog()
    spark.sql(
      """CREATE TABLE gbloom.t.nl (k BIGINT, v STRING)
        |TBLPROPERTIES ('index.bloom.columns' = 'k')""".stripMargin)
    Seq((java.lang.Long.valueOf(1L), "a"), (java.lang.Long.valueOf(2L), "b"))
      .toDF("k", "v").coalesce(1).writeTo("gbloom.t.nl").append()
    Seq((null.asInstanceOf[java.lang.Long], "n1"),
        (null.asInstanceOf[java.lang.Long], "n2"))
      .toDF("k", "v").coalesce(1).writeTo("gbloom.t.nl").append()
    val pruned0 = GraftScan.bloomPrunedFiles.get()
    assert(spark.sql("SELECT v FROM gbloom.t.nl WHERE k = 2").head().getString(0) == "b")
    assert(GraftScan.bloomPrunedFiles.get() - pruned0 >= 1,
      "the all-null file (empty bitset) should be pruned for k = 2")
    // IS NULL never consults blooms
    assert(spark.sql("SELECT count(*) FROM gbloom.t.nl WHERE k IS NULL")
      .head().getLong(0) == 2)
  }
}
