package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{ShallowClone, Snapshots, TableStats}

/** SHALLOW CLONE's contract: zero data movement at clone time,
  * byte-identical reads, fully diverging writes, structurally-safe
  * vacuum on BOTH sides (the source via the pin tag, the clone via
  * own-dir-only reclamation), and OPTIMIZE as the reification path. */
class CloneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  private lazy val wh = java.nio.file.Files
    .createTempDirectory("graft-clone").toString

  override def afterAll(): Unit = spark.stop()

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gcl",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.t")
  }

  private def rows(t: String): Set[(Long, String, Long)] =
    spark.sql(s"SELECT id, lang, n FROM gcl.t.$t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def parquetsUnder(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += st.getPath.toString
    }
    out.toSeq
  }

  private def manifest(t: String): Map[String, TableStats.Entry] = {
    val dd = new org.apache.hadoop.fs.Path(s"$wh/t/$t/data")
    TableStats.read(dd.getFileSystem(new org.apache.hadoop.conf.Configuration()), dd)
  }

  private def seed(t: String, n: Int = 120, parts: Int = 4): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS gcl.t.$t")
    spark.sql(
      s"""CREATE TABLE gcl.t.$t (row_key STRING, id BIGINT, lang STRING, n BIGINT)
         |PARTITIONED BY (lang)""".stripMargin)
    (0 until n).map(i => (i.toString, i.toLong, s"l${i % 3}", (i * 7 % 100).toLong))
      .toDF("row_key", "id", "lang", "n")
      .repartition(parts).writeTo(s"gcl.t.$t").append()
  }

  test("zero-copy: clone reads the snapshot byte-identically, moves no data") {
    setup(); seed("src1")
    val out = spark.sql("CREATE TABLE gcl.t.c1 SHALLOW CLONE gcl.t.src1")
      .collect().head
    assert(out.getLong(1) > 0, "files_referenced")
    // no data file landed in the clone's directory
    assert(parquetsUnder(s"$wh/t/c1/data").isEmpty, "clone must copy no data")
    // every manifest entry is an external reference
    assert(manifest("c1").keys.forall(TableStats.isExternal))
    // identical contents, partition filter included (layout parsed
    // through the ext key)
    assert(rows("c1") == rows("src1"))
    assert(spark.sql("SELECT count(*) c FROM gcl.t.c1 WHERE lang = 'l1'")
      .collect().head.getLong(0) ==
      spark.sql("SELECT count(*) c FROM gcl.t.src1 WHERE lang = 'l1'")
        .collect().head.getLong(0))
    // the pin tag exists on the source at the cloned version (name
    // carries a per-attempt unique suffix)
    val tags = spark.sql("SHOW TAGS IN gcl.t.src1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val pin = tags.keys.find(_.startsWith("clone-gcl.t.c1"))
    assert(pin.isDefined, s"pin tag missing: $tags")
    assert(tags(pin.get) == out.getLong(0))
  }

  test("writes diverge both ways; the source's files never change") {
    setup(); seed("src2")
    val before = rows("src2")
    spark.sql("CREATE TABLE gcl.t.c2 SHALLOW CLONE gcl.t.src2")
    val srcFiles = parquetsUnder(s"$wh/t/src2/data").sorted
    // mutate the CLONE: append + COW delete
    spark.sql("INSERT INTO gcl.t.c2 VALUES ('x1', 9001, 'l1', 5)")
    spark.sql("DELETE FROM gcl.t.c2 WHERE id % 4 = 0 AND id < 9000")
    val expect = before.filterNot(r => r._1 % 4 == 0) + ((9001L, "l1", 5L))
    assert(rows("c2") == expect)
    // source untouched: same rows, same physical files on disk
    assert(rows("src2") == before)
    assert(parquetsUnder(s"$wh/t/src2/data").sorted == srcFiles)
    // mutate the SOURCE: clone must not see it
    spark.sql("INSERT INTO gcl.t.src2 VALUES ('y1', 9002, 'l2', 6)")
    spark.sql("DELETE FROM gcl.t.src2 WHERE id = 1")
    assert(rows("c2") == expect, "clone isolated from source mutations")
  }

  test("vacuum on the source cannot reclaim pinned files; DROP clone releases") {
    setup(); seed("src3")
    spark.sql("CREATE TABLE gcl.t.c3 SHALLOW CLONE gcl.t.src3")
    val cloneRows = rows("c3")
    // rewrite the whole source (every original file leaves its live
    // manifest), then vacuum hard
    spark.sql("DELETE FROM gcl.t.src3 WHERE id % 2 = 0")
    spark.sql("DELETE FROM gcl.t.src3 WHERE id % 2 = 1")
    val (del1, _) = Snapshots.vacuum(s"$wh/t/src3", retain = 1, minAgeMillis = 0)
    // the cloned snapshot is tagged: its files survive and the clone
    // still reads completely
    assert(rows("c3") == cloneRows, "clone must survive source vacuum")
    // DROP the clone → pin released → the same vacuum now reclaims
    spark.sql("DROP TABLE gcl.t.c3")
    val tagsAfter = spark.sql("SHOW TAGS IN gcl.t.src3").collect()
    assert(!tagsAfter.exists(_.getString(0) == "clone-gcl.t.c3"))
    val (del2, _) = Snapshots.vacuum(s"$wh/t/src3", retain = 1, minAgeMillis = 0)
    assert(del2 > 0, s"post-drop vacuum must reclaim the unpinned files " +
      s"(first pass deleted $del1)")
  }

  test("vacuum on the clone never touches the source's files") {
    setup(); seed("src4")
    spark.sql("CREATE TABLE gcl.t.c4 SHALLOW CLONE gcl.t.src4")
    val srcFiles = parquetsUnder(s"$wh/t/src4/data").sorted
    // COW-rewrite the clone so every ext reference leaves its live
    // manifest, then vacuum the clone to nothing
    spark.sql("DELETE FROM gcl.t.c4 WHERE id >= 0")
    Snapshots.vacuum(s"$wh/t/c4", retain = 0, minAgeMillis = 0)
    assert(parquetsUnder(s"$wh/t/src4/data").sorted == srcFiles,
      "external files are structurally unreclaimable by the clone")
    assert(rows("src4").nonEmpty)
  }

  test("OPTIMIZE reifies: ext references drop, contents and source unchanged") {
    setup(); seed("src5")
    spark.sql("CREATE TABLE gcl.t.c5 SHALLOW CLONE gcl.t.src5")
    val before = rows("c5")
    val srcFiles = parquetsUnder(s"$wh/t/src5/data").sorted
    spark.sql("OPTIMIZE gcl.t.c5")
    assert(manifest("c5").keys.forall(k => !TableStats.isExternal(k)),
      "OPTIMIZE must reify every external reference")
    assert(parquetsUnder(s"$wh/t/c5/data").nonEmpty)
    assert(rows("c5") == before)
    assert(parquetsUnder(s"$wh/t/src5/data").sorted == srcFiles)
    // a reified clone is cloneable again
    spark.sql("CREATE TABLE gcl.t.c5b SHALLOW CLONE gcl.t.c5")
    assert(rows("c5b") == before)
  }

  test("clone of an unreified clone: transitive pins survive drops and vacuum") {
    setup(); seed("src6")
    spark.sql("CREATE TABLE gcl.t.c6 SHALLOW CLONE gcl.t.src6")
    // the intermediate clone diverges before being cloned itself
    spark.sql("INSERT INTO gcl.t.c6 VALUES ('x1', 9001, 'l0', 5)")
    spark.sql("CREATE TABLE gcl.t.c6b SHALLOW CLONE gcl.t.c6")
    val want = spark.sql("SELECT id, lang, n FROM gcl.t.c6").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(spark.sql("SELECT id, lang, n FROM gcl.t.c6b").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == want)
    // the chained clone pins BOTH upstreams: c6 directly, src6 transitively
    // (src6 carries c6's pin AND c6b's)
    assert(spark.sql("SHOW TAGS IN gcl.t.c6").collect().map(_.getString(0))
      .count(_.startsWith("clone-")) == 1)
    assert(clonePins("src6").size == 2,
      "chained clone must re-pin the grandparent under its own tag")
    // mutations at every level stay isolated
    spark.sql("DELETE FROM gcl.t.c6b WHERE id < 30")
    spark.sql("INSERT INTO gcl.t.src6 VALUES ('y1', 9002, 'l1', 6)")
    val wantB = want.filter(_._1 >= 30)
    assert(spark.sql("SELECT id, lang, n FROM gcl.t.c6b").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == wantB)
    // dropping the INTERMEDIATE clone refuses while the chained clone pins it
    val e = intercept[Exception](spark.sql("DROP TABLE gcl.t.c6"))
    assert(e.getMessage.contains("live shallow clones"), e.getMessage)
    // vacuum hammering on both upstreams reclaims nothing the chain needs
    Snapshots.vacuum(s"$wh/t/src6", retain = 0, minAgeMillis = 0)
    Snapshots.vacuum(s"$wh/t/c6", retain = 0, minAgeMillis = 0)
    assert(spark.sql("SELECT id, lang, n FROM gcl.t.c6b").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == wantB)
    // dropping the chained clone releases its pins on BOTH upstreams
    spark.sql("DROP TABLE gcl.t.c6b")
    assert(clonePins("src6").size == 1, "only c6's own pin may remain")
    spark.sql("DROP TABLE gcl.t.c6")
    assert(clonePins("src6").isEmpty)
    spark.sql("DROP TABLE gcl.t.src6")
  }

  test("OPTIMIZE a chained clone releases every transitive pin") {
    setup(); seed("srcH", n = 24, parts = 2)
    spark.sql("CREATE TABLE gcl.t.cH SHALLOW CLONE gcl.t.srcH")
    spark.sql("CREATE TABLE gcl.t.cH2 SHALLOW CLONE gcl.t.cH")
    assert(clonePins("srcH").size == 2)
    val before = rows("cH2")
    spark.sql("OPTIMIZE gcl.t.cH2")
    assert(clonePins("srcH").size == 1,
      "reifying the chained clone must release its transitive pin")
    assert(spark.sql("SHOW TAGS IN gcl.t.cH").collect().map(_.getString(0))
      .count(_.startsWith("clone-")) == 0)
    assert(rows("cH2") == before)
    // the chain unwinds: drop cH (releases srcH), then srcH; cH2 survives
    spark.sql("DROP TABLE gcl.t.cH")
    spark.sql("DROP TABLE gcl.t.srcH")
    assert(rows("cH2") == before)
  }

  test("merge-on-read: cloned delete entries apply; new MOR deletes hit cloned files") {
    setup()
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gcl.t.src7")
    spark.sql(
      s"""CREATE TABLE gcl.t.src7 (row_key STRING, id BIGINT, lang STRING, n BIGINT)
         |TBLPROPERTIES ('write.mutation.mode' = 'merge-on-read')""".stripMargin)
    (0 until 90).map(i => (i.toString, i.toLong, s"l${i % 3}", i.toLong))
      .toDF("row_key", "id", "lang", "n")
      .repartition(3).writeTo("gcl.t.src7").append()
    // outstanding MOR delete in the SOURCE before the clone
    spark.sql("DELETE FROM gcl.t.src7 WHERE id < 10")
    spark.sql("CREATE TABLE gcl.t.c7 SHALLOW CLONE gcl.t.src7")
    assert(rows("c7") == rows("src7"))
    assert(rows("c7").size == 80)
    // a NEW MOR delete in the CLONE must apply to the cloned data files
    // (the clone's version floor keeps cloned seqs below its commits)
    spark.sql("DELETE FROM gcl.t.c7 WHERE id >= 80")
    assert(rows("c7").map(_._1) == (10L until 80L).toSet)
    assert(rows("src7").size == 80, "source MOR state isolated")
  }

  test("VERSION AS OF: clone an older snapshot; time travel inside the clone") {
    setup(); seed("src8", n = 30, parts = 1)
    val v1 = spark.sql("DESCRIBE HISTORY gcl.t.src8").collect()
      .map(_.getLong(0)).max
    spark.sql("INSERT INTO gcl.t.src8 VALUES ('z', 999, 'l0', 1)")
    spark.sql(s"CREATE TABLE gcl.t.c8 SHALLOW CLONE gcl.t.src8 VERSION AS OF $v1")
    assert(rows("c8").size == 30, "clone pinned the pre-insert snapshot")
    assert(!rows("c8").exists(_._1 == 999L))
    // the clone's own history starts at the cloned version
    spark.sql("INSERT INTO gcl.t.c8 VALUES ('w', 1000, 'l0', 2)")
    val hist = spark.sql("DESCRIBE HISTORY gcl.t.c8").collect().map(_.getLong(0))
    assert(hist.min == v1 && hist.max == v1 + 1, hist.toSeq.toString)
    assert(spark.sql(s"SELECT count(*) c FROM gcl.t.c8 VERSION AS OF $v1")
      .collect().head.getLong(0) == 30)
  }

  test("dynamic INSERT OVERWRITE replaces a cloned partition's ext files") {
    setup(); seed("src9")
    spark.sql("CREATE TABLE gcl.t.c9 SHALLOW CLONE gcl.t.src9")
    val keepOther = rows("c9").filter(_._2 != "l1")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      spark.sql("INSERT OVERWRITE gcl.t.c9 VALUES ('p', 5000, 'l1', 9)")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(rows("c9") == keepOther + ((5000L, "l1", 9L)))
    assert(rows("src9").count(_._2 == "l1") > 0, "source partition intact")
  }

  test("DROP/RENAME of a pinned source refused; released when the clone drops") {
    setup(); seed("srcB", n = 12, parts = 1)
    spark.sql("CREATE TABLE gcl.t.cB SHALLOW CLONE gcl.t.srcB")
    val e1 = intercept[Exception](spark.sql("DROP TABLE gcl.t.srcB"))
    assert(e1.getMessage.contains("live shallow clones"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gcl.t.srcB RENAME TO gcl.t.srcB2"))
    assert(e2.getMessage.contains("shallow clones"), e2.getMessage)
    assert(rows("cB").size == 12, "clone intact after refused drop/rename")
    spark.sql("DROP TABLE gcl.t.cB") // releases the pin ...
    spark.sql("DROP TABLE gcl.t.srcB") // ... now the source can go
    assert(!spark.catalog.tableExists("gcl.t.srcB"))
  }

  private def clonePins(src: String): Seq[String] =
    spark.sql(s"SHOW TAGS IN gcl.t.$src").collect()
      .map(_.getString(0)).filter(_.startsWith("clone-")).toSeq

  test("OPTIMIZE releases the source pin once the clone is reified") {
    setup(); seed("srcC", n = 24, parts = 2)
    spark.sql("CREATE TABLE gcl.t.cC SHALLOW CLONE gcl.t.srcC")
    assert(clonePins("srcC").nonEmpty)
    val before = rows("cC")
    spark.sql("OPTIMIZE gcl.t.cC")
    // pin gone, clone props cleared — the refusal message's promise holds
    assert(clonePins("srcC").isEmpty,
      "reification must drop the clone's pin tag on the source")
    val props = spark.sql("SHOW TBLPROPERTIES gcl.t.cC").collect()
      .map(_.getString(0)).toSet
    assert(!props.contains(ShallowClone.PinTagProp) &&
      !props.contains(ShallowClone.SourceDirProp), props.toString)
    // the source is now droppable, and the reified clone survives it
    spark.sql("DROP TABLE gcl.t.srcC")
    assert(rows("cC") == before)
  }

  test("CREATE OR REPLACE of a pinned source is refused at commit time") {
    setup(); seed("srcD", n = 12, parts = 1)
    spark.sql("CREATE TABLE gcl.t.cD SHALLOW CLONE gcl.t.srcD")
    val e = intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE gcl.t.srcD AS SELECT 'x' AS row_key, 1L AS id"))
    assert(e.getMessage.contains("live shallow clones") ||
      Option(e.getCause).exists(_.getMessage.contains("live shallow clones")),
      e.getMessage)
    assert(rows("cD").size == 12, "clone intact after refused replace")
    assert(rows("srcD").size == 12, "refused replace left the source intact")
    spark.sql("DROP TABLE gcl.t.cD")
    spark.sql(
      "CREATE OR REPLACE TABLE gcl.t.srcD AS SELECT 'x' AS row_key, 1L AS id")
    assert(spark.sql("SELECT * FROM gcl.t.srcD").count() == 1)
  }

  test("REPLACE TABLE on a clone releases its outgoing pin, like DROP") {
    setup(); seed("srcE", n = 12, parts = 1)
    spark.sql("CREATE TABLE gcl.t.cE SHALLOW CLONE gcl.t.srcE")
    assert(clonePins("srcE").nonEmpty)
    spark.sql(
      "CREATE OR REPLACE TABLE gcl.t.cE AS SELECT 'y' AS row_key, 2L AS id")
    assert(clonePins("srcE").isEmpty,
      "replacing the clone destroys it — its pin must release")
    spark.sql("DROP TABLE gcl.t.srcE") // no longer pinned
  }

  test("DROP NAMESPACE CASCADE: inside clones resolve in passes, outside pins refuse") {
    setup()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.nsc")
    import spark.implicits._
    // source + its clone both INSIDE the dropped namespace, plus a clone
    // inside pinning a source OUTSIDE — cascade must drop all three
    // inside tables and release the outside pin
    Seq(("a", 1L)).toDF("row_key", "id").writeTo("gcl.nsc.s1").create()
    spark.sql("CREATE TABLE gcl.nsc.c1 SHALLOW CLONE gcl.nsc.s1")
    seed("srcF", n = 12, parts = 1)
    spark.sql("CREATE TABLE gcl.nsc.cF SHALLOW CLONE gcl.t.srcF")
    assert(clonePins("srcF").nonEmpty)
    spark.sql("DROP NAMESPACE gcl.nsc CASCADE")
    assert(clonePins("srcF").isEmpty,
      "cascade must release pins its clones held on outside sources")
    spark.sql("DROP TABLE gcl.t.srcF")
    // a clone OUTSIDE the namespace pinning a table INSIDE → refuse,
    // and the refusal is a NO-OP: the precheck runs before any drop, so
    // even UNPINNED siblings inside the namespace survive
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.nsd")
    Seq(("b", 2L)).toDF("row_key", "id").writeTo("gcl.nsd.s2").create()
    Seq(("c", 3L)).toDF("row_key", "id").writeTo("gcl.nsd.s3").create()
    spark.sql("DROP TABLE IF EXISTS gcl.t.cOut")
    spark.sql("CREATE TABLE gcl.t.cOut SHALLOW CLONE gcl.nsd.s2")
    val e = intercept[Exception](spark.sql("DROP NAMESPACE gcl.nsd CASCADE"))
    assert(e.getMessage.contains("shallow clones outside"), e.getMessage)
    assert(spark.sql("SELECT * FROM gcl.nsd.s2").count() == 1,
      "refused cascade left the pinned table intact")
    assert(spark.sql("SELECT * FROM gcl.nsd.s3").count() == 1,
      "refused cascade must be a NO-OP — unpinned siblings survive too")
    spark.sql("DROP TABLE gcl.t.cOut")
    spark.sql("DROP NAMESPACE gcl.nsd CASCADE")
  }

  test("pin guard fails CLOSED: unreadable _tags.tsv blocks DROP instead of allowing it") {
    setup(); seed("srcG", n = 6, parts = 1)
    val tagsFile = new org.apache.hadoop.fs.Path(s"$wh/t/srcG/_tags.tsv")
    val fs = tagsFile.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(tagsFile, true)
    try out.write("corrupt-line-without-a-tab\n".getBytes("UTF-8"))
    finally out.close()
    intercept[Exception](spark.sql("DROP TABLE gcl.t.srcG"))
    assert(spark.catalog.tableExists("gcl.t.srcG"),
      "a failed pin read must refuse the drop, not allow it")
    fs.delete(tagsFile, false)
    spark.sql("DROP TABLE gcl.t.srcG")
  }

  test("cloning a WAP audit snapshot is refused (DISCARD would dangle the clone)") {
    setup(); seed("srcW", n = 12, parts = 1)
    import spark.implicits._
    Seq(("w1", 7777L, "l0", 1L)).toDF("row_key", "id", "lang", "n")
      .writeTo("gcl.t.srcW").option("wap.id", "aud").append()
    val e = intercept[Exception](
      spark.sql("CREATE TABLE gcl.t.cW SHALLOW CLONE gcl.t.srcW VERSION AS OF 'wap-aud'"))
    assert(e.getMessage.contains("AUDIT"), e.getMessage)
    assert(!spark.catalog.tableExists("gcl.t.cW"))
    // the failed attempt's pin tag was rolled back too
    val pins = spark.sql("SHOW TAGS IN gcl.t.srcW").collect()
      .map(_.getString(0)).filter(_.startsWith("clone-"))
    assert(pins.isEmpty, pins.toSeq.toString)
  }

  test("streaming the file-based source of an unreified clone is refused loudly") {
    setup(); seed("srcA", n = 12, parts = 1)
    spark.sql("CREATE TABLE gcl.t.cA SHALLOW CLONE gcl.t.srcA")
    val ckpt = java.nio.file.Files.createTempDirectory("clone-stream").toString
    val e = intercept[Exception] {
      spark.readStream.table("gcl.t.cA").writeStream
        .format("noop").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(30000)
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("shallow clone") || msg.contains("OPTIMIZE"), msg)
  }
}
