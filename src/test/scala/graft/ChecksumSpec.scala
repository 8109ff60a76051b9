package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `CHECKSUM TABLE`'s contract: the digest is a function of LOGICAL
  * content only — invariant under file count, row order, partitioning
  * and mutation mode — and any single-value difference changes it. */
class ChecksumSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  private lazy val wh = java.nio.file.Files
    .createTempDirectory("graft-checksum").toString

  override def afterAll(): Unit = spark.stop()

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gcks",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcks.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcks.t")
  }

  private def cks(t: String): (Long, java.math.BigDecimal) = {
    val r = spark.sql(s"CHECKSUM TABLE gcks.t.$t").collect().head
    (r.getLong(0), r.getDecimal(1))
  }

  test("layout-invariant: one file vs many, shuffled row order, partitioned") {
    setup()
    import spark.implicits._
    val df = (0 until 300)
      .map(i => (i.toString, i.toLong, s"lang${i % 3}", (i * 7 % 100).toLong))
      .toDF("row_key", "id", "lang", "n")
    spark.sql("CREATE TABLE gcks.t.one (row_key STRING, id BIGINT, lang STRING, n BIGINT)")
    spark.sql(
      """CREATE TABLE gcks.t.many (row_key STRING, id BIGINT, lang STRING, n BIGINT)
        |PARTITIONED BY (lang)""".stripMargin)
    df.coalesce(1).writeTo("gcks.t.one").append()
    // reversed order, 6 shuffled files, partitioned directories
    df.orderBy(desc("id")).repartition(6).writeTo("gcks.t.many").append()
    assert(cks("one") == cks("many"))
    assert(cks("one")._1 == 300L)
  }

  test("mutation-mode-invariant: COW delete ≡ MOR delete of the same slice") {
    setup()
    spark.sql(
      s"""CREATE TABLE gcks.t.mor
         |TBLPROPERTIES ('${graft.sources.GraftDeletes.ModeProp}' = 'merge-on-read')
         |AS SELECT * FROM gcks.t.one""".stripMargin)
    spark.sql("DELETE FROM gcks.t.one WHERE id % 5 = 2")
    spark.sql("DELETE FROM gcks.t.mor WHERE id % 5 = 2")
    assert(cks("one") == cks("mor"))
    assert(cks("one")._1 == 240L)
  }

  test("sensitive: one value off in one row changes the digest") {
    setup()
    spark.sql(
      """CREATE TABLE gcks.t.tam AS
        |SELECT row_key, id, lang,
        |       n + CASE WHEN id = 41 THEN 1 ELSE 0 END AS n
        |FROM gcks.t.one""".stripMargin)
    val (n0, c0) = cks("one")
    val (n1, c1) = cks("tam")
    assert(n0 == n1 && c0.compareTo(c1) != 0,
      "a tampered value must change the checksum")
  }

  test("empty table: zero rows, zero digest") {
    setup()
    spark.sql("CREATE TABLE gcks.t.empty (a BIGINT, b STRING)")
    val (n, c) = cks("empty")
    assert(n == 0L && c.compareTo(java.math.BigDecimal.ZERO) == 0)
  }

  test("GROUP BY: digests localize a difference to exactly the diverged group") {
    setup()
    def grouped(t: String): Map[String, (Long, java.math.BigDecimal)] =
      spark.sql(s"CHECKSUM TABLE gcks.t.$t GROUP BY lang").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    // gone (depends on earlier tests' mutations): rebuild two fresh copies
    spark.sql("DROP TABLE IF EXISTS gcks.t.ga")
    spark.sql("DROP TABLE IF EXISTS gcks.t.gb")
    import spark.implicits._
    val df = (0 until 200)
      .map(i => (i.toString, i.toLong, s"lang${i % 4}", i.toLong * 3))
      .toDF("row_key", "id", "lang", "n")
    spark.sql("CREATE TABLE gcks.t.ga (row_key STRING, id BIGINT, lang STRING, n BIGINT)")
    spark.sql(
      """CREATE TABLE gcks.t.gb (row_key STRING, id BIGINT, lang STRING, n BIGINT)
        |PARTITIONED BY (lang)""".stripMargin)
    df.coalesce(1).writeTo("gcks.t.ga").append()
    df.orderBy(desc("id")).repartition(5).writeTo("gcks.t.gb").append()
    // identical content in different layouts: every group digest equal,
    // and the group sums reconstruct the whole-table digest
    val (ga, gb) = (grouped("ga"), grouped("gb"))
    assert(ga == gb)
    assert(ga.keySet == Set("lang0", "lang1", "lang2", "lang3"))
    assert(ga.values.map(_._2).reduce(_ add _).compareTo(cks("ga")._2) == 0,
      "group digests must sum to the table digest")
    // corrupt ONE group: only that group's digest moves
    spark.sql("UPDATE gcks.t.gb SET n = n + 1 WHERE id = 42") // lang2
    val gb2 = grouped("gb")
    assert(gb2("lang2")._2.compareTo(ga("lang2")._2) != 0)
    assert((ga.keySet - "lang2").forall(l => gb2(l) == ga(l)),
      "untouched groups must keep their digests")
    // a row MOVING between groups changes both groups' digests
    spark.sql("DROP TABLE IF EXISTS gcks.t.gc")
    spark.sql(
      """CREATE TABLE gcks.t.gc AS
        |SELECT row_key, id, CASE WHEN id = 7 THEN 'lang0' ELSE lang END AS lang, n
        |FROM gcks.t.ga""".stripMargin)
    val gc = grouped("gc") // id 7 moved lang3 -> lang0
    assert(gc("lang0")._2.compareTo(ga("lang0")._2) != 0)
    assert(gc("lang3")._2.compareTo(ga("lang3")._2) != 0)
    assert(gc("lang1") == ga("lang1") && gc("lang2") == ga("lang2"))
  }
}
