package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.functions.RollingHash
import graft.types.{RegionSpan, RegionSpanUDT}

class ExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse",
      java.nio.file.Files.createTempDirectory("graft_wh_expr").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("rolling_hash: interpreted eval matches reference fold") {
    def ref(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      h
    }
    for (s <- Seq("", "a", "abc", "the quick brown fox", "ünïcødé"))
      assert(RollingHash.hash(s.getBytes("UTF-8")) == ref(s))
  }

  test("rolling_hash is registered as a SQL function and codegens") {
    val got = spark.sql(
      "SELECT rolling_hash('abc') AS h, rolling_hash('') AS e, rolling_hash(NULL) AS n")
      .head()
    assert(got.getLong(0) == RollingHash.hash("abc".getBytes("UTF-8")))
    assert(got.getLong(1) == 0L)
    assert(got.isNullAt(2))
    // exercise codegen over many rows (whole-stage codegen path)
    import spark.implicits._
    val n = spark.range(0, 10000)
      .selectExpr("rolling_hash(CAST(id AS STRING)) AS h")
      .as[Long].distinct().count()
    assert(n > 9000) // hashes spread out
  }

  test("RegionSpan UDT round-trips through a graft-catalog table") {
    RegionSpanUDT.register()
    val udt = new RegionSpanUDT
    val schema = StructType(Seq(
      StructField("row_key", StringType),
      StructField("info:span", udt)))
    val data = Seq(
      Row("r1", RegionSpan("a", "m")),
      Row("r2", RegionSpan("m", "")),
      Row("r3", null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)

    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.meta")
    spark.sql("DROP TABLE IF EXISTS graft.meta.spans")
    df.writeTo("graft.meta.spans").create()

    val back = spark.table("graft.meta.spans").orderBy("row_key").collect()
    assert(back.length == 3)
    assert(back(0).getAs[RegionSpan]("info:span") == RegionSpan("a", "m"))
    assert(back(1).getAs[RegionSpan]("info:span") == RegionSpan("m", ""))
    assert(back(2).isNullAt(1))
    assert(back(0).getAs[RegionSpan]("info:span").contains("cat"))
    assert(!back(0).getAs[RegionSpan]("info:span").contains("zebra"))
  }

  test("REPL process() dispatches statements and EXIT") {
    import graft.repl.SqlRepl
    assert(SqlRepl.process(spark, "SELECT 1 AS x;"))
    assert(SqlRepl.process(spark, "  "))
    assert(SqlRepl.process(spark, "SELECT syntax error here;")) // error swallowed
    assert(!SqlRepl.process(spark, "EXIT;"))
    assert(!SqlRepl.process(spark, "quit"))
  }

  test("REPL history file round-trips multi-line statements and caps size") {
    val f = java.nio.file.Files.createTempFile("graft_hist", "")
    val h = new graft.repl.SqlRepl.History(f, cap = 3)
    h.append("SELECT 1;")
    h.append("SELECT *\nFROM t\nWHERE a = 'x\\n';")
    assert(h.load() == Seq("SELECT 1;", "SELECT *\nFROM t\nWHERE a = 'x\\n';"))
    h.append("SELECT 2;"); h.append("SELECT 3;")
    assert(h.load().size == 3 && h.load().head == "SELECT *\nFROM t\nWHERE a = 'x\\n';")
  }

  test("REPL !n / !! / !prefix recall against history") {
    import graft.repl.SqlRepl.recall
    val entries = Seq("SELECT 1;", "SHOW TABLES;", "SELECT 2;")
    assert(recall(entries, "!1;") == Some("SELECT 1;"))
    assert(recall(entries, "!3") == Some("SELECT 2;"))
    assert(recall(entries, "!!") == Some("SELECT 2;"))
    assert(recall(entries, "!show") == Some("SHOW TABLES;"))
    assert(recall(entries, "!select") == Some("SELECT 2;")) // most recent match
    assert(recall(entries, "!9").isEmpty)
    assert(recall(entries, "!0").isEmpty)
    // past Int.MaxValue: "no match", never a NumberFormatException that
    // would kill the REPL loop
    assert(recall(entries, "!99999999999;").isEmpty)
    assert(recall(entries, "!nomatch").isEmpty)
    assert(recall(Seq.empty, "!!").isEmpty)
  }

  test("REPL jline line source reads lines and persists editing history") {
    // headless proof of the jline3 wiring: a dumb terminal over byte
    // streams drives the same LineReader the interactive console gets
    val in = new java.io.ByteArrayInputStream(
      "SELECT 1;\nSELECT 2;\n".getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    val terminal = new org.jline.terminal.impl.DumbTerminal(in, out)
    val hist = java.nio.file.Files.createTempFile("graft_jline_hist", "")
    val src = new graft.repl.SqlRepl.JLineSource(hist, terminal)
    assert(src.readLine("graft> ") == graft.repl.SqlRepl.Line("SELECT 1;"))
    assert(src.readLine("graft> ") == graft.repl.SqlRepl.Line("SELECT 2;"))
    assert(src.readLine("graft> ") == graft.repl.SqlRepl.Eof)
    src.close()
    val recorded = new String(java.nio.file.Files.readAllBytes(hist), "UTF-8")
    assert(recorded.contains("SELECT 1;") && recorded.contains("SELECT 2;"))
  }
}
