package graft.repl

import scala.io.StdIn

import org.apache.spark.sql.SparkSession

/** Minimal SQL console over the graft catalog — the analog of the
  * reference's jline REPL (`HBaseSQLClient.scala:31-100`): `;`-terminated
  * statements with multi-line continuation, `EXIT;` quits, everything else
  * runs through `spark.sql(...).show(30)`.
  *
  * Usage: `scripts/run.sh graft.repl.SqlRepl [warehouseDir]`
  */
object SqlRepl {

  /** Process one complete statement; returns false on EXIT. */
  def process(spark: SparkSession, statement: String): Boolean = {
    val stmt = statement.trim.stripSuffix(";").trim
    if (stmt.isEmpty) true
    else if (stmt.equalsIgnoreCase("exit") || stmt.equalsIgnoreCase("quit")) false
    else {
      try spark.sql(stmt).show(30, truncate = false)
      catch { case e: Exception => Console.err.println(s"error: ${e.getMessage}") }
      true
    }
  }

  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_warehouse")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-sql")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.defaultCatalog", "graft")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.types.RegionSpanUDT.register()

    println(s"graft SQL console (warehouse: $warehouse); statements end with ';', EXIT; quits.")
    val buf = new StringBuilder
    var continue = true
    while (continue) {
      print(if (buf.isEmpty) "graft> " else "     | ")
      Console.flush()
      val line = StdIn.readLine()
      if (line == null) continue = false
      else {
        buf.append(line).append('\n')
        if (line.trim.endsWith(";")) {
          val stmt = buf.toString
          buf.clear()
          continue = process(spark, stmt)
        }
      }
    }
    spark.stop()
  }
}
