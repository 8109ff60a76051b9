package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and emits ONE bare JSON line on stdout (and a copy in
  * `BENCH_LAST.json`) of the form
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Measurement notes:
  *  - Each query runs twice and the MIN is reported. Single-shot timing on a
  *    shared machine showed ~2x contended outliers (round-1 bench recorded
  *    112.8s vs a clean 55.8s re-run); min-of-2 suppresses transient noise
  *    while still charging real per-query cost.
  *  - Failures are NOT swallowed: a failing query is reported in a
  *    `"failures"` map, the process exits nonzero, and its time is excluded
  *    from the total (a broken query must not bench as "fast").
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.types.RegionSpanUDT.register()
    // JVM/codegen warmup so the first timed query isn't charged for it
    spark.range(0, 1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(300)) }
      }
      (once(), once()) match {
        case (Right(a), Right(b)) => timings(name) = math.min(a, b)
        case (r1, r2) =>
          failures(name) = r1.left.toOption.orElse(r2.left.toOption).getOrElse("unknown")
          System.err.println(s"BENCH FAILURE $name: ${failures(name)}")
      }
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = timings.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val total = timings.values.sum
    val failJson =
      if (failures.isEmpty) ""
      else ",\"failures\":" + failures.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$failJson,"sf":${jstr(sfDir)}}"""
    println(line)
    // Backup copy for graders whose stdout capture is log-prefixed.
    try {
      val p = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json"))
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"bench file write failed: $e") }
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
