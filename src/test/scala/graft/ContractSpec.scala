package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: names unique (a duplicate would silently
  * shadow a query in the Map), every oracle belongs to a defined query,
  * and the flagship entry is wired. */
class ContractSpec extends AnyFunSuite {

  test("query names are unique and well-formed") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("every query has an oracle (rows-only checks are opt-in, not accidental)") {
    val missing = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("maps expose all defs") {
    assert(SparkEntry.queries.size == SparkEntry.allDefs.size)
    assert(SparkEntry.oracleSql.size ==
      SparkEntry.allDefs.count(_.oracle.isDefined))
  }

  test("bench stdout line fits the harness tail window at worst-case widths") {
    // The grading harness records only the last ~2000 chars of stdout; a line
    // longer than that loses its head and fails to parse. Worst case: every
    // query present, every timing at max plausible width (999.999s).
    val names = SparkEntry.queries.keys.toSeq.sorted
    // short keys must stay unique or timings silently merge
    assert(names.map(Bench.shortKey).distinct.size == names.size)
    val setups = SparkEntry.allDefs.filter(_.setup.isDefined).map(_.name -> 999.999)
    val line = Bench.renderShortLine(names.map(_ -> 999.999), setups, Nil, "sf0.1",
      shadow = Some(99999.999), hot = Some(99999.999), hotN = Some(12),
      retimed = Some(12))
    val n = line.getBytes("UTF-8").length
    assert(n <= Bench.MaxLineBytes, s"bench line is $n bytes > ${Bench.MaxLineBytes}")
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.contains("\"shadow\":"), "shadow estimate must survive rendering")
    assert(line.contains("\"hot\":") && line.contains("\"hot_n\":") &&
      line.contains("\"retimed\":"),
      "both shadow directions + the retime count must survive rendering")
  }

  test("bench history parse: the re-time baseline round-trips renderLine") {
    // the outlier re-time reads last run's mins back from the bench's own
    // full-precision output; the parse must survive every field the writer
    // can emit (setup, failures, shadow/hot) and junk input
    val line = Bench.renderLine(
      Seq("q01_pricing_summary" -> 0.335211, "q187_dual_maintainers" -> 2.5),
      Seq("q187_dual_maintainers" -> 10.5),
      Seq("q99_broken" -> "IllegalStateException: \"queries\":{oops}"),
      "/root/testdata/sf0.1", 6,
      shadow = Some(0.0), hot = Some(1.5), hotN = Some(3), retimed = Some(2),
      retimedDetail = Seq(("q104_lsh_eval", 3.1, 0.9), ("q120_x", 2.21, 2.3)))
    // the new retimed_queries group (full-precision file only) must not
    // confuse the history parse: it contains the substring `queries":{`
    assert(line.contains("\"retimed_queries\":{\"q104_lsh_eval\":[3.1,0.9]"),
      line.takeRight(200))
    val h = Bench.parseHistory(line)
    assert(h == Map("q01_pricing_summary" -> 0.335211,
      "q187_dual_maintainers" -> 2.5),
      s"history must be the queries map alone: $h")
    assert(Bench.parseHistory("") == Map.empty[String, Double])
    assert(Bench.parseHistory("not json at all") == Map.empty[String, Double])
  }

  test("headline value stays all-inclusive when the setup map is dropped") {
    // rounds 1-7 charged fixture cost inside query time; the setup split
    // must not shrink the comparable headline. When the stdout line drops
    // the setup MAP to fit the tail window, the setup SUM must remain in
    // `value`.
    def value(line: String): Double =
      """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val qs = (1 to 200).map(i => s"q$i" -> 1.0)
    val st = (1 to 20).map(i => s"q$i" -> 2.0)
    val line = Bench.renderShortLine(qs, st, Nil, "sf0.1")
    assert(!line.contains("\"setup\""), "200 queries should force the drop")
    assert(math.abs(value(line) - 240.0) < 1.5, line.take(120))
    // the dropped map leaves ONE aggregate behind: the artifact stays
    // decomposable (value = sum of queries + setup_total)
    val stotal = """"setup_total":([0-9.]+)""".r
      .findFirstMatchIn(line).map(_.group(1).toDouble)
    assert(stotal.exists(v => math.abs(v - 40.0) < 1.0),
      s"setup_total must survive the drop: ${line.take(160)}")
    // and when the map FITS, the value is identical
    val small = Bench.renderLine(qs.take(3), st.take(2), Nil, "sf0.1", 3)
    assert(math.abs(value(small) - 7.0) < 0.01, small)
  }

  test("bench line budget survives query failures (round-5 regression)") {
    // round 5: 7 failures × ~300-char messages overflowed the tail window
    // and the artifact recorded parsed:null. The stdout line must absorb
    // MANY long failure messages and still fit.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val (failed, timed) = names.splitAt(10)
    val failures = failed.map(_ -> ("x" * 300))
    val line = Bench.renderShortLine(timed.map(_ -> 999.999),
      SparkEntry.allDefs.filter(_.setup.isDefined).map(_.name -> 999.999), failures, "sf0.1")
    val n = line.getBytes("UTF-8").length
    assert(n <= Bench.MaxLineBytes, s"bench line with 10 failures is $n bytes")
    assert(line.startsWith("""{"metric":"total"""") && line.contains("\"failures\""))
    // every failing query is still NAMED on the line even if its message
    // degraded — a failure must never vanish from the artifact
    failed.map(Bench.shortKey).foreach(k => assert(line.contains("\"" + k + "\"")))
    // worst case: EVERY query fails with a long message
    val all = Bench.renderShortLine(Nil, Nil, names.map(_ -> ("y" * 300)), "sf0.1")
    assert(all.getBytes("UTF-8").length <= Bench.MaxLineBytes,
      s"all-failures line is ${all.getBytes("UTF-8").length} bytes")
  }
}
