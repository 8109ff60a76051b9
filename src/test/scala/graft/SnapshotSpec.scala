package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.{Snapshots, TableStats}

/** Snapshot history: every commit records a manifest, time travel pins a
  * scan to one, mutations never physically delete data files, and vacuum
  * is the only reclaim path (SURVEY.md — table-format behavior the
  * reference's Spark layer has no analog of).
  */
class SnapshotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_snap_wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse", warehouse)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fsOf(p: Path) = p.getFileSystem(new Configuration())
  private def dataDir(tbl: String) = new Path(s"$warehouse/snap/$tbl/data")
  private def versions(tbl: String): Seq[Long] =
    Snapshots.list(fsOf(dataDir(tbl)), dataDir(tbl)).map(_._1)
  private def parquetCount(tbl: String): Int = {
    val d = dataDir(tbl)
    val fs = fsOf(d)
    val it = fs.listFiles(d, true)
    var n = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  test("every commit records a snapshot; VERSION AS OF replays it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.snap")
    spark.sql("CREATE TABLE graft.snap.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.snap.t VALUES (1, 'a'), (2, 'b')")
    val v1 = versions("t").last
    spark.sql("INSERT INTO graft.snap.t VALUES (3, 'c')")
    spark.sql("DELETE FROM graft.snap.t WHERE k = 1") // row-level COW
    val vs = versions("t")
    assert(vs.size >= 3 && vs == vs.sorted)

    assert(spark.sql("SELECT * FROM graft.snap.t").count() == 2)
    val pinned = spark.sql(s"SELECT k FROM graft.snap.t VERSION AS OF $v1")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(pinned == Seq(1L, 2L), "pinned read must predate both mutations")
    // COUNT(*) pushdown answers from the pinned manifest too
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.snap.t VERSION AS OF $v1")
      .collect().head.getLong(0) == 2L)
  }

  test("TIMESTAMP AS OF resolves to the latest snapshot at or before it") {
    val d = dataDir("t")
    val fs = fsOf(d)
    val all = Snapshots.list(fs, d)
    val (v1, ts1) = all.head
    // a timestamp right at the first commit sees only that commit
    val got = spark.sql(
      s"SELECT COUNT(*) FROM graft.snap.t TIMESTAMP AS OF " +
        s"CAST('${new java.sql.Timestamp(ts1)}' AS TIMESTAMP)")
      .collect().head.getLong(0)
    assert(got == Snapshots.read(fs, d, v1).get.valuesIterator.map(_.rows).sum)
  }

  test("time-travel relations are read-only") {
    val v = versions("t").head
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.snap.t VERSION AS OF $v VALUES (9, 'x')")
    }
    // parser or table guard — either way the write must not land
    assert(spark.sql("SELECT COUNT(*) FROM graft.snap.t WHERE k = 9")
      .collect().head.getLong(0) == 0L)
    val e2 = intercept[UnsupportedOperationException] {
      spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[graft.sources.GraftCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("snap"), "t"), v.toString)
        .asInstanceOf[graft.sources.GraftTable]
        .deleteWhere(Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.AlwaysTrue))
    }
    assert(e2.getMessage.contains("read-only"))
  }

  test("mutations defer physical deletes; vacuum reclaims unreferenced files") {
    spark.sql("CREATE TABLE graft.snap.vac (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.snap.vac VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.snap.vac VALUES (3, 'c')")
    val before = parquetCount("vac")
    spark.sql("DELETE FROM graft.snap.vac WHERE k <= 2") // COW rewrite
    // replaced files still on disk (reachable via earlier snapshots)...
    assert(parquetCount("vac") >= before)
    // ...but invisible to the live scan
    assert(spark.sql("SELECT * FROM graft.snap.vac").count() == 1)

    val tblDir = s"$warehouse/snap/vac"
    // age guard: nothing young enough gets deleted
    val (d0, _) = Snapshots.vacuum(tblDir, retain = 1, minAgeMillis = 3600000L)
    assert(d0 == 0)
    val (deleted, droppedSnaps) = Snapshots.vacuum(tblDir, retain = 1, minAgeMillis = 0L)
    val d = dataDir("vac")
    val dbgLive = TableStats.read(fsOf(d), d).keySet
    val dbgVers = Snapshots.list(fsOf(d), d)
    val dbgFiles = {
      val it = fsOf(d).listFiles(d, true)
      val b = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) { val p = it.next().getPath; if (p.getName.endsWith(".parquet")) b += TableStats.relOf(p.toString) }
      b.toSeq
    }
    assert(deleted > 0,
      s"vacuum must physically delete unreferenced files; live=$dbgLive vers=$dbgVers files=$dbgFiles")
    assert(droppedSnaps > 0)
    // live table unharmed; expired version now unreadable
    assert(spark.sql("SELECT k FROM graft.snap.vac").collect().map(_.getLong(0)).toSeq == Seq(3L))
    val gone = versions("vac") // only retained versions remain
    assert(gone.size == 1)
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft.snap.vac VERSION AS OF 1").collect()
    }
    assert(err.getMessage.contains("snapshot"))
  }

  test("VACUUM ... OLDER THAN expires by commit time; live chain survives") {
    spark.sql("CREATE TABLE graft.snap.vot (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.snap.vot VALUES (1, 'a')")
    spark.sql("INSERT INTO graft.snap.vot VALUES (2, 'b')")
    spark.sql("DELETE FROM graft.snap.vot WHERE k = 1") // COW: orphans a file
    val d = dataDir("vot")
    val fs = fsOf(d)
    val nVersions = Snapshots.list(fs, d).size

    // cutoff before every commit: nothing expires
    val r0 = spark.sql("VACUUM graft.snap.vot OLDER THAN '2000-01-01'").collect()(0)
    assert(r0.getInt(0) == 0 && r0.getInt(1) == 0)
    assert(Snapshots.list(fs, d).size == nVersions)

    // a cutoff at/after now must NOT zero the in-flight-write age guard:
    // through SQL (default 1 h floor) the fresh files and manifests all
    // survive — a concurrent writer's just-landed part files are exactly
    // this young
    val r1 = spark.sql("VACUUM graft.snap.vot OLDER THAN '2100-01-01'").collect()(0)
    assert(r1.getInt(0) == 0 && r1.getInt(1) == 0,
      s"the age-guard floor must protect fresh files from a future cutoff: $r1")

    // with the guard explicitly lifted (test-only), the same cutoff
    // expires all history; the live registry and its chain survive
    val (files, snaps) = Snapshots.vacuumOlderThan(
      s"$warehouse/snap/vot",
      cutoffMillis = System.currentTimeMillis() + 3600000L, minAgeMillis = 0L)
    assert(snaps > 0, "lifted guard: expired snapshots must drop")
    assert(files > 0, "lifted guard: the COW-replaced file must be reclaimed")
    assert(spark.sql("SELECT k FROM graft.snap.vot").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("incremental append scan reads only files added in (since, end]") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.snap")
    spark.sql("CREATE TABLE graft.snap.inc (k BIGINT)")
    spark.sql("INSERT INTO graft.snap.inc SELECT id FROM range(0, 10)")
    val v1 = versions("inc").last
    spark.sql("INSERT INTO graft.snap.inc SELECT id FROM range(10, 15)")
    val v2 = versions("inc").last
    spark.sql("INSERT INTO graft.snap.inc SELECT id FROM range(15, 25)")

    // (v1, v2]: exactly the second append
    val mid = spark.read.option("since-version", v1).option("snapshot-version", v2)
      .table("graft.snap.inc").collect().map(_.getLong(0)).sorted.toSeq
    assert(mid == (10L until 15L).toSeq)
    // (v1, live]: everything after the first append
    val tail = spark.read.option("since-version", v1)
      .table("graft.snap.inc").collect().map(_.getLong(0)).sorted.toSeq
    assert(tail == (10L until 25L).toSeq)
    // since-version 0 = from table creation = the full table
    assert(spark.read.option("since-version", 0L).table("graft.snap.inc")
      .count() == 25)
    // registry-first COUNT(*) respects the incremental window too
    assert(spark.read.option("since-version", v1).option("snapshot-version", v2)
      .table("graft.snap.inc").count() == 5)
    // (v2, v2] is empty
    assert(spark.read.option("since-version", v2).option("snapshot-version", v2)
      .table("graft.snap.inc").count() == 0)

    // a COW delete inside the range makes it non-append: incremental
    // reads over it must throw (rewritten files would surface old rows
    // as new), while ranges strictly after the rewrite still work
    spark.sql("DELETE FROM graft.snap.inc WHERE k = 3")
    val vDel = versions("inc").last
    val e = intercept[Exception] {
      spark.read.option("since-version", v1).table("graft.snap.inc").collect()
    }
    assert(e.getMessage.contains("non-append"), e.getMessage)
    spark.sql("INSERT INTO graft.snap.inc SELECT id FROM range(25, 28)")
    val post = spark.read.option("since-version", vDel)
      .table("graft.snap.inc").collect().map(_.getLong(0)).sorted.toSeq
    assert(post == (25L until 28L).toSeq)
    spark.sql("DROP TABLE graft.snap.inc")
  }

  test("incremental append scan skips WAP audit snapshots") {
    // a staged (and even a later-discarded) WAP commit sits on the
    // version chain but is a side branch: the incremental walk must not
    // take its manifest as a step (the staged superset would read as a
    // removal at the next live version and spuriously refuse the range)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.snap")
    spark.sql("CREATE TABLE graft.snap.winc (k BIGINT)")
    spark.sql("INSERT INTO graft.snap.winc SELECT id FROM range(0, 5)")
    val v1 = versions("winc").last
    import spark.implicits._
    spark.range(100, 103).select($"id".as("k"))
      .writeTo("graft.snap.winc").option("wap.id", "w").append()
    spark.sql("INSERT INTO graft.snap.winc SELECT id FROM range(5, 8)")
    // (v1, live]: the live append only — never the staged rows
    val inc = spark.read.option("since-version", v1)
      .table("graft.snap.winc").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc == (5L until 8L).toSeq, s"incremental across a stage: $inc")
    // after a DISCARD the same range still reads cleanly
    spark.sql("ALTER TABLE graft.snap.winc DISCARD WAP 'w'")
    val inc2 = spark.read.option("since-version", v1)
      .table("graft.snap.winc").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc2 == (5L until 8L).toSeq, s"incremental across a discard: $inc2")
    // publish path: a fresh stage's rows surface once published
    spark.range(200, 202).select($"id".as("k"))
      .writeTo("graft.snap.winc").option("wap.id", "w2").append()
    spark.sql("ALTER TABLE graft.snap.winc PUBLISH WAP 'w2'")
    val inc3 = spark.read.option("since-version", v1)
      .table("graft.snap.winc").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc3 == ((5L until 8L) ++ (200L until 202L)).toSeq,
      s"published rows must enter the incremental window: $inc3")
    spark.sql("DROP TABLE graft.snap.winc")
  }

  test("snapshot history() reports versions, rows, files") {
    val h = Snapshots.history(spark, s"$warehouse/snap/t").collect()
    assert(h.length == versions("t").size)
    assert(h.map(_.getLong(0)).toSeq == h.map(_.getLong(0)).toSeq.sorted)
    // latest history row matches the live registry
    val d = dataDir("t")
    val live = TableStats.read(fsOf(d), d)
    val last = h.last
    assert(last.getLong(2) == live.size.toLong)
    assert(last.getLong(3) == live.valuesIterator.map(_.rows).sum)
  }

  test("restore rolls back to a snapshot as a new metadata-only commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.snap")
    spark.sql("CREATE TABLE graft.snap.rb (id BIGINT)")
    spark.sql("INSERT INTO graft.snap.rb SELECT id FROM range(10)")
    val good = versions("rb").last
    val filesBefore = parquetCount("rb")
    // the mess: bad append + COW delete
    spark.sql("INSERT INTO graft.snap.rb SELECT id FROM range(100, 120)")
    spark.sql("DELETE FROM graft.snap.rb WHERE id < 5")
    assert(spark.table("graft.snap.rb").count() == 25)

    val restored = Snapshots.restore(s"$warehouse/snap/rb", good)
    assert(restored > versions("rb").init.last || restored == versions("rb").last)
    assert(spark.table("graft.snap.rb").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 10L))
    // pure metadata: no data files deleted by the rollback, history intact —
    // the bad states are still time-travelable for the post-mortem
    assert(parquetCount("rb") >= filesBefore)
    assert(spark.sql(s"SELECT count(*) FROM graft.snap.rb VERSION AS OF ${restored - 1}")
      .head().getLong(0) == 25)
    // the table keeps working past the restore
    spark.sql("INSERT INTO graft.snap.rb SELECT id FROM range(10, 12)")
    assert(spark.table("graft.snap.rb").count() == 12)
    // restoring an unknown version fails loudly
    intercept[IllegalArgumentException](Snapshots.restore(s"$warehouse/snap/rb", 9999L))
    spark.sql("DROP TABLE graft.snap.rb")
  }

  test("catalog-free snapshot-timestamp pins the latest snapshot at-or-before") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.snap")
    spark.sql("CREATE TABLE graft.snap.tts (k BIGINT)")
    spark.sql("INSERT INTO graft.snap.tts VALUES (1)")
    val d = dataDir("tts")
    val afterV1 = Snapshots.list(fsOf(d), d).last._2 // commit mtime millis
    Thread.sleep(1100) // local-FS mtime granularity
    spark.sql("INSERT INTO graft.snap.tts VALUES (2)")
    val ts = java.time.Instant.ofEpochMilli(afterV1).toString
    val pinned = spark.read.format("graft")
      .option("snapshot-timestamp", ts)
      .load(s"$warehouse/snap/tts")
    assert(pinned.count() == 1, s"ts $ts must pin the first commit")
    assert(spark.read.format("graft").load(s"$warehouse/snap/tts").count() == 2)
    // an instant before the first commit has no snapshot — loud error
    val e = intercept[Exception] {
      spark.read.format("graft")
        .option("snapshot-timestamp", "2000-01-01")
        .load(s"$warehouse/snap/tts").count()
    }
    assert(String.valueOf(e.getMessage).contains("no snapshot"), e.getMessage)
  }

  test("registry parses pre-bytes format lines (backward compat)") {
    val withCols = "part-0.parquet\t10\tk=1,5\nplain.parquet\t3\n"
    val m = TableStats.deserialize(withCols)
    // legacy lines read back seq = 0: older than every equality delete,
    // which is the only sound assumption for pre-seq data
    assert(m("part-0.parquet") ==
      TableStats.Entry(10, Map("k" -> ("1", "5")), -1L, 0L))
    assert(m("plain.parquet") == TableStats.Entry(3, seq = 0L))
    val roundTrip = TableStats.deserialize(TableStats.serialize(m))
    assert(roundTrip == m)
  }

  test("registry format revision: written, tolerated, and gated by name") {
    import spark.implicits._
    // current writers stamp every full registry with the revision header
    val ser = TableStats.serialize(Map("a.parquet" -> TableStats.Entry(1)))
    assert(ser.startsWith(s"${TableStats.FmtPrefix}${TableStats.SupportedFormat}\n"), ser)

    // a same-or-older revision and unknown # headers parse cleanly —
    // adding headers or trailing entry fields never bumps the revision
    val tolerated = "#fmt\t1\n#some-future-header\tx\n" +
      "f.parquet\t7\t-1\t\t0\t0\t-\t-\t-\t-\tfuture-field\n"
    val m2 = TableStats.deserialize(tolerated)
    assert(m2("f.parquet").rows == 7 && m2("f.parquet").sums.contains(Map.empty))

    // a NEWER revision refuses loudly with the named error (old binaries
    // must fail clean, not plan from misread stats); unparseable
    // declarations are treated as unknown revisions
    val e = intercept[TableStats.UnsupportedRegistryFormat] {
      TableStats.deserialize("#fmt\t2\nf.parquet\t7\n")
    }
    assert(e.declared == 2L)
    intercept[TableStats.UnsupportedRegistryFormat] {
      TableStats.deserialize("#fmt\tgarbage\nf.parquet\t7\n")
    }
    // overflow and non-ASCII Unicode digits are 'unparseable declaration'
    // too — the named refusal, never a bare NumberFormatException
    intercept[TableStats.UnsupportedRegistryFormat] {
      TableStats.deserialize("#fmt\t99999999999999999999\nf.parquet\t7\n")
    }
    intercept[TableStats.UnsupportedRegistryFormat] {
      TableStats.deserialize("#fmt\t٣\nf.parquet\t7\n")
    }

    // end-to-end: a live table written by THIS binary carries the header
    // in its snapshot checkpoints, and a doctored newer-revision snapshot
    // fails the same named way through the resolve path
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.snap")
    spark.sql("CREATE TABLE graft.snap.fmtv (k BIGINT, v STRING)")
    Seq((1L, "a")).toDF("k", "v").writeTo("graft.snap.fmtv").append()
    val d = dataDir("fmtv")
    val fs = fsOf(d)
    val head = Snapshots.list(fs, d).last._1
    val snapPath = new Path(Snapshots.snapDir(d), f"v$head%09d.tsv")
    val text = {
      val in = fs.open(snapPath)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    assert(text.linesIterator.contains(s"${TableStats.FmtPrefix}1"),
      s"snapshot checkpoint missing the revision header: ${text.take(200)}")
    val doctored = text.replace(s"${TableStats.FmtPrefix}1", s"${TableStats.FmtPrefix}99")
    val out = fs.create(snapPath, true)
    try out.write(doctored.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val e2 = intercept[Exception] {
      Snapshots.read(fs, d, head)
    }
    def findNamed(t: Throwable): Boolean = t match {
      case null => false
      case _: TableStats.UnsupportedRegistryFormat => true
      case t => findNamed(t.getCause)
    }
    assert(findNamed(e2), s"expected UnsupportedRegistryFormat, got $e2")
  }

  test("delta snapshot bodies carry NO header at revision 1 (old readers parse)") {
    import spark.implicits._
    // pre-header DELTA parsers (round <=7) threw on any '#' line — the
    // full-manifest parser always skipped them. So at revision 1 a delta
    // body must stay header-free or every older binary breaks on a table
    // whose format did NOT change, violating the append-only contract.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.snap")
    spark.sql("CREATE TABLE graft.snap.dhv (k BIGINT, v STRING)")
    Seq((1L, "a")).toDF("k", "v").writeTo("graft.snap.dhv").append()
    Seq((2L, "b")).toDF("k", "v").writeTo("graft.snap.dhv").append()
    val d = dataDir("dhv")
    val fs = fsOf(d)
    val head = Snapshots.list(fs, d).last._1
    val snapPath = new Path(Snapshots.snapDir(d), f"v$head%09d.tsv")
    def textOf: String = {
      val in = fs.open(snapPath)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val text = textOf
    assert(text.startsWith("#delta\t"), s"second commit should delta-encode: ${text.take(60)}")
    assert(!text.linesIterator.exists(_.startsWith(TableStats.FmtPrefix)),
      s"delta body must not carry the revision header: ${text.take(200)}")
    // a ROUND-7-STRICT delta parse (no '#' branch) accepts every line
    text.linesIterator.drop(1).filter(_.nonEmpty).foreach { line =>
      assert(line.startsWith("-\t") || line.startsWith("+\t"),
        s"line would break a pre-header delta parser: $line")
    }
    // ...while a future revision-N delta still refuses BY NAME through
    // the tolerant resolve path of THIS binary
    val doctored = text.replaceFirst("\n", s"\n${TableStats.FmtPrefix}99\n")
    val out = fs.create(snapPath, true)
    try out.write(doctored.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val e = intercept[Exception] { Snapshots.read(fs, d, head) }
    def named(t: Throwable): Boolean = t match {
      case null => false
      case _: TableStats.UnsupportedRegistryFormat => true
      case t => named(t.getCause)
    }
    assert(named(e), s"expected UnsupportedRegistryFormat, got $e")
  }
}
