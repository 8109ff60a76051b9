package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.{ChangeLog, Snapshots, TableStats}

/** Commit-protocol crash matrix: for each interruption point of the batch
  * commit protocol (part files land → snapshot recorded → registry swapped
  * → kind marker / side files), reproduce the exact on-disk state a crash
  * there leaves behind — using the same primitives the real paths call,
  * under the same lock — and prove that
  *
  *   (a) a reader never sees a torn state (the registry pointer swap is
  *       the single commit point; everything before it is invisible), and
  *   (b) the next writer heals or ignores the orphans (unmarked versions
  *       above the live head become [[ChangeLog.Aborted]]; feeds skip
  *       them; vacuum reclaims unreferenced files).
  *
  * The streaming epoch path documents and tests its own crash repair
  * (`_commits` markers — StreamingSpec); this spec proves the BATCH paths:
  * plain INSERT, write-audit-publish stage/publish, and the lock itself
  * (stale-holder takeover). The reference has no comparable protocol to
  * crash (HBase commits are server-side RPCs).
  */
class CrashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_crash_wh").toString

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
  private def dataDir(tbl: String) = new Path(s"$warehouse/crash/$tbl/data")
  private def tableDir(tbl: String) = s"$warehouse/crash/$tbl"
  private def versions(tbl: String): Seq[Long] = {
    val d = dataDir(tbl)
    Snapshots.list(fsOf(d), d).map(_._1)
  }
  private def rows(tbl: String): Seq[Long] =
    spark.table(s"graft.crash.$tbl").collect().map(_.getLong(0)).sorted.toSeq

  /** Land a real (k BIGINT, v STRING) parquet part file under `data/`
    * exactly like an in-flight writer does BEFORE it takes the commit
    * lock: bytes on disk, no metadata anywhere. */
  private def plantPartFile(tbl: String, rel: String, n: Int): Unit = {
    val tmp = Files.createTempDirectory("graft_crash_pq").toString
    spark.range(1000, 1000 + n)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val d = dataDir(tbl)
    val fs = fsOf(d)
    fs.mkdirs(d)
    org.apache.hadoop.fs.FileUtil.copy(
      src, fs, new Path(d, rel), false, new Configuration())
  }

  test("crash after part files land, before any metadata: rows invisible, " +
      "commits unaffected, vacuum reclaims the orphan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.crash.t1 VALUES (1, 'a'), (2, 'b')")
    plantPartFile("t1", "part-orphan-deadbeef.parquet", 5)

    // (a) the registry is the manifest: the orphan's rows never surface,
    // through the scan or the registry-first COUNT(*)
    assert(rows("t1") == Seq(1L, 2L))
    assert(spark.sql("SELECT COUNT(*) FROM graft.crash.t1").head().getLong(0) == 2L)

    // (b) the next commit neither trips over nor adopts the orphan
    spark.sql("INSERT INTO graft.crash.t1 VALUES (3, 'c')")
    assert(rows("t1") == Seq(1L, 2L, 3L))
    val d = dataDir("t1")
    val fs = fsOf(d)
    assert(!TableStats.read(fs, d).contains("part-orphan-deadbeef.parquet"),
      "a commit must never register files it did not write")

    // vacuum reclaims it once past the age guard (it is referenced by no
    // retained manifest), leaving the table intact
    val (deleted, _) = Snapshots.vacuum(tableDir("t1"), retain = 1, minAgeMillis = 0L)
    assert(deleted >= 1)
    assert(!fs.exists(new Path(d, "part-orphan-deadbeef.parquet")),
      "the orphan part file must be physically reclaimed")
    assert(rows("t1") == Seq(1L, 2L, 3L))
  }

  test("crash between snapshot record and registry swap: clean abort — " +
      "readers unaffected, next committer heals the orphan version") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.crash.t2 VALUES (1, 'a')")
    val v1 = versions("t2").last
    val d = dataDir("t2")
    val fs = fsOf(d)

    // the doomed commit: part file lands, snapshot is recorded... and the
    // process dies before TableStats.write swaps the registry pointer.
    // Same primitives, same lock, same order as TableStats.write itself.
    plantPartFile("t2", "part-crashed-00000001.parquet", 4)
    val orphanV = TableStats.withLock(fs, d) {
      val head = TableStats.liveVersion(fs, d)
      val next = Snapshots.nextVersion(fs, d)
      val stats = TableStats.read(fs, d) +
        ("part-crashed-00000001.parquet" -> TableStats.Entry(4, seq = next))
      Snapshots.recordAt(fs, d, stats, next, base = head)
      // CRASH: no registry swap, no kind marker
      next
    }
    assert(orphanV == v1 + 1)

    // (a) nothing is torn: the live registry still resolves to v1's
    // manifest, scans and pushed-down COUNT(*) see only the old rows
    assert(TableStats.liveVersion(fs, d).contains(v1))
    assert(rows("t2") == Seq(1L))
    assert(spark.sql("SELECT COUNT(*) FROM graft.crash.t2").head().getLong(0) == 1L)

    // (b) the next commit heals: the unmarked version above the live head
    // is marked Aborted, the new commit lands ABOVE it, and the orphan's
    // rows never surface
    spark.sql("INSERT INTO graft.crash.t2 VALUES (2, 'b')")
    assert(ChangeLog.kindOf(fs, d, orphanV).contains(ChangeLog.Aborted),
      "the crashed commit's version must be healed to Aborted")
    assert(versions("t2").last == orphanV + 1)
    assert(rows("t2") == Seq(1L, 2L))
    assert(!TableStats.read(fs, d).contains("part-crashed-00000001.parquet"))

    // the incremental append scan walks the range and must skip the
    // aborted version as a side branch — not refuse, not replay it
    val inc = spark.read.option("since-version", v1)
      .table("graft.crash.t2").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc == Seq(2L), s"incremental read across a healed abort: $inc")

    // the aborted snapshot's file is a tombstone-less orphan: once the
    // aborted manifest itself expires, vacuum reclaims the data file
    spark.sql("INSERT INTO graft.crash.t2 VALUES (3, 'c')")
    val (deleted, _) = Snapshots.vacuum(tableDir("t2"), retain = 1, minAgeMillis = 0L)
    assert(deleted >= 1)
    assert(!fs.exists(new Path(d, "part-crashed-00000001.parquet")))
    assert(rows("t2") == Seq(1L, 2L, 3L))
  }

  test("a crashed commit's snapshot is unreadable history: time travel, " +
      "TIMESTAMP AS OF and RESTORE all refuse it, before and after healing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t8 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.crash.t8 VALUES (1, 'a')")
    val v1 = versions("t8").last
    val d = dataDir("t8")
    val fs = fsOf(d)
    plantPartFile("t8", "part-crashed-00000008.parquet", 4)
    val orphanV = TableStats.withLock(fs, d) {
      val head = TableStats.liveVersion(fs, d)
      val next = Snapshots.nextVersion(fs, d)
      val stats = TableStats.read(fs, d) +
        ("part-crashed-00000008.parquet" -> TableStats.Entry(4, seq = next))
      Snapshots.recordAt(fs, d, stats, next, base = head)
      next // CRASH: no registry swap, no kind marker
    }

    def refusedEverywhere(phase: String): Unit = {
      // explicit version pin: the orphan's never-committed rows must not
      // be readable
      val e1 = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.crash.t8 VERSION AS OF $orphanV").collect()
      }
      assert(e1.getMessage.contains("crashed commit") ||
        e1.getMessage.contains("aborted"), s"$phase: ${e1.getMessage}")
      // implicit timestamp resolution must land on the live chain
      val nowTs = java.time.Instant.now().plusSeconds(60).toString
      val tt = spark.sql(
        s"SELECT k FROM graft.crash.t8 TIMESTAMP AS OF CAST('$nowTs' AS TIMESTAMP)")
        .collect().map(_.getLong(0)).sorted.toSeq
      // the planted orphan's rows are k = 1000..1003
      assert(!tt.exists(_ >= 1000L),
        s"$phase: timestamp travel surfaced orphan rows: $tt")
      // RESTORE must refuse to publish it
      val e2 = intercept[Exception] {
        spark.sql(s"RESTORE TABLE graft.crash.t8 TO VERSION AS OF $orphanV").collect()
      }
      assert(e2.getMessage.contains("crashed commit") ||
        e2.getMessage.contains("aborted"), s"$phase: ${e2.getMessage}")
    }

    refusedEverywhere("unhealed (unmarked above live head)")
    // heal: the next commit marks the orphan Aborted
    spark.sql("INSERT INTO graft.crash.t8 VALUES (2, 'b')")
    assert(ChangeLog.kindOf(fs, d, orphanV).contains(ChangeLog.Aborted))
    refusedEverywhere("healed (Aborted marker)")
    // the real history stays reachable
    assert(spark.sql(s"SELECT k FROM graft.crash.t8 VERSION AS OF $v1")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(rows("t8") == Seq(1L, 2L))
  }

  test("RESTORE refreshes cached plans: CACHE TABLE never serves " +
      "pre-restore contents") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t9 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.crash.t9 VALUES (1, 'a')")
    val v1 = versions("t9").last
    spark.sql("INSERT INTO graft.crash.t9 VALUES (2, 'b')")
    spark.sql("CACHE TABLE graft.crash.t9")
    assert(rows("t9") == Seq(1L, 2L)) // materialize the cache
    spark.sql(s"RESTORE TABLE graft.crash.t9 TO VERSION AS OF $v1").collect()
    assert(rows("t9") == Seq(1L),
      "a cached plan served the pre-restore table contents")
    spark.sql("UNCACHE TABLE graft.crash.t9")
  }

  test("crash mid-PUBLISH WAP (registry folded, stage files not cleaned): " +
      "retry is idempotent; discard after the crash cannot delete published data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t3 (k BIGINT)")
    spark.sql("INSERT INTO graft.crash.t3 VALUES (1)")
    import spark.implicits._
    spark.range(10, 13).select($"id".as("k"))
      .writeTo("graft.crash.t3").option("wap.id", "w").append()
    val d = dataDir("t3")
    val fs = fsOf(d)
    assert(rows("t3") == Seq(1L), "staged rows must stay invisible")

    // the doomed publish: fold the adds into the live registry (publish's
    // first step), then die before deleting the adds-list and the tag
    val adds = Snapshots.readWap(fs, d, "w").get
    TableStats.withLock(fs, d) {
      TableStats.write(fs, d, TableStats.read(fs, d) ++ adds)
      // CRASH: _wap/w.tsv and the wap-w tag survive
    }
    assert(rows("t3") == Seq(1L, 10L, 11L, 12L), "the fold is the commit point")
    assert(Snapshots.readWap(fs, d, "w").isDefined, "crash left the stage behind")

    // retry (what an orchestrator does on publish timeout): a second
    // PUBLISH folds the same entries — a no-op on the manifest, and the
    // stage's side files are finally cleaned
    spark.sql("ALTER TABLE graft.crash.t3 PUBLISH WAP 'w'")
    assert(rows("t3") == Seq(1L, 10L, 11L, 12L), "publish retry must not duplicate rows")
    assert(Snapshots.readWap(fs, d, "w").isEmpty)
    assert(Snapshots.listWap(fs, d).isEmpty)

    // the other recovery choice: DISCARD after a crashed publish must not
    // delete data the fold already made live
    spark.range(20, 22).select($"id".as("k"))
      .writeTo("graft.crash.t3").option("wap.id", "w2").append()
    val adds2 = Snapshots.readWap(fs, d, "w2").get
    TableStats.withLock(fs, d) {
      TableStats.write(fs, d, TableStats.read(fs, d) ++ adds2)
      // CRASH again
    }
    val before = rows("t3")
    spark.sql("ALTER TABLE graft.crash.t3 DISCARD WAP 'w2'")
    assert(rows("t3") == before,
      "discard after a crashed publish must leave the published rows intact")
    adds2.keysIterator.foreach { rel =>
      assert(fs.exists(new Path(d, rel)), s"published file $rel must survive the discard")
    }
  }

  test("crash mid-stage (audit snapshot recorded, marker/tag lost): the " +
      "stage is healed as a side branch but PUBLISH still lands it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t4 (k BIGINT)")
    spark.sql("INSERT INTO graft.crash.t4 VALUES (1)")
    val v1 = versions("t4").last
    import spark.implicits._
    spark.range(50, 52).select($"id".as("k"))
      .writeTo("graft.crash.t4").option("wap.id", "s").append()
    val stagedV = versions("t4").last
    val d = dataDir("t4")
    val fs = fsOf(d)
    // reproduce the crash-before-marker state: adds-list + audit snapshot
    // on disk, Staged marker and wap-s tag never written
    fs.delete(ChangeLog.markerPath(d, stagedV), false)
    Snapshots.dropTag(tableDir("t4"), Snapshots.wapTag("s"))

    // (a) normal readers see nothing of the stage
    assert(rows("t4") == Seq(1L))

    // (b) the next committer cannot distinguish this from a crashed
    // commit — it heals the unmarked version to Aborted, which keeps
    // every feed and tombstone computation sound...
    spark.sql("INSERT INTO graft.crash.t4 VALUES (2)")
    assert(ChangeLog.kindOf(fs, d, stagedV).contains(ChangeLog.Aborted))
    assert(rows("t4") == Seq(1L, 2L))
    val inc = spark.read.option("since-version", v1)
      .table("graft.crash.t4").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc == Seq(2L))

    // ...while the adds-list keeps the stage PUBLISHable: the staged rows
    // land exactly once, exactly at publish
    spark.sql("ALTER TABLE graft.crash.t4 PUBLISH WAP 's'")
    assert(rows("t4") == Seq(1L, 2L, 50L, 51L))
    val inc2 = spark.read.option("since-version", v1)
      .table("graft.crash.t4").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc2 == Seq(2L, 50L, 51L))
  }

  test("stale-lock takeover: a crashed holder's lock expires by mtime and " +
      "the next committer proceeds") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t5 (k BIGINT)")
    spark.sql("INSERT INTO graft.crash.t5 VALUES (1)")
    val d = dataDir("t5")
    val fs = fsOf(d)
    // the dead holder: a lock file whose heartbeat stopped 2 minutes ago
    val lock = new Path(d.getParent, ".stats.lock")
    val out = fs.create(lock, false)
    try out.write("dead-holder-token".getBytes("UTF-8")) finally out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 120000L, -1)

    spark.sql("INSERT INTO graft.crash.t5 VALUES (2)") // must not wait out 30 s
    assert(rows("t5") == Seq(1L, 2L))
    assert(!fs.exists(lock) ||
      !new String({
        val in = fs.open(lock); try in.readAllBytes() finally in.close()
      }, "UTF-8").contains("dead-holder-token"),
      "the dead holder's lock incarnation must be gone")
  }

  test("stray temp files from crashed metadata writes are inert") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t6 (k BIGINT)")
    spark.sql("INSERT INTO graft.crash.t6 VALUES (1)")
    val d = dataDir("t6")
    val fs = fsOf(d)
    // a registry temp (crash between create and rename) and a snapshot
    // temp — both under their real names
    def plant(p: Path): Unit = {
      val o = fs.create(p, true); try o.write("torn".getBytes("UTF-8")) finally o.close()
    }
    plant(new Path(d.getParent, s".${TableStats.FileName}.tmp-dead"))
    plant(new Path(Snapshots.snapDir(d), ".v000000099.tsv.tmp"))

    // listings, reads, version history and further commits all ignore them
    assert(rows("t6") == Seq(1L))
    val before = versions("t6")
    spark.sql("INSERT INTO graft.crash.t6 VALUES (2)")
    assert(rows("t6") == Seq(1L, 2L))
    assert(versions("t6") == before :+ (before.last + 1),
      "snapshot temp files must never be listed as versions")
  }

  test("crashed COW leaves a change-staging dir: inert until the age " +
      "guard passes, then vacuum reclaims it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.crash")
    spark.sql("CREATE TABLE graft.crash.t7 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.crash.t7 VALUES (1, 'a'), (2, 'b')")
    val d = dataDir("t7")
    val fs = fsOf(d)
    // a row-level rewrite that died after staging its change files but
    // before its commit: `_changes/.staging-<writeId>` never renamed
    val staging = new Path(ChangeLog.changesDir(d), ".staging-deadwrite")
    fs.mkdirs(staging)
    val out = fs.create(new Path(staging, "cf-0.parquet"), true)
    try out.write("orphan".getBytes("UTF-8")) finally out.close()

    // inert: reads, mutations, and the change feed all ignore it
    spark.sql("DELETE FROM graft.crash.t7 WHERE k = 1")
    assert(rows("t7") == Seq(2L))
    // age guard first (an in-flight writer's staging dir must survive)...
    Snapshots.vacuum(tableDir("t7"), retain = 2, minAgeMillis = 3600000L)
    assert(fs.exists(staging), "a fresh staging dir may belong to a live writer")
    // ...then reclaim
    Snapshots.vacuum(tableDir("t7"), retain = 2, minAgeMillis = 0L)
    assert(!fs.exists(staging), "an aged-out crashed staging dir must be reclaimed")
    assert(rows("t7") == Seq(2L))
  }

  test("a registry pointer at a missing snapshot is loud corruption, not " +
      "an empty table") {
    val d = new Path(s"$warehouse/crash/corrupt/data")
    val fs = fsOf(d)
    fs.mkdirs(d)
    val out = fs.create(new Path(d, TableStats.FileName), true)
    try out.write(s"${TableStats.PtrPrefix}9999\n".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException](TableStats.readIfExists(fs, d))
    assert(e.getMessage.contains("missing snapshot"), e.getMessage)
  }
}
