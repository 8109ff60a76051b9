package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

import graft.sources.{Snapshots, Transactions}

/** Multi-table atomic transactions: writes staged to several tables
  * become visible together or not at all, through every crash
  * interruption point of the intent → decide → complete protocol.
  */
class TransactionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_txn").toString

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.catalog.txc", classOf[graft.sources.GraftCatalog].getName)
    .config("spark.sql.catalog.txc.warehouse", warehouse)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def count(t: String): Long =
    spark.sql(s"SELECT count(*) FROM txc.t.$t").head().getLong(0)

  private def batch(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  private def wapIds(t: String): Seq[String] = {
    val d = new org.apache.hadoop.fs.Path(s"$warehouse/t/$t/data")
    Snapshots.listWap(d.getFileSystem(new org.apache.hadoop.conf.Configuration()), d)
  }

  test("setup: two participant tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txc.t")
    spark.sql("CREATE TABLE txc.t.a (id BIGINT, s STRING)")
    spark.sql("CREATE TABLE txc.t.b (id BIGINT, s STRING)")
    spark.sql("INSERT INTO txc.t.a VALUES (0, 'seed')")
    assert(count("a") == 1 && count("b") == 0)
  }

  test("commit publishes every table; stages invisible before commit") {
    Transactions.run(spark, warehouse) { txn =>
      txn.write("txc.t.a", batch(1, 6))
      txn.write("txc.t.b", batch(1, 4))
      // mid-transaction: both writes are durable but invisible
      assert(count("a") == 1 && count("b") == 0,
        "staged writes leaked before commit")
    }
    assert(count("a") == 6 && count("b") == 3)
    assert(wapIds("a").isEmpty && wapIds("b").isEmpty, "stages must be consumed")
  }

  test("a body failure rolls every staged write back") {
    val e = intercept[RuntimeException] {
      Transactions.run(spark, warehouse) { txn =>
        txn.write("txc.t.a", batch(100, 110))
        txn.write("txc.t.b", batch(100, 105))
        throw new RuntimeException("validation failed")
      }
    }
    assert(e.getMessage == "validation failed")
    assert(count("a") == 6 && count("b") == 3, "rollback must leave no rows")
    assert(wapIds("a").isEmpty && wapIds("b").isEmpty, "rollback must drop stages")
  }

  test("crash after intent, before decide: recover rolls back (age-guarded)") {
    val txn = Transactions.begin(spark, warehouse)
    txn.write("txc.t.a", batch(200, 205))
    txn.write("txc.t.b", batch(200, 203))
    txn.writeIntent()
    // coordinator dies here. A recover inside the age guard must NOT
    // roll back a possibly-live transaction...
    assert(Transactions.recover(spark, warehouse) == ((0, 0)))
    assert(wapIds("a").size == 1 && wapIds("b").size == 1)
    // ...but past the guard the undecided stages are discarded
    assert(Transactions.recover(spark, warehouse, minAgeMillis = 0L) == ((0, 1)))
    assert(count("a") == 6 && count("b") == 3)
    assert(wapIds("a").isEmpty && wapIds("b").isEmpty)
  }

  test("crash after decide: recover rolls forward to all-visible") {
    val txn = Transactions.begin(spark, warehouse)
    txn.write("txc.t.a", batch(300, 310))
    txn.write("txc.t.b", batch(300, 306))
    txn.writeIntent()
    txn.decide()
    // coordinator dies before publishing anything: nothing visible yet,
    // but the decision is durable — recovery must complete, not discard
    assert(count("a") == 6 && count("b") == 3)
    assert(Transactions.recover(spark, warehouse, minAgeMillis = 0L) == ((1, 0)))
    assert(count("a") == 16 && count("b") == 9)
    assert(wapIds("a").isEmpty && wapIds("b").isEmpty)
    // recover is idempotent: nothing left to converge
    assert(Transactions.recover(spark, warehouse, minAgeMillis = 0L) == ((0, 0)))
  }

  test("crash mid-complete (one table published): recover finishes the rest") {
    val txn = Transactions.begin(spark, warehouse)
    txn.write("txc.t.a", batch(400, 404))
    txn.write("txc.t.b", batch(400, 402))
    txn.writeIntent()
    txn.decide()
    // the pre-crash attempt published table a only
    Snapshots.publishWap(s"$warehouse/t/a", wapIds("a").head)
    assert(count("a") == 20 && count("b") == 9, "torn state before recovery")
    assert(Transactions.recover(spark, warehouse, minAgeMillis = 0L) == ((1, 0)))
    assert(count("a") == 20 && count("b") == 11,
      "recovery must publish b exactly once and never double-publish a")
  }

  test("an empty transaction commits as a no-op") {
    Transactions.run(spark, warehouse) { _ => () }
    assert(count("a") == 20 && count("b") == 11)
  }

  test("a torn intent file (crash mid-write) cannot crash recover") {
    val d = new org.apache.hadoop.fs.Path(warehouse, "_txn")
    val fs = d.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.mkdirs(d)
    val out = fs.create(new org.apache.hadoop.fs.Path(d, "torn123.intent"), false)
    out.write(s"$warehouse/t/a\ttxn-torn123-1\n$warehouse/t/b".getBytes("UTF-8"))
    out.close()
    // undecided + torn tail: the parsable participant is discarded (its
    // stage doesn't exist — a no-op), the torn line is skipped, recover
    // completes and removes the intent
    assert(Transactions.recover(spark, warehouse, minAgeMillis = 0L) == ((0, 1)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(d, "torn123.intent")))
    assert(count("a") == 20 && count("b") == 11)
  }

  test("a non-graft write target fails BEFORE any rows land") {
    intercept[IllegalArgumentException] {
      Transactions.run(spark, warehouse) { txn =>
        txn.write("nosuch.ns.t", batch(0, 5))
      }
    }
    assert(count("a") == 20 && count("b") == 11)
  }

  test("readAt: cross-table snapshot is all-old before the record, all-new after, " +
      "through a mid-complete crash") {
    def liveV(t: String): Long = {
      val dd = new org.apache.hadoop.fs.Path(s"$warehouse/t/$t/data")
      graft.sources.TableStats.liveVersion(
        dd.getFileSystem(new org.apache.hadoop.conf.Configuration()), dd).get
    }
    def countAt(t: String, v: Long): Long =
      spark.read.option("snapshot-version", v).table(s"txc.t.$t").count()
    val (vA0, vB0) = (liveV("a"), liveV("b"))
    val txn = Transactions.begin(spark, warehouse)
    txn.write("txc.t.a", batch(500, 510))
    txn.write("txc.t.b", batch(500, 504))
    txn.writeIntent()
    txn.decide()
    // mid-complete crash: a published, b not — a LIVE read interleaves
    // (a new, b old), but the snapshot machinery never serves that mix:
    val vAPub = Snapshots.publishWap(s"$warehouse/t/a", wapIds("a").head)
    assert(count("a") == 30 && count("b") == 11, "live read is torn mid-complete")
    // ... the record does not exist yet, readAt refuses loudly, and the
    // pre-transaction pinned versions still give consistent ALL-OLD
    assert(Transactions.publishedVersions(warehouse, txn.id).isEmpty)
    val e = intercept[IllegalStateException](
      Transactions.readAt(spark, warehouse, txn.id, "txc.t.a"))
    assert(e.getMessage.contains("mid-complete"), e.getMessage)
    assert(countAt("a", vA0) == 20 && countAt("b", vB0) == 11)
    // recovery converges; the record appears and readAt is ALL-NEW —
    // with a's version being the PRE-CRASH publish (learned from the
    // durable published marker, never a re-publish)
    assert(Transactions.recover(spark, warehouse, minAgeMillis = 0L) == ((1, 0)))
    val vs = Transactions.publishedVersions(warehouse, txn.id).get
    assert(vs.collectFirst { case (d, v) if d.endsWith("/t/a") => v }
      .contains(vAPub), s"recorded a-version must be the pre-crash publish: $vs")
    assert(Transactions.readAt(spark, warehouse, txn.id, "txc.t.a").count() == 30)
    assert(Transactions.readAt(spark, warehouse, txn.id, "txc.t.b").count() == 15)
    // non-participants are refused, not silently served at head
    spark.sql("CREATE TABLE txc.t.c (id BIGINT, s STRING)")
    val e2 = intercept[IllegalArgumentException](
      Transactions.readAt(spark, warehouse, txn.id, "txc.t.c"))
    assert(e2.getMessage.contains("not a participant"), e2.getMessage)
  }

  // ---- staged REPLACE (the index-compaction primitive) ---------------------

  test("replace: contents swap atomically alongside appends; the version is " +
      "marked Replace for the feeds") {
    spark.sql("CREATE TABLE txc.t.r (id BIGINT, s STRING)")
    spark.sql("INSERT INTO txc.t.r VALUES (1, 'old'), (2, 'old')")
    val bBefore = count("b")
    Transactions.run(spark, warehouse) { txn =>
      txn.replace("txc.t.r", batch(700, 703))
      txn.write("txc.t.b", batch(700, 702))
      // mid-transaction: the swap is staged, the live table still OLD
      assert(count("r") == 2 && count("b") == bBefore,
        "staged replace leaked before commit")
    }
    assert(count("r") == 3 && count("b") == bBefore + 2)
    assert(spark.table("txc.t.r").select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(700L, 701L, 702L), "replace must swap, not fold")
    // the published swap carries a Replace change-log marker, so feeds
    // replay it as delete(old rows) + insert(new rows) instead of
    // refusing an unrecorded rewrite
    val dd = new org.apache.hadoop.fs.Path(s"$warehouse/t/r/data")
    val fs = dd.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val v = graft.sources.TableStats.liveVersion(fs, dd).get
    assert(graft.sources.ChangeLog.kindOf(fs, dd, v)
      .contains(graft.sources.ChangeLog.Replace))
  }

  test("replace: an empty stage is a transactional TRUNCATE") {
    Transactions.run(spark, warehouse) { txn =>
      txn.replace("txc.t.r", spark.table("txc.t.r").limit(0))
    }
    assert(count("r") == 0)
  }

  test("replace: a commit landing after staging fails the transaction whole " +
      "(the landed commit survives, the swap never applies)") {
    spark.sql("INSERT INTO txc.t.r VALUES (10, 'landed-before')")
    // the TYPED abort: callers for whom the race is benign backpressure
    // (compactions in a maintainer's onBatch hook) catch exactly this
    val e = intercept[Transactions.ReplaceRaceLost] {
      Transactions.run(spark, warehouse) { txn =>
        txn.replace("txc.t.r", batch(800, 805))
        txn.write("txc.t.b", batch(800, 803))
        // a racing committer lands on the replaced table before decide
        spark.sql("INSERT INTO txc.t.r VALUES (11, 'raced')")
      }
    }
    assert(e.getMessage.contains("lost a race"), e.getMessage)
    assert(spark.table("txc.t.r").select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(10L, 11L), "both independent commits must survive the rollback")
    assert(wapIds("r").isEmpty && wapIds("b").isEmpty, "rollback must drop stages")
  }

  test("replace: crash after decide rolls the swap FORWARD") {
    val txn = Transactions.begin(spark, warehouse)
    txn.replace("txc.t.r", batch(900, 902))
    txn.writeIntent()
    txn.decide()
    assert(spark.table("txc.t.r").count() == 2, "nothing visible pre-recovery")
    assert(Transactions.recover(spark, warehouse, minAgeMillis = 0L) == ((1, 0)))
    assert(spark.table("txc.t.r").select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(900L, 901L), "recovery must complete the swap")
  }

  test("replace publish writes the marker BEFORE the swap; a crash between " +
      "the two heals with the feed intact") {
    // The reverse order left a permanent poison: a crash after the
    // registry swap but before the marker made the shrink version live
    // UNMARKED, and every feed interval crossing it threw forever.
    // Marker-first means the crash window leaves only a marker at the
    // not-yet-minted version; the re-publish (recover's roll-forward)
    // recomputes the same version and overwrites it.
    val dd = new org.apache.hadoop.fs.Path(s"$warehouse/t/r/data")
    val fs = dd.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val txn = Transactions.begin(spark, warehouse)
    txn.replace("txc.t.r", batch(950, 952))
    txn.writeIntent()
    txn.decide()
    // simulate the crash window: the marker the fixed publishWap writes
    // first is on disk, the swap never ran
    val pre = graft.sources.Snapshots.nextVersion(fs, dd)
    graft.sources.ChangeLog.writeMarker(fs, dd, pre,
      graft.sources.ChangeLog.Replace)
    assert(graft.sources.TableStats.liveVersion(fs, dd).get < pre,
      "precondition: the swap must not have happened yet")
    // recovery rolls the decided swap forward through the stranded marker
    Transactions.recover(spark, warehouse, minAgeMillis = 0L)
    val v = graft.sources.TableStats.liveVersion(fs, dd).get
    assert(v == pre, "re-publish must mint exactly the marked version")
    assert(graft.sources.ChangeLog.kindOf(fs, dd, v)
      .contains(graft.sources.ChangeLog.Replace))
    assert(spark.table("txc.t.r").select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(950L, 951L), "recovery must complete the swap")
  }

  test("a stray marker from a dead marker-first committer cannot poison the " +
      "next plain append (chokepoint clears it)") {
    // crash window: a marker-first committer (COW, replace publish) dies
    // after writing its kind marker but before recording the snapshot.
    // A foreign plain append then mints the SAME version number — without
    // the chokepoint's clear, it would inherit the dead committer's kind
    // and feeds would replay the append as a full-table replace.
    spark.sql("CREATE TABLE txc.t.sm (id BIGINT, s STRING)")
    spark.sql("INSERT INTO txc.t.sm VALUES (1, 'a'), (2, 'b')")
    val dd = new org.apache.hadoop.fs.Path(s"$warehouse/t/sm/data")
    val fs = dd.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val pre = graft.sources.Snapshots.nextVersion(fs, dd)
    graft.sources.ChangeLog.writeMarker(fs, dd, pre,
      graft.sources.ChangeLog.Replace) // the dead committer's leftover
    spark.sql("INSERT INTO txc.t.sm VALUES (3, 'c')") // foreign plain append
    val v = graft.sources.TableStats.liveVersion(fs, dd).get
    assert(v == pre, "the append must mint the marked version number")
    assert(graft.sources.ChangeLog.kindOf(fs, dd, v).isEmpty,
      "the stray Replace marker must be cleared — an append is not a swap")
    // and the change feed across it replays exactly the inserted row
    val cat = spark.sessionState.catalogManager.catalog("txc")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("t"), "sm")).asInstanceOf[graft.sources.GraftTable]
    val feed = graft.sources.Snapshots.changes(spark, tbl,
      since = pre - 1, end = Some(v))
    val rows = feed.selectExpr("id", graft.sources.ChangeLog.TypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((3L, "insert")),
      s"feed must replay a plain insert, not a replace: $rows")
  }

  test("a marker-first committer dying AFTER recordAt but BEFORE the swap " +
      "heals to Aborted at the next commit (no phantom replace)") {
    // crash window: a replace publish (or COW/compaction) wrote its kind
    // marker AND recorded its snapshot, then died before the registry
    // swap. If the healing loop skipped marked orphans, the next commit
    // would mint maxV+1 and move head PAST the orphan, after which feeds
    // would replay the never-committed manifest diff as a phantom
    // Replace and time travel could return never-committed rows.
    spark.sql("CREATE TABLE txc.t.oh (id BIGINT, s STRING)")
    spark.sql("INSERT INTO txc.t.oh VALUES (1, 'a'), (2, 'b')")
    val dd = new org.apache.hadoop.fs.Path(s"$warehouse/t/oh/data")
    val fs = dd.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val head0 = graft.sources.TableStats.liveVersion(fs, dd).get
    val pre = Snapshots.nextVersion(fs, dd)
    // the dead committer's leftovers, in the real write() order: marker
    // first, then the recorded snapshot (a replace-to-nothing) — and no
    // registry swap
    graft.sources.ChangeLog.writeMarker(fs, dd, pre,
      graft.sources.ChangeLog.Replace)
    Snapshots.recordAt(fs, dd, Map.empty, pre, base = Some(head0))
    assert(graft.sources.TableStats.liveVersion(fs, dd).get == head0,
      "precondition: the registry swap must not have happened")
    // the next plain commit heals the orphan and mints above it
    spark.sql("INSERT INTO txc.t.oh VALUES (3, 'c')")
    val v = graft.sources.TableStats.liveVersion(fs, dd).get
    assert(v == pre + 1, s"the append must mint above the orphan: $v")
    assert(graft.sources.ChangeLog.kindOf(fs, dd, pre)
      .contains(graft.sources.ChangeLog.Aborted),
      "the marked orphan above head must heal to Aborted")
    // no phantom delete: all three rows live, and the feed across the
    // healed interval replays exactly the insert
    assert(spark.table("txc.t.oh").count() == 3)
    val cat = spark.sessionState.catalogManager.catalog("txc")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("t"), "oh")).asInstanceOf[graft.sources.GraftTable]
    val feed = Snapshots.changes(spark, tbl, since = head0, end = Some(v))
    val rows2 = feed.selectExpr("id", graft.sources.ChangeLog.TypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows2 == Seq((3L, "insert")),
      s"feed must skip the aborted orphan and replay the insert only: $rows2")
  }

  test("a checked commit converges a DECIDED sibling first: a dead " +
      "mid-publish fold cannot be double-indexed past the precondition") {
    // the single-maintainer hazard the commit guard alone cannot close:
    // maintainer A's fold DECIDES (= committed) and dies before its
    // watermark publish lands; maintainer B's duplicate fold then reads
    // the stale watermark and would pass its precondition — unless the
    // guarded commit rolls decided siblings forward first.
    spark.sql("CREATE TABLE txc.t.cg (id BIGINT, s STRING)")
    val sib = Transactions.begin(spark, warehouse)
    sib.write("txc.t.cg", batch(0, 3))
    sib.writeIntent(); sib.decide() // decided, then "died" before complete()
    assert(count("cg") == 0, "precondition: nothing published yet")
    intercept[graft.sources.Transactions.PreconditionFailed] {
      Transactions.run(spark, warehouse) { txn =>
        txn.precondition("cg still empty (the stale-watermark read)") {
          spark.table("txc.t.cg").count() == 0
        }
        txn.write("txc.t.cg", batch(0, 3)) // the duplicate fold
      }
    }
    assert(count("cg") == 3,
      "the decided sibling must be rolled forward under the guard, " +
        "and the duplicate must abort instead of doubling the rows")
  }

  test("commit-guard crash matrix: a holder dying at EVERY point inside the " +
      "guard yields exactly-once watermark advance for the surviving maintainer") {
    // the one critical section round 11 added (converge decided siblings →
    // re-check preconditions → writeIntent → decide → complete, all under
    // the coordinator's commit guard) relies on the 60 s stale-lock
    // takeover for a holder that dies mid-section. Simulate each kill
    // point as its durable on-disk state (stages + markers as far as the
    // holder got, plus its now-stale guard lock), then drive a REAL
    // checked commit from the survivor and assert the watermark advanced
    // exactly once — by whichever fold the protocol says must win.
    import org.apache.hadoop.fs.Path
    val fs = new Path(warehouse).getFileSystem(new org.apache.hadoop.conf.Configuration())
    def plantStaleGuardLock(): Unit = {
      // the dead holder's guard lock: withLock keys the commit guard at
      // `_txn/.stats.lock`; a live holder heartbeats its mtime, so a
      // 61 s-old file IS the crashed-holder state the takeover exists for
      val lock = new Path(s"$warehouse/_txn/.stats.lock")
      val out = fs.create(lock, true)
      try out.write("dead-holder-token".getBytes("UTF-8")) finally out.close()
      fs.setTimes(lock, System.currentTimeMillis() - 61000, -1)
    }
    def watermark(ns: String): Seq[Long] =
      spark.table(s"txc.$ns.wm").select("indexed_version")
        .collect().map(_.getLong(0)).toSeq.sorted
    import spark.implicits._
    def foldTxn(ns: String, rows: (Int, Int), mark: Long): Transactions.Txn = {
      val txn = Transactions.begin(spark, warehouse)
      txn.write(s"txc.$ns.d", batch(rows._1, rows._2))
      txn.write(s"txc.$ns.wm", Seq(mark).toDF("indexed_version"))
      txn.precondition(s"txc.$ns.wm empty (single-maintainer)") {
        spark.table(s"txc.$ns.wm").count() == 0
      }
      txn
    }
    // K1/K2 — died after converge / after its precondition passed, before
    // writeIntent (durably identical: nothing written yet); K3 — died
    // after writeIntent, before decide; K4 — died after decide, before
    // complete. One namespace per arm.
    for ((arm, ns) <- Seq("K1-after-converge" -> "k1",
        "K2-after-precheck" -> "k2", "K3-after-intent" -> "k3",
        "K4-after-decide" -> "k4")) {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS txc.$ns")
      spark.sql(s"CREATE TABLE txc.$ns.d (id BIGINT, s STRING)")
      spark.sql(s"CREATE TABLE txc.$ns.wm (indexed_version BIGINT)")
      val dead = foldTxn(ns, (0, 5), mark = 7L)
      arm match {
        case "K1-after-converge" => Transactions.recover(spark, warehouse,
          minAgeMillis = Long.MaxValue) // its converge ran; nothing staged beyond
        case "K2-after-precheck" => () // read-only check passed; no durable step
        case "K3-after-intent" => dead.writeIntent()
        case "K4-after-decide" => dead.writeIntent(); dead.decide()
      }
      plantStaleGuardLock()
      def survivor(): Unit = Transactions.run(spark, warehouse) { txn =>
        txn.write(s"txc.$ns.d", batch(100, 103))
        txn.write(s"txc.$ns.wm", Seq(7L).toDF("indexed_version"))
        txn.precondition(s"txc.$ns.wm empty (single-maintainer)") {
          spark.table(s"txc.$ns.wm").count() == 0
        }
      }
      if (arm == "K4-after-decide") {
        // the dead holder already COMMITTED: the survivor's converge
        // must publish it first, then its own precondition fails benignly
        intercept[Transactions.PreconditionFailed] { survivor() }
        assert(watermark(ns) == Seq(7L) &&
          spark.table(s"txc.$ns.d").count() == 5,
          s"$arm: the decided fold must win posthumously, exactly once")
      } else {
        // the dead holder never decided: the survivor takes the lock
        // over, leaves the undecided wreck alone (decided-only converge),
        // and commits ITS fold
        survivor()
        assert(watermark(ns) == Seq(7L) &&
          spark.table(s"txc.$ns.d").count() == 3,
          s"$arm: the survivor's fold must be the only one visible")
        // the wreck's stages are still discoverable and age-guarded;
        // startup recovery rolls them back without touching the winner
        Transactions.recover(spark, warehouse, minAgeMillis = 0)
        assert(watermark(ns) == Seq(7L) &&
          spark.table(s"txc.$ns.d").count() == 3,
          s"$arm: rollback of the wreck must not disturb the committed fold")
        assert(wapIds("d").isEmpty, s"$arm: no stage may linger")
      }
    }
  }

  test("replace: mixing a replace with another write to the SAME table is refused") {
    intercept[IllegalArgumentException] {
      Transactions.run(spark, warehouse) { txn =>
        txn.replace("txc.t.r", batch(0, 2))
        txn.write("txc.t.r", batch(5, 7))
      }
    }
    intercept[IllegalArgumentException] {
      Transactions.run(spark, warehouse) { txn =>
        txn.write("txc.t.r", batch(5, 7))
        txn.replace("txc.t.r", batch(0, 2))
      }
    }
    assert(spark.table("txc.t.r").select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(950L, 951L), "refused transactions must leave no trace")
  }

  test("vacuum retains the coordinator-HEAD version: a pinned serve racing a " +
      "vacuum still resolves its cut") {
    spark.sql("CREATE TABLE txc.t.vh (id BIGINT, s STRING)")
    Transactions.run(spark, warehouse) { txn =>
      txn.write("txc.t.vh", batch(0, 5))
    }
    val dir = s"$warehouse/t/vh"
    val headV = Transactions.headVersions(warehouse)(dir)
    assert(Transactions.headPinnedVersion(dir).contains(headV))
    // advance the table PAST the head entry outside any transaction, so
    // the pinned version is no longer the live head (the vacuum-victim
    // position)
    spark.sql("INSERT INTO txc.t.vh VALUES (100, 'post-txn')")
    spark.sql("INSERT INTO txc.t.vh VALUES (101, 'post-txn')")
    // retain=1 + zero age guard would expire every non-live manifest —
    // EXCEPT the coordinator-HEAD pin
    Snapshots.vacuum(dir, retain = 1, minAgeMillis = 0L)
    val pinned = spark.read.option("snapshot-version", headV).table("txc.t.vh")
    assert(pinned.count() == 5L,
      s"head-pinned snapshot v$headV must survive vacuum")
  }

  test("a LockTimeout thrown INSIDE a checked commit's body propagates — the " +
      "guard retry covers acquisition only, never re-entry after the check ran") {
    spark.sql("CREATE TABLE txc.t.lt (id BIGINT, s STRING)")
    val checks = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[graft.sources.TableStats.LockTimeout] {
      Transactions.run(spark, warehouse) { txn =>
        txn.write("txc.t.lt", batch(0, 3))
        txn.precondition("simulated nested lock timeout") {
          checks.incrementAndGet()
          throw new graft.sources.TableStats.LockTimeout("nested lock busy")
        }
      }
    }
    assert(e.getMessage.contains("nested lock busy"))
    assert(checks.get() == 1,
      "a body LockTimeout must NOT re-enter the guarded section " +
        s"(check ran ${checks.get()} times)")
    assert(count("lt") == 0, "the failed commit must leave no rows")
  }

  test("staged CREATE OR REPLACE purges the coordinator HEAD exactly like DROP") {
    spark.sql("CREATE TABLE txc.t.rep (id BIGINT, s STRING)")
    Transactions.run(spark, warehouse) { txn =>
      txn.write("txc.t.rep", batch(0, 4))
    }
    val dir = s"$warehouse/t/rep"
    assert(Transactions.headVersions(warehouse).contains(dir))
    spark.sql(
      "CREATE OR REPLACE TABLE txc.t.rep AS " +
        "SELECT CAST(1 AS BIGINT) AS id, 'fresh' AS s")
    assert(!Transactions.headVersions(warehouse).contains(dir),
      "the recreated table's restarted version counter would sit below a " +
        "surviving head entry forever — serves would pin it to EMPTY")
    assert(count("rep") == 1)
  }

  test("withLock serializes SAME-JVM committers: local-FS create is a " +
      "non-atomic exists-then-create, so without in-process serialization " +
      "two driver threads can both enter and mint one snapshot version") {
    val dd = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("graft_lockham").toString, "data")
    val fs = dd.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.mkdirs(dd)
    val f = new org.apache.hadoop.fs.Path(dd, "counter")
    def readN(): Long =
      if (!fs.exists(f)) 0L
      else {
        val in = fs.open(f)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      }
    val threads = (1 to 8).map(_ => new Thread(() =>
      for (_ <- 1 to 25) graft.sources.TableStats.withLock(fs, dd) {
        val n = readN()
        // widen the read-modify-write window past the TOCTOU gap
        Thread.sleep(1)
        val out = fs.create(f, true)
        try out.write((n + 1).toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(readN() == 200L,
      s"lost updates under withLock: ${readN()} of 200 increments survived")
  }
}
