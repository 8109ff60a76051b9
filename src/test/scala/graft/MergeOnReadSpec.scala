package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.{Compaction, GraftDeletes, Snapshots, TableStats}

/** Merge-on-read row-level mutations: equality-delete files with data
  * sequence numbers instead of copy-on-write rewrites
  * (`write.mutation.mode = merge-on-read`). Verifies the full lifecycle —
  * delete without rewriting data files, update, re-insert of a deleted
  * key, seq-scoped visibility, time travel, pushdown withholding, and
  * compaction folding the deletes back in.
  */
class MergeOnReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_mor").toString

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

  private def dataDir(table: String): Path =
    new Path(s"$warehouse/mor/$table/data")
  private def fs = dataDir("x").getFileSystem(new Configuration())

  private def dataFiles(table: String): Set[String] =
    TableStats.read(fs, dataDir(table)).keySet.filterNot(GraftDeletes.isDeleteRel)
  private def deleteFiles(table: String): Set[String] =
    TableStats.read(fs, dataDir(table)).keySet.filter(GraftDeletes.isDeleteRel)

  private def rows(table: String): Seq[(String, Long)] =
    spark.sql(s"SELECT row_key, v FROM graft.mor.$table ORDER BY row_key")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  private var preMutationVersion: Long = _

  test("DELETE writes a delete file; data files are untouched") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql(
      s"""CREATE TABLE graft.mor.t (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.t VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT INTO graft.mor.t VALUES ('c', 3), ('d', 4)")
    preMutationVersion = Snapshots.list(fs, dataDir("t")).last._1
    val before = dataFiles("t")
    assert(before.size >= 2)

    spark.sql("DELETE FROM graft.mor.t WHERE v = 2 OR v = 3")
    assert(dataFiles("t") == before,
      "merge-on-read DELETE must not add/remove/rewrite data files")
    assert(deleteFiles("t").nonEmpty, "expected an equality-delete file")
    assert(rows("t") == Seq(("a", 1L), ("d", 4L)))
    // count goes through the real scan (pushdown withheld), stays exact
    assert(spark.sql("SELECT COUNT(*) FROM graft.mor.t").head().getLong(0) == 2)
  }

  test("re-inserting a deleted key is visible (seq scoping)") {
    spark.sql("INSERT INTO graft.mor.t VALUES ('b', 20)")
    assert(rows("t") == Seq(("a", 1L), ("b", 20L), ("d", 4L)),
      "a row written after the delete must escape it")
  }

  test("UPDATE keeps the key and changes the value in place") {
    spark.sql("UPDATE graft.mor.t SET v = v + 100 WHERE row_key = 'a'")
    assert(rows("t") == Seq(("a", 101L), ("b", 20L), ("d", 4L)))
    // the update wrote a delta, not a rewrite: original files still live
    assert(dataFiles("t").size >= 3)
  }

  test("MERGE INTO routes matched updates and unmatched inserts") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW src AS SELECT * FROM VALUES" +
      " ('b', 1000L), ('e', 5L) AS t(row_key, v)")
    spark.sql(
      """MERGE INTO graft.mor.t t USING src s ON t.row_key = s.row_key
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows("t") == Seq(("a", 101L), ("b", 1000L), ("d", 4L), ("e", 5L)))
  }

  test("time travel sees the pre-mutation state") {
    val v2 = spark.sql("SELECT row_key, v FROM graft.mor.t" +
      s" VERSION AS OF $preMutationVersion ORDER BY row_key")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v2 == Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
  }

  test("compaction folds deletes in and drops the delete entries") {
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("mor"), "t")).asInstanceOf[graft.sources.GraftTable]
    assert(deleteFiles("t").nonEmpty)
    val (before, after) = Compaction.compact(spark, table)
    assert(before > 0 && after > 0)
    assert(deleteFiles("t").isEmpty,
      "compaction must drop delete entries it folded in")
    assert(rows("t") == Seq(("a", 101L), ("b", 1000L), ("d", 4L), ("e", 5L)),
      "contents must be identical after the fold")
    // with no outstanding deletes the registry-first COUNT(*) is back:
    // exact and zero-listing
    assert(spark.sql("SELECT COUNT(*) FROM graft.mor.t").head().getLong(0) == 4)
  }

  test("vacuum reclaims dropped delete files") {
    Snapshots.vacuum(s"$warehouse/mor/t", retain = 1, minAgeMillis = 0)
    val it = fs.listFiles(dataDir("t"), true)
    var orphanDeletes = 0
    while (it.hasNext) {
      val p = it.next().getPath
      if (GraftDeletes.isDeleteRel(TableStats.relOf(p.toString))) orphanDeletes += 1
    }
    assert(orphanDeletes == 0, "expired delete files should be vacuumed")
    assert(rows("t") == Seq(("a", 101L), ("b", 1000L), ("d", 4L), ("e", 5L)))
  }

  test("incremental read refuses to cross a merge-on-read mutation") {
    spark.sql(
      s"""CREATE TABLE graft.mor.inc (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.inc VALUES ('a', 1), ('b', 2)")
    spark.sql("DELETE FROM graft.mor.inc WHERE row_key = 'a'")
    spark.sql("INSERT INTO graft.mor.inc VALUES ('c', 3)")
    val e = intercept[Exception] {
      spark.read.format("graft").option("since-version", "1")
        .load(s"$warehouse/mor/inc").collect()
    }
    assert(e.getMessage.contains("merge-on-read"),
      s"expected the non-append refusal, got: ${e.getMessage}")
  }

  private def load(name: String) = spark.sessionState.catalogManager.catalog("graft")
    .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("mor"), name)).asInstanceOf[graft.sources.GraftTable]

  test("change feed replays MOR deletes AND copy-on-write rewrites") {
    // inc: INSERT (a,b) → MOR DELETE a → INSERT c
    val feed = Snapshots.changes(spark, load("inc"), since = 0L)
      .select("_change_type", "row_key").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(feed == Seq(("delete", "a"), ("insert", "a"), ("insert", "b"),
      ("insert", "c")), s"unexpected feed: $feed")
    // versions are monotone and MOR deletes carry NULL data columns
    val delRow = Snapshots.changes(spark, load("inc"), since = 0L)
      .filter("_change_type = 'delete'").collect().head
    assert(delRow.isNullAt(delRow.fieldIndex("v")))
    // a COW DELETE rewrote files in mor.cow2 — the commit recorded its
    // per-row delta, so the feed replays it WITH the full preimage
    // (the engine's default mutation mode is CDC-capable)
    spark.sql("CREATE TABLE graft.mor.cow2 (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.cow2 VALUES ('a', 1), ('b', 2)")
    spark.sql("DELETE FROM graft.mor.cow2 WHERE v = 1")
    val cowFeed = Snapshots.changes(spark, load("cow2"), since = 0L)
      .select("_change_type", "row_key", "v").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(cowFeed == Seq(("delete", "a", 1L), ("insert", "a", 1L),
      ("insert", "b", 2L)), s"unexpected COW feed: $cowFeed")
  }

  test("change feed pairs same-commit delete+rewrite into update images") {
    // merge-on-read UPDATE: the commit writes a delete key AND the new
    // row — the feed pairs them instead of surfacing delete+insert
    spark.sql(
      s"""CREATE TABLE graft.mor.updp (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.updp VALUES ('a', 1), ('b', 2)")
    spark.sql("UPDATE graft.mor.updp SET v = 100 WHERE row_key = 'a'")
    val feed = Snapshots.changes(spark, load("updp"), since = 1L)
      .select("_change_type", "row_key", "v").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(feed == Seq(("update_postimage", "a", 100L),
      ("update_preimage", "a", -1L)), s"unexpected paired feed: $feed")
    // COW UPDATE records FULL pre/post images (values on both sides)
    spark.sql("CREATE TABLE graft.mor.updc (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.updc VALUES ('a', 1), ('b', 2)")
    spark.sql("UPDATE graft.mor.updc SET v = 100 WHERE row_key = 'a'")
    val cfeed = Snapshots.changes(spark, load("updc"), since = 1L)
      .select("_change_type", "row_key", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(cfeed == Seq(("update_postimage", "a", 100L),
      ("update_preimage", "a", 1L)), s"unexpected COW update feed: $cfeed")
  }

  test("hydrated change feed recovers full MOR preimages from the prior snapshot") {
    spark.sql(
      s"""CREATE TABLE graft.mor.hyd (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.hyd VALUES ('a', 1), ('b', 2)")
    spark.sql("UPDATE graft.mor.hyd SET v = 100 WHERE row_key = 'a'")
    spark.sql("DELETE FROM graft.mor.hyd WHERE row_key = 'b'")
    def feed(h: Boolean) =
      Snapshots.changes(spark, load("hyd"), since = 1L, hydrateMor = h)
        .select("_change_type", "row_key", "v", "_commit_version").collect()
        .map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).sorted.toSeq
    // unhydrated: preimage/delete rows carry NULL data columns (echoed keys)
    assert(feed(false) == Seq(("delete", "b", -1L, 3L),
      ("update_postimage", "a", 100L, 2L), ("update_preimage", "a", -1L, 2L)),
      s"unexpected raw feed: ${feed(false)}")
    // hydrated: the SAME rows with real prior values — the update's
    // preimage reads v=1 from snapshot 1, the delete's preimage v=2 from
    // snapshot 2 (each commit hydrates against ITS OWN prior snapshot,
    // so the earlier update must not bleed into the later delete)
    assert(feed(true) == Seq(("delete", "b", 2L, 3L),
      ("update_postimage", "a", 100L, 2L), ("update_preimage", "a", 1L, 2L)),
      s"unexpected hydrated feed: ${feed(true)}")
  }

  test("change feed replays truncate/overwrite as deletes, skips compaction") {
    spark.sql("CREATE TABLE graft.mor.repl (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.repl VALUES ('a', 1)")
    spark.sql("INSERT INTO graft.mor.repl VALUES ('b', 2)")
    // compaction between commits: a maintenance version the feed skips
    graft.sources.Compaction.compact(spark, load("repl"), smallBytes = Long.MaxValue)
    spark.sql("INSERT OVERWRITE graft.mor.repl VALUES ('c', 3)")
    val feed = Snapshots.changes(spark, load("repl"), since = 0L)
      .select("_change_type", "row_key", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(feed == Seq(("delete", "a", 1L), ("delete", "b", 2L),
      ("insert", "a", 1L), ("insert", "b", 2L), ("insert", "c", 3L)),
      s"unexpected replace feed: $feed")
  }

  test("change feed refuses to cross a RESTORE") {
    spark.sql("CREATE TABLE graft.mor.rst (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.rst VALUES ('a', 1)")
    val v1 = Snapshots.list(fs, dataDir("rst")).last._1
    spark.sql("INSERT INTO graft.mor.rst VALUES ('b', 2)")
    Snapshots.restore(s"$warehouse/mor/rst", v1)
    val e = intercept[IllegalStateException](
      Snapshots.changes(spark, load("rst"), since = 0L).collect())
    assert(e.getMessage.contains("RESTORE"), e.getMessage)
  }

  test("delta commit aborts when a concurrent mutation landed deletes") {
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationInfo}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    spark.sql(
      s"""CREATE TABLE graft.mor.conf (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.conf VALUES ('a', 1), ('b', 2)")
    val tbl = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("mor"), "conf")).asInstanceOf[graft.sources.GraftTable]
    val empty = new CaseInsensitiveStringMap(java.util.Map.of())
    val info = new RowLevelOperationInfo {
      override def command(): RowLevelOperation.Command = RowLevelOperation.Command.DELETE
      override def options(): CaseInsensitiveStringMap = empty
    }
    val op = tbl.newRowLevelOperationBuilder(info).build()
      .asInstanceOf[graft.sources.GraftDeltaOperation]
    // the operation's scan plans against the CURRENT manifest (baseline)
    op.newScanBuilder(empty).build().asInstanceOf[graft.sources.GraftScan]
      .toBatch.planInputPartitions()
    // ...then a concurrent merge-on-read mutation lands its delete file
    spark.sql("DELETE FROM graft.mor.conf WHERE v = 1")
    val writeInfo = new LogicalWriteInfo {
      override def queryId(): String = "conflict-test"
      override def schema(): org.apache.spark.sql.types.StructType = tbl.schema()
      override def options(): CaseInsensitiveStringMap = empty
    }
    val e = intercept[IllegalStateException] {
      op.newWriteBuilder(writeInfo).build().toBatch
        .commit(Array.empty)
    }
    assert(e.getMessage.contains("lost a race"), e.getMessage)
    // the conflicting statement itself is durable, the aborted one is not
    assert(spark.sql("SELECT row_key FROM graft.mor.conf").collect()
      .map(_.getString(0)).toSeq == Seq("b"))
  }

  test("COUNT(*)/LIMIT pushdown withheld while deletes outstanding") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val tbl = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("mor"), "conf")).asInstanceOf[graft.sources.GraftTable]
    val empty = new CaseInsensitiveStringMap(java.util.Map.of())
    val countStar = new Aggregation(
      Array(new CountStar()),
      Array.empty[org.apache.spark.sql.connector.expressions.Expression])
    def builder() = tbl.newScanBuilder(empty)
      .asInstanceOf[graft.sources.GraftScanBuilder]
    // outstanding deletes (from the conflict test's DELETE): withheld
    assert(!builder().pushAggregation(countStar),
      "COUNT(*) pushdown must be withheld while equality deletes are outstanding")
    // after compaction folds them in: offered again
    graft.sources.Compaction.compact(spark, tbl)
    assert(deleteFiles("conf").isEmpty)
    assert(builder().pushAggregation(countStar),
      "COUNT(*) pushdown should return once deletes are folded in")
  }

  test("streaming source refuses outstanding MOR deletes, resumes after fold") {
    spark.sql(
      s"""CREATE TABLE graft.mor.str (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.str VALUES ('a', 1), ('b', 2)")
    spark.sql("DELETE FROM graft.mor.str WHERE v = 1")
    val ckpt = java.nio.file.Files.createTempDirectory("mor_stream").toString
    val q = spark.readStream.table("graft.mor.str").writeStream
      .format("memory").queryName("mor_stream_t")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(e.getMessage.contains("merge-on-read") ||
      Option(e.getCause).exists(_.getMessage.contains("merge-on-read")),
      s"expected the MOR refusal, got: ${e.getMessage}")
    // fold the deletes in; a fresh stream then drains the table
    val tbl = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("mor"), "str")).asInstanceOf[graft.sources.GraftTable]
    Compaction.compact(spark, tbl)
    val ckpt2 = java.nio.file.Files.createTempDirectory("mor_stream2").toString
    val q2 = spark.readStream.table("graft.mor.str").writeStream
      .format("memory").queryName("mor_stream_t2")
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.table("mor_stream_t2").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq == Seq(("b", 2L)))
  }

  test("streaming change feed: inserts + MOR deletes as a continuous CDC stream") {
    spark.sql(
      s"""CREATE TABLE graft.mor.feed (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.feed VALUES ('a', 1), ('b', 2)")
    spark.sql("DELETE FROM graft.mor.feed WHERE row_key = 'a'")
    spark.sql("INSERT INTO graft.mor.feed VALUES ('c', 3)")
    val ckpt = java.nio.file.Files.createTempDirectory("mor_feed").toString
    val outDir = java.nio.file.Files.createTempDirectory("mor_feed_out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("change-feed", "true")
        .load(s"$warehouse/mor/feed")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    def feed(): Seq[(String, String, Long)] = spark.read.parquet(outDir)
      .select("_change_type", "row_key", "_commit_version").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._3, x._1, x._2)).toSeq
    val f1 = feed()
    assert(f1.map(x => (x._1, x._2)) ==
      Seq(("insert", "a"), ("insert", "b"), ("delete", "a"), ("insert", "c")),
      s"unexpected feed: $f1")
    // versions are strictly increasing across the three commits
    assert(f1.map(_._3).distinct.size == 3)
    // a restart from the checkpoint sees only NEW commits
    spark.sql("INSERT INTO graft.mor.feed VALUES ('d', 4)")
    drain()
    val f2 = feed()
    assert(f2.size == f1.size + 1 && f2.map(_._2).contains("d"),
      s"restart must resume from the checkpointed version: $f2")
  }

  test("foreachBatch + hydrated batch feed maintains a streaming aggregate replica") {
    // the streaming change feed can't hydrate inside its partitions (its
    // offsets ARE the hydration anchor) — the streaming-consumer pattern
    // is: let the stream deliver each micro-batch's exact version range,
    // then re-read that range through the HYDRATED batch feed for full
    // MOR preimages. This maintains a downstream per-group aggregate
    // through deletes with no NULL-preimage guesswork — the streaming
    // spelling of the MV cdc repair.
    spark.sql(
      s"""CREATE TABLE graft.mor.hfb (row_key STRING, g STRING, x BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.hfb VALUES ('a','g1',1), ('b','g1',2), ('c','g2',3)")
    spark.sql("DELETE FROM graft.mor.hfb WHERE row_key = 'b'")
    spark.sql("UPDATE graft.mor.hfb SET x = 30 WHERE row_key = 'c'")
    val replica = scala.collection.mutable.Map[String, (Long, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("mor_hfb").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("change-feed", "true")
        .load(s"$warehouse/mor/hfb")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val vs = df.select("_commit_version").distinct()
            .collect().map(_.getLong(0))
          if (vs.nonEmpty) {
            val hyd = Snapshots.changes(spark, load("hfb"),
              since = vs.min - 1, end = Some(vs.max), hydrateMor = true)
              .select("_change_type", "g", "x").collect()
            hyd.foreach { r =>
              val w = if (r.getString(0) == "insert" ||
                r.getString(0) == "update_postimage") 1L else -1L
              val (c, s) = replica.getOrElse(r.getString(1), (0L, 0L))
              replica(r.getString(1)) =
                (c + w, s + (if (r.isNullAt(2)) 0L else w * r.getLong(2)))
            }
          }
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    def base: Map[String, (Long, Long)] = spark
      .sql("SELECT g, count(*), sum(x) FROM graft.mor.hfb GROUP BY g")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(replica.filter(_._2._1 > 0).toMap === base, s"replica=$replica")
    // more commits; the checkpoint resumes from the recorded version and
    // the replica folds ONLY the new range
    spark.sql("INSERT INTO graft.mor.hfb VALUES ('d','g2',4)")
    spark.sql("DELETE FROM graft.mor.hfb WHERE row_key = 'a'")
    drain()
    assert(replica.filter(_._2._1 > 0).toMap === base, s"replica=$replica")
  }

  test("estimateStatistics subtracts outstanding equality deletes") {
    spark.sql(
      s"""CREATE TABLE graft.mor.st (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.st VALUES ('a', 1), ('b', 2), ('c', 3), ('d', 4)")
    spark.sql("DELETE FROM graft.mor.st WHERE v <= 2")
    val scan = load("st").newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())).build()
    val stats = scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    // 4 registered rows, 2 outstanding delete keys: CBO sees 2, not 4
    assert(stats.numRows().getAsLong == 2L, s"numRows=${stats.numRows()}")
    assert(stats.sizeInBytes().getAsLong > 0L)
  }

  test("streaming change feed crosses a copy-on-write commit") {
    spark.sql("CREATE TABLE graft.mor.sfc (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.sfc VALUES ('a', 1), ('b', 2)")
    spark.sql("DELETE FROM graft.mor.sfc WHERE v = 1") // COW delete
    val ckpt = java.nio.file.Files.createTempDirectory("cow_feed").toString
    val q = spark.readStream.format("graft")
      .option("change-feed", "true")
      .load(s"$warehouse/mor/sfc")
      .writeStream.format("memory").queryName("cow_feed_t")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("cow_feed_t")
      .select("_change_type", "row_key", "v").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(got == Seq(("delete", "a", 1L), ("insert", "a", 1L),
      ("insert", "b", 2L)), s"unexpected streamed COW feed: $got")
  }

  test("copy-on-write stays the default path") {
    spark.sql("CREATE TABLE graft.mor.cow (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.cow VALUES ('a', 1), ('b', 2)")
    spark.sql("DELETE FROM graft.mor.cow WHERE v = 1")
    assert(deleteFiles("cow").isEmpty, "COW must not write delete files")
    assert(spark.sql("SELECT row_key FROM graft.mor.cow").collect()
      .map(_.getString(0)).toSeq == Seq("b"))
  }

  test("streaming change feed pairs same-commit delete+rewrite into update images") {
    // the streaming spelling of the update-pairing test: exercises the
    // plan-time semi-join that resolves re-inserted keys once (instead
    // of every key-slice task rescanning the commit's files) and the
    // broadcast key shipping
    spark.sql(
      s"""CREATE TABLE graft.mor.supd (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft.mor.supd VALUES ('a', 1), ('b', 2)")
    spark.sql("UPDATE graft.mor.supd SET v = 100 WHERE row_key = 'a'")
    val ckpt = java.nio.file.Files.createTempDirectory("supd_feed").toString
    val q = spark.readStream.format("graft")
      .option("change-feed", "true")
      .load(s"$warehouse/mor/supd")
      .writeStream.format("memory").queryName("supd_feed_t")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("supd_feed_t")
      .select("_change_type", "row_key", "v").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(got == Seq(("insert", "a", 1L), ("insert", "b", 2L),
      ("update_postimage", "a", 100L), ("update_preimage", "a", -1L)),
      s"unexpected streamed pairing: $got")
  }

  test("streaming change feed survives an offset that landed on a WAP stage") {
    // latestOffset takes the newest snapshot version, staged or not — a
    // checkpoint can therefore land ON an audit snapshot. The next
    // batch's baseline must rebase to the live chain: diffing against
    // the staged manifest would silently swallow the published rows
    // (or, after a DISCARD, surface phantom removals and fail forever).
    spark.sql("CREATE TABLE graft.mor.swap (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.swap VALUES ('a', 1)")
    val ckpt = java.nio.file.Files.createTempDirectory("swap_feed").toString
    val outDir = java.nio.file.Files.createTempDirectory("swap_feed_out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("change-feed", "true")
        .load(s"$warehouse/mor/swap")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def got(): Seq[(String, String)] = spark.read.parquet(outDir)
      .select("_change_type", "row_key").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    // stage, then drain: the offset advances onto the audit snapshot
    spark.createDataFrame(Seq(("b", 2L))).toDF("row_key", "v")
      .writeTo("graft.mor.swap").option("wap.id", "s1").append()
    drain()
    assert(got() == Seq(("insert", "a")), s"staged rows must not stream: ${got()}")
    // publish: the staged row must surface in the NEXT batch
    spark.sql("ALTER TABLE graft.mor.swap PUBLISH WAP 's1'")
    drain()
    assert(got() == Seq(("insert", "a"), ("insert", "b")),
      s"published rows were lost by a staged baseline: ${got()}")
    // stage again, drain (offset lands on the stage), DISCARD, commit on:
    // the stream must keep going and never see the discarded rows
    spark.createDataFrame(Seq(("c", 3L))).toDF("row_key", "v")
      .writeTo("graft.mor.swap").option("wap.id", "s2").append()
    drain()
    spark.sql("ALTER TABLE graft.mor.swap DISCARD WAP 's2'")
    spark.sql("INSERT INTO graft.mor.swap VALUES ('d', 4)")
    drain()
    assert(got() == Seq(("insert", "a"), ("insert", "b"), ("insert", "d")),
      s"stream must cross a discarded stage cleanly: ${got()}")
  }

  test("COW change recording survives an empty rewrite on a table with deletes") {
    // a rewrite whose predicate matched nothing still records its (empty)
    // diff — with pre-existing equality deletes this used to hit
    // reduce-on-empty in stageCowChanges
    import org.apache.spark.sql.connector.write.RowLevelOperation
    val staged = graft.sources.ChangeLog.stageCowChanges(
      spark, spark.table("graft.mor.t").schema, s"$warehouse/mor/t/data",
      oldFiles = Nil, newFiles = Nil,
      deleteKeys = Seq(("ghost", 1L)),
      command = RowLevelOperation.Command.DELETE,
      writeId = java.util.UUID.randomUUID().toString)
    assert(staged.isDefined, "empty rewrite must still stage a (empty) diff")
    staged.foreach(p => fs.delete(p, true))
  }

  test("estimateStatistics prorates deletes under partition pruning") {
    spark.sql(
      s"""CREATE TABLE graft.mor.stp (row_key STRING, grp STRING, v BIGINT)
         |PARTITIONED BY (grp)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("""INSERT INTO graft.mor.stp VALUES
      ('a1','a',1),('a2','a',2),('a3','a',3),('a4','a',4),
      ('b1','b',1),('b2','b',2),('b3','b',3),('b4','b',4)""")
    // 4 outstanding delete keys, all in partition a
    spark.sql("DELETE FROM graft.mor.stp WHERE row_key IN ('a1','a2','a3','a4')")
    val builder = load("stp").newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    builder.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(Array(org.apache.spark.sql.sources.EqualTo("grp", "b")))
    val stats = builder.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    // pruned scan: 4 gross rows of partition b; the table-wide 4 delete
    // keys are PRORATED by the pruned fraction (4/8 → 2), never
    // subtracted wholesale (which would collapse the scan to 0 rows and
    // bait the CBO into broadcasting it)
    assert(stats.numRows().getAsLong == 2L, s"numRows=${stats.numRows()}")
    assert(stats.sizeInBytes().getAsLong > 1L)
    // the unpruned scan still reports the exact net count
    val full = load("stp").newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())).build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(full.numRows().getAsLong == 4L, s"numRows=${full.numRows()}")
  }

  test("change feed across WAP: adds surface at publish, discarded stages never") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE TABLE graft.mor.wapf (row_key STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.mor.wapf VALUES ('a', 1)")
    val v0 = Snapshots.list(fs, dataDir("wapf")).last._1
    // stage + publish: the staged row must appear ONCE, at the PUBLISH
    // version (the audit snapshot between them is a side branch)
    spark.createDataFrame(Seq(("b", 2L))).toDF("row_key", "v")
      .writeTo("graft.mor.wapf").option("wap.id", "ok").append()
    spark.sql("ALTER TABLE graft.mor.wapf PUBLISH WAP 'ok'")
    val pubV = Snapshots.list(fs, dataDir("wapf")).last._1
    // stage + discard: must never appear
    spark.createDataFrame(Seq(("c", 3L))).toDF("row_key", "v")
      .writeTo("graft.mor.wapf").option("wap.id", "bad").append()
    spark.sql("ALTER TABLE graft.mor.wapf DISCARD WAP 'bad'")
    // a normal commit after all that
    spark.sql("INSERT INTO graft.mor.wapf VALUES ('d', 4)")
    val feed = Snapshots.changes(spark, load("wapf"), since = v0)
      .select("_change_type", "row_key", "_commit_version").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._2).toSeq
    assert(feed.map(t => (t._1, t._2)) == Seq(("insert", "b"), ("insert", "d")),
      s"unexpected WAP feed: $feed")
    assert(feed.head._3 == pubV, s"staged row attributed to v${feed.head._3}, not publish v$pubV")
    // restoring to an audit snapshot would silently publish — refused
    spark.createDataFrame(Seq(("e", 5L))).toDF("row_key", "v")
      .writeTo("graft.mor.wapf").option("wap.id", "pend").append()
    val auditV = Snapshots.tags(fs, dataDir("wapf"))(Snapshots.wapTag("pend"))
    val r = intercept[Exception](
      spark.sql(s"RESTORE TABLE graft.mor.wapf TO VERSION AS OF $auditV"))
    assert(r.getMessage.contains("AUDIT"))
    spark.sql("ALTER TABLE graft.mor.wapf DISCARD WAP 'pend'")
  }

  test("CDC apply: foreachBatch MERGE keeps a replica identical to the source") {
    spark.sql(
      s"""CREATE TABLE graft.mor.cdsrc (row_key STRING, v BIGINT)
         |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = 'merge-on-read')""".stripMargin)
    spark.sql("CREATE TABLE graft.mor.cdrep (row_key STRING, v BIGINT)")
    val ckpt = Files.createTempDirectory("cdc_apply").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("change-feed", "true")
        .load(s"$warehouse/mor/cdsrc")
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => graft.streaming.CdcApply.applyBatch(b, "graft.mor.cdrep"))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // backlog of FIVE commits drained as one batch: the reduction must
    // apply each key's LAST change — 'c' (inserted v2, deleted v5) must
    // not exist in the replica, 'a' must carry the updated value
    spark.sql("INSERT INTO graft.mor.cdsrc VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT INTO graft.mor.cdsrc VALUES ('c', 3)")
    spark.sql("UPDATE graft.mor.cdsrc SET v = 100 WHERE row_key = 'a'")
    spark.sql("DELETE FROM graft.mor.cdsrc WHERE row_key = 'b'")
    spark.sql("DELETE FROM graft.mor.cdsrc WHERE row_key = 'c'")
    drain()
    assert(rows("cdrep") == rows("cdsrc"), s"replica diverged after drain 1")
    assert(rows("cdrep") == Seq(("a", 100L)))
    // second drain resumes from the checkpoint: re-insert of a deleted
    // key, an update, and a fresh insert
    spark.sql("INSERT INTO graft.mor.cdsrc VALUES ('b', 20)")
    spark.sql("UPDATE graft.mor.cdsrc SET v = 200 WHERE row_key = 'a'")
    spark.sql("INSERT INTO graft.mor.cdsrc VALUES ('d', 4)")
    drain()
    assert(rows("cdrep") == rows("cdsrc"), s"replica diverged after drain 2")
    assert(rows("cdrep") == Seq(("a", 200L), ("b", 20L), ("d", 4L)))
    // idempotence under replay: re-applying the last batch's worth of
    // changes (the at-least-once failure mode) leaves the replica fixed
    val all = Snapshots.changes(spark, load("cdsrc"), since = 0L)
    graft.streaming.CdcApply.applyBatch(all, "graft.mor.cdrep")
    assert(rows("cdrep") == rows("cdsrc"), "replay must be a no-op")
    spark.sql("DROP TABLE graft.mor.cdsrc")
    spark.sql("DROP TABLE graft.mor.cdrep")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: full-sync on COW and MOR tables") {
    // the replica-sync MERGE shape: target rows absent from the source are
    // deleted in the same statement that updates/inserts the rest — one
    // keyed operation instead of MERGE + anti-join DELETE
    for ((mode, tbl) <- Seq("copy-on-write" -> "syncc", "merge-on-read" -> "syncm")) {
      spark.sql(s"""CREATE TABLE graft.mor.$tbl (row_key STRING, v BIGINT)
                   |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = '$mode')""".stripMargin)
      spark.sql(s"INSERT INTO graft.mor.$tbl SELECT concat('k', id), id FROM range(0, 10)")
      spark.range(5, 15).selectExpr("concat('k', id) AS row_key", "id * 10 AS v")
        .createOrReplaceTempView("sync_src")
      spark.sql(s"""MERGE INTO graft.mor.$tbl t USING sync_src s
                   |ON t.row_key = s.row_key
                   |WHEN MATCHED THEN UPDATE SET v = s.v
                   |WHEN NOT MATCHED THEN INSERT (row_key, v) VALUES (s.row_key, s.v)
                   |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(rows(tbl) == (5L until 15L).map(i => (s"k$i", i * 10)).sortBy(_._1),
        s"full-sync MERGE diverged on $mode")
      spark.sql(s"DROP TABLE graft.mor.$tbl")
    }
  }

  test("CDC apply: key-only targets and same-version insert+delete ties") {
    import spark.implicits._
    // a key-only replica (membership set): no value columns, so the MERGE
    // must not emit an empty `UPDATE SET` clause
    spark.sql("CREATE TABLE graft.mor.cdkeys (row_key STRING)")
    spark.sql("INSERT INTO graft.mor.cdkeys VALUES ('a'), ('b')")
    // malformed/foreign feed: key 'b' carries an UNPAIRED insert+delete at
    // the SAME version — the explicit priority must resolve to the delete
    // (lexicographic _change_type desc would pick insert and resurrect it)
    val batch = Seq(
      ("b", "insert", 7L), ("b", "delete", 7L),
      ("c", "insert", 7L),
      ("a", "update_preimage", 7L), ("a", "update_postimage", 7L))
      .toDF("row_key", "_change_type", "_commit_version")
    graft.streaming.CdcApply.applyBatch(batch, "graft.mor.cdkeys")
    assert(spark.table("graft.mor.cdkeys").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a", "c"), "delete must win the same-version tie")
    spark.sql("DROP TABLE graft.mor.cdkeys")
  }

  test("DedupIngest: streaming change feed keeps a deduped corpus + fp state") {
    // the continuous twin of the q143 batch gate: tail the ingest table's
    // change feed, classify each batch against the fingerprint state,
    // MERGE accepted docs + novel fingerprints — exactly-once corpus from
    // an at-least-once foreachBatch
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    spark.sql("CREATE TABLE graft.mor.ingest (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE graft.mor.accept (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE graft.mor.fps (fp STRING, keeper BIGINT)")
    val ckpt = Files.createTempDirectory("dedup_ingest").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("change-feed", "true")
        .load(s"$warehouse/mor/ingest")
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) => graft.streaming.DedupIngest.applyBatch(
          b, "graft.mor.fps", "graft.mor.accept"))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def accepted: Seq[(Long, String)] =
      spark.sql("SELECT doc_id, text FROM graft.mor.accept ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // batch 1: a within-batch dup (doc 3 repeats doc 1's text) — TWO
    // commits drained as ONE micro-batch; earliest doc_id owns the fp
    spark.sql("INSERT INTO graft.mor.ingest VALUES (1, 'aa'), (2, 'bb')")
    spark.sql("INSERT INTO graft.mor.ingest VALUES (3, 'aa')")
    drain()
    assert(accepted == Seq((1L, "aa"), (2L, "bb")), s"got $accepted")
    // batch 2: a dup against the STATE (doc 4 repeats 'bb') + a new doc
    spark.sql("INSERT INTO graft.mor.ingest VALUES (4, 'bb'), (5, 'cc')")
    drain()
    assert(accepted == Seq((1L, "aa"), (2L, "bb"), (5L, "cc")), s"got $accepted")
    assert(spark.table("graft.mor.fps").count() == 3)
    // batch 3: NULL text dedups under the sentinel fingerprint — one
    // keeper accepted, the state gains exactly one row, and a later NULL
    // doc is recognized as a dup of it
    spark.sql("INSERT INTO graft.mor.ingest VALUES (6, NULL), (7, NULL)")
    drain()
    assert(accepted == Seq((1L, "aa"), (2L, "bb"), (5L, "cc"), (6L, null)),
      s"got $accepted")
    assert(spark.table("graft.mor.fps").count() == 4)
    spark.sql("INSERT INTO graft.mor.ingest VALUES (8, NULL)")
    drain()
    assert(accepted.map(_._1) == Seq(1L, 2L, 5L, 6L), "NULL dup must be dropped")
    // batch 4: cross-commit dup where the LATER commit holds the LOWER
    // doc_id — the keeper must follow (_commit_version, doc_id), i.e. the
    // doc sequential per-commit processing would keep (batching-invariant),
    // not the batch-wide lowest id
    spark.sql("INSERT INTO graft.mor.ingest VALUES (10, 'zz')")
    spark.sql("INSERT INTO graft.mor.ingest VALUES (9, 'zz')")
    drain()
    assert(accepted.map(_._1) == Seq(1L, 2L, 5L, 6L, 10L),
      s"keeper must be the earlier COMMIT's doc, got ${accepted.map(_._1)}")
    assert(spark.sql("SELECT keeper FROM graft.mor.fps WHERE fp = md5('zz')")
      .collect().map(_.getLong(0)).toSeq == Seq(10L))
    // replay the FULL history (at-least-once failure mode): fixed point
    val all = Snapshots.changes(spark, load("ingest"), since = 0L)
    graft.streaming.DedupIngest.applyBatch(all, "graft.mor.fps", "graft.mor.accept")
    assert(accepted == Seq((1L, "aa"), (2L, "bb"), (5L, "cc"), (6L, null),
      (10L, "zz")), "replay must be a no-op")
    assert(spark.table("graft.mor.fps").count() == 5)
    Seq("ingest", "accept", "fps").foreach(t => spark.sql(s"DROP TABLE graft.mor.$t"))
  }

  test("a no-match mutation mints NO version (both modes); matching ones do") {
    // guarded per-run maintenance statements (q171/q172/q174 style
    // `WHERE ... AND <already-applied guard>`) re-run as no-matches —
    // minting a version for each would churn the chain and force every
    // incremental consumer (folds, feeds, maintainers) through an empty
    // interval per run. A no-op that passes the serializable race checks
    // commits NOTHING: no snapshot, no marker, no change dir.
    def liveV(t: String): Long = TableStats.liveVersion(fs, dataDir(t)).get
    for ((t, mode) <- Seq(("noopc", "copy-on-write"), ("noopm", "merge-on-read"))) {
      spark.sql(
        s"""CREATE TABLE graft.mor.$t (row_key STRING, v BIGINT)
           |TBLPROPERTIES ('${GraftDeletes.ModeProp}' = '$mode')""".stripMargin)
      spark.sql(s"INSERT INTO graft.mor.$t VALUES ('a', 1), ('b', 2)")
      val v0 = liveV(t)
      spark.sql(s"DELETE FROM graft.mor.$t WHERE v = 999")
      assert(liveV(t) == v0, s"$mode: no-match DELETE must not mint a version")
      spark.sql(s"UPDATE graft.mor.$t SET v = v + 1 WHERE v = 999")
      assert(liveV(t) == v0, s"$mode: no-match UPDATE must not mint a version")
      // and the table still answers correctly + a REAL mutation advances
      assert(spark.table(s"graft.mor.$t").count() == 2)
      spark.sql(s"DELETE FROM graft.mor.$t WHERE v = 1")
      assert(liveV(t) > v0, s"$mode: a matching DELETE must commit")
      assert(spark.table(s"graft.mor.$t").count() == 1)
    }
  }
}
