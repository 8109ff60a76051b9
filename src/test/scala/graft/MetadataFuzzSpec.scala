package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.Snapshots

/** Model-based fuzz of the metadata layer: a seeded random sequence of
  * table operations (append, row-level DELETE/UPDATE, INSERT OVERWRITE,
  * RESTORE, OPTIMIZE) runs against both mutation modes while an
  * in-memory `Map[row_key, v]` tracks the expected state. After every
  * operation the live table, the registry-first COUNT(*), and (at the
  * end) every recorded snapshot must replay the model exactly — any
  * divergence anywhere in the commit/snapshot/delta/delete-file
  * machinery surfaces as a mismatch with the seed that reproduces it.
  *
  * This is the randomized counterpart of the targeted specs
  * (SnapshotSpec, MergeOnReadSpec, CrashSpec): those pin known edge
  * cases; this one walks operation interleavings nobody thought to
  * write down — compaction between a restore and a delete, an
  * overwrite landing on top of merge-on-read delete files, etc.
  */
class MetadataFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft_fuzz_wh").toString

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

  private def runFuzz(tbl: String, mor: Boolean, seed: Long, steps: Int): Unit = {
    val full = s"graft.fuzz.$tbl"
    val tableDir = s"$warehouse/fuzz/$tbl"
    val dataDir = new Path(s"$tableDir/data")
    val fs = fsOf(dataDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fuzz")
    val props =
      if (mor) " TBLPROPERTIES ('write.mutation.mode' = 'merge-on-read')" else ""
    spark.sql(s"CREATE TABLE $full (row_key STRING, v BIGINT)$props")

    val rnd = new scala.util.Random(seed)
    var model = Map.empty[String, Long]
    var nextKey = 0L
    // recorded live version -> expected state at that version
    val history = scala.collection.mutable.LinkedHashMap[Long, Map[String, Long]]()

    def freshRows(n: Int): Seq[(String, Long)] =
      (0 until n).map { _ =>
        val k = s"k$nextKey"; nextKey += 1
        k -> rnd.nextInt(1000).toLong
      }
    def values(rows: Seq[(String, Long)]): String =
      rows.map { case (k, v) => s"('$k', $v)" }.mkString(", ")
    def inList(ks: Seq[String]): String = ks.map(k => s"'$k'").mkString(", ")

    def capture(): Unit = {
      val v = Snapshots.list(fs, dataDir).lastOption.map(_._1).getOrElse(0L)
      if (v > 0) history(v) = model
    }
    def checkLive(op: String): Unit = {
      val got = spark.table(full).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == model,
        s"live state diverged after $op (seed=$seed): " +
          s"missing=${(model.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- model.keySet).take(5)} " +
          s"changed=${model.keySet.intersect(got.keySet)
            .filter(k => model(k) != got(k)).take(5)}")
      assert(spark.sql(s"SELECT COUNT(*) FROM $full").head().getLong(0)
        == model.size.toLong, s"COUNT(*) after $op (seed=$seed)")
    }

    for (step <- 1 to steps) {
      val op = rnd.nextInt(10)
      val desc = op match {
        case 0 | 1 | 2 | 3 =>
          val rows = freshRows(1 + rnd.nextInt(4))
          spark.sql(s"INSERT INTO $full VALUES ${values(rows)}")
          model ++= rows
          s"step $step INSERT ${rows.size}"
        case 4 | 5 =>
          val victims = model.keys.filter(_ => rnd.nextInt(4) == 0).toSeq.sorted
          if (victims.nonEmpty) {
            spark.sql(s"DELETE FROM $full WHERE row_key IN (${inList(victims)})")
            model --= victims
          }
          s"step $step DELETE ${victims.size}"
        case 6 =>
          val targets = model.keys.filter(_ => rnd.nextInt(3) == 0).toSeq.sorted
          if (targets.nonEmpty) {
            spark.sql(
              s"UPDATE $full SET v = v + 1000 WHERE row_key IN (${inList(targets)})")
            model ++= targets.map(k => k -> (model(k) + 1000L))
          }
          s"step $step UPDATE ${targets.size}"
        case 7 =>
          if (history.nonEmpty) {
            val (v, st) = history.toSeq(rnd.nextInt(history.size))
            Snapshots.restore(tableDir, v)
            model = st
            s"step $step RESTORE v$v"
          } else s"step $step RESTORE skipped"
        case 8 =>
          spark.sql(s"OPTIMIZE $full") // rows must not change
          s"step $step OPTIMIZE"
        case 9 =>
          val rows = freshRows(1 + rnd.nextInt(3))
          spark.sql(s"INSERT OVERWRITE $full VALUES ${values(rows)}")
          model = rows.toMap
          s"step $step OVERWRITE ${rows.size}"
      }
      capture()
      checkLive(desc)
    }

    // every recorded version must replay its captured state
    history.foreach { case (v, st) =>
      val got = spark.sql(s"SELECT row_key, v FROM $full VERSION AS OF $v")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == st, s"VERSION AS OF $v diverged (seed=$seed)")
    }

    // vacuum bounds history without harming the live table or the
    // snapshots it retains
    Snapshots.vacuum(tableDir, retain = 3, minAgeMillis = 0L)
    checkLive("vacuum")
    Snapshots.list(fs, dataDir).map(_._1).filter(history.contains).foreach { v =>
      val got = spark.sql(s"SELECT row_key, v FROM $full VERSION AS OF $v")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == history(v), s"post-vacuum VERSION AS OF $v diverged (seed=$seed)")
    }
    spark.sql(s"DROP TABLE $full")
  }

  /** Clone-interleaving fuzz: a source table and (at most one) live
    * shallow clone evolve under independent random mutations while
    * VACUUM hammers the source — the clone must stay byte-exact to its
    * own model through every interleaving (pin tags protecting cloned
    * snapshots, ext-key resolution under COW rewrites, OPTIMIZE
    * reification, re-clone after drop). */
  private def runCloneFuzz(tbl: String, mor: Boolean, seed: Long, steps: Int): Unit = {
    val full = s"graft.fuzz.$tbl"
    val cloneFull = s"graft.fuzz.${tbl}_c"
    val tableDir = s"$warehouse/fuzz/$tbl"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fuzz")
    val props =
      if (mor) " TBLPROPERTIES ('write.mutation.mode' = 'merge-on-read')" else ""
    spark.sql(s"CREATE TABLE $full (row_key STRING, v BIGINT)$props")

    val rnd = new scala.util.Random(seed)
    var modelM = Map.empty[String, Long]
    var modelC: Option[Map[String, Long]] = None
    var nextKey = 0L
    def freshRows(n: Int): Seq[(String, Long)] =
      (0 until n).map { _ =>
        val k = s"k$nextKey"; nextKey += 1
        k -> rnd.nextInt(1000).toLong
      }
    def values(rows: Seq[(String, Long)]): String =
      rows.map { case (k, v) => s"('$k', $v)" }.mkString(", ")
    def inList(ks: Seq[String]): String = ks.map(k => s"'$k'").mkString(", ")
    def check(t: String, model: Map[String, Long], op: String): Unit = {
      val got = spark.table(t).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == model, s"$t diverged after $op (seed=$seed): " +
        s"missing=${(model.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- model.keySet).take(5)}")
    }

    // seed rows so the first clone is never empty
    val init = freshRows(6)
    spark.sql(s"INSERT INTO $full VALUES ${values(init)}")
    modelM ++= init

    for (step <- 1 to steps) {
      val op = rnd.nextInt(10)
      val desc = op match {
        case 0 | 1 =>
          val rows = freshRows(1 + rnd.nextInt(4))
          spark.sql(s"INSERT INTO $full VALUES ${values(rows)}")
          modelM ++= rows
          s"step $step INSERT-src ${rows.size}"
        case 2 =>
          val victims = modelM.keys.filter(_ => rnd.nextInt(4) == 0).toSeq.sorted
          if (victims.nonEmpty) {
            spark.sql(s"DELETE FROM $full WHERE row_key IN (${inList(victims)})")
            modelM --= victims
          }
          s"step $step DELETE-src ${victims.size}"
        case 3 =>
          // (re-)clone: the new clone captures the CURRENT source state
          if (modelC.isDefined) spark.sql(s"DROP TABLE $cloneFull")
          spark.sql(s"CREATE TABLE $cloneFull SHALLOW CLONE $full")
          modelC = Some(modelM)
          s"step $step CLONE"
        case 4 | 5 =>
          modelC match {
            case Some(mc) =>
              val rows = freshRows(1 + rnd.nextInt(3))
              spark.sql(s"INSERT INTO $cloneFull VALUES ${values(rows)}")
              modelC = Some(mc ++ rows)
              s"step $step INSERT-clone ${rows.size}"
            case None => s"step $step INSERT-clone skipped"
          }
        case 6 =>
          modelC match {
            case Some(mc) =>
              val victims = mc.keys.filter(_ => rnd.nextInt(3) == 0).toSeq.sorted
              if (victims.nonEmpty) {
                spark.sql(
                  s"DELETE FROM $cloneFull WHERE row_key IN (${inList(victims)})")
                modelC = Some(mc -- victims)
              }
              s"step $step DELETE-clone ${victims.size}"
            case None => s"step $step DELETE-clone skipped"
          }
        case 7 =>
          if (modelC.isDefined) { spark.sql(s"OPTIMIZE $cloneFull"); s"step $step REIFY" }
          else { spark.sql(s"OPTIMIZE $full"); s"step $step OPTIMIZE-src" }
        case 8 | 9 =>
          // hammer the source's retention: pinned cloned snapshots (and
          // everything the live chain needs) must survive
          Snapshots.vacuum(tableDir, retain = 1, minAgeMillis = 0L)
          s"step $step VACUUM-src"
      }
      check(full, modelM, desc)
      modelC.foreach(mc => check(cloneFull, mc, desc))
    }
    // teardown order matters: the pinned source refuses to drop first
    if (modelC.isDefined) {
      intercept[Exception](spark.sql(s"DROP TABLE $full"))
      spark.sql(s"DROP TABLE $cloneFull")
    }
    spark.sql(s"DROP TABLE $full")
  }

  test("copy-on-write table: random op sequences match the model (seed 101)") {
    runFuzz("cow1", mor = false, seed = 101L, steps = 22)
  }

  test("copy-on-write table: random op sequences match the model (seed 202)") {
    runFuzz("cow2", mor = false, seed = 202L, steps = 22)
  }

  test("merge-on-read table: random op sequences match the model (seed 303)") {
    runFuzz("mor1", mor = true, seed = 303L, steps = 22)
  }

  test("clone fuzz: source + clone under interleaved mutations/vacuum (seed 404)") {
    runCloneFuzz("clf1", mor = false, seed = 404L, steps = 20)
  }

  test("clone fuzz: merge-on-read source + clone (seed 505)") {
    runCloneFuzz("clf2", mor = true, seed = 505L, steps = 20)
  }
}
