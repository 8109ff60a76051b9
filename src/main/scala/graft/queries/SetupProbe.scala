package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 measurement aid (guide §1: measure first): times the PHASES of
  * the expensive bench fixtures — the whole-corpus fts2 seed and the ann3
  * seed — so setup optimization targets facts, not guesses. Prints one
  * `PROBE <label> <seconds>` line per phase to stdout. Not part of any
  * gate; safe to run repeatedly (uses throwaway namespaces).
  */
object SetupProbe {
  private def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    graft.sources.FastLocalFileSystem.install() // before any file:// use
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    spark.range(0, 1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()

    val s = spark
    Engine.ensureCatalog(s, dir)
    val ns2 = "gcat.probefts"
    t("total:fts2-seed") {
      t("fts2: CREATE NAMESPACE")(s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.probefts"))
      t("fts2: fts2Create (12 DDL)")(Engine3.fts2Create(s, ns2, withRowKey = true))
      t("fts2: src append") {
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").cast("string").as("row_key"),
            col("doc_id"), col("text"))
          .writeTo(s"$ns2.fts2_src").append()
      }
      val v1 = t("fts2: srcVersion")(Engine3.fts2SrcVersion(s, ns2))
      val seed = s.read.option("since-version", 0L)
        .option("snapshot-version", v1).table(s"$ns2.fts2_src")
        .select(col("doc_id"), col("text"))
      t("fts2: fold (4-write txn)")(Engine3.fts2Fold(s, ns2, seed, v1))
    }
    // second run: same phases warm (plan caches, JIT)
    val ns3 = "gcat.probefts2"
    t("total:fts2-seed-warm") {
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.probefts2")
      t("fts2w: fts2Create")(Engine3.fts2Create(s, ns3, withRowKey = true))
      t("fts2w: src append") {
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").cast("string").as("row_key"),
            col("doc_id"), col("text"))
          .writeTo(s"$ns3.fts2_src").append()
      }
      val v1 = t("fts2w: srcVersion")(Engine3.fts2SrcVersion(s, ns3))
      val seed = s.read.option("since-version", 0L)
        .option("snapshot-version", v1).table(s"$ns3.fts2_src")
        .select(col("doc_id"), col("text"))
      t("fts2w: fold")(Engine3.fts2Fold(s, ns3, seed, v1))
    }
    // fold decomposition: the three frames, computed but written to noop
    t("fts2: tokenize+post (noop)") {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val toks = Engine3.fts2Tokenize(docs)
      toks.select(col("doc_id"), col("dl"), explode(col("sp")).as("tok"))
        .groupBy(col("tok"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).cast("long").as("tf"))
        .repartitionByRange(1, col("tok"))
        .sortWithinPartitions(col("tok"), col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    t("fts2: tokenize+pos (noop)") {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val toks = Engine3.fts2Tokenize(docs)
      toks.select(col("doc_id"), posexplode(col("sp")).as(Seq("pos", "tok")))
        .repartitionByRange(1, col("tok"))
        .sortWithinPartitions(col("tok"), col("doc_id"), col("pos"))
        .write.format("noop").mode("overwrite").save()
    }
    // ann3 seed
    t("total:ann3-seed")(Engine2.ann3Seed(s, "gcat.probeann", dir))
    t("total:ann3-seed-warm")(Engine2.ann3Seed(s, "gcat.probeann2", dir))
    // mutate+fold phases (mirrors ann3MutateAndFold exactly)
    locally {
      val ns2 = "gcat.probeann2"
      val v1 = s.table(s"$ns2.ann3_meta")
        .agg(max(col("indexed_version"))).first().getLong(0)
      t("ann3: DELETE %7=3")(s.sql(s"DELETE FROM $ns2.ann3_src WHERE vec_id % 7 = 3"))
      t("ann3: UPDATE %7=5")(s.sql(
        s"UPDATE $ns2.ann3_src SET v = abs(v) WHERE vec_id % 7 = 5 AND v < 0"))
      val v2 = t("ann3: liveVersion") {
        val wh = s.conf.get("spark.sql.catalog.gcat.warehouse")
        val dd = new org.apache.hadoop.fs.Path(s"$wh/probeann2/ann3_src/data")
        val fsys = dd.getFileSystem(new org.apache.hadoop.conf.Configuration())
        graft.sources.TableStats.liveVersion(fsys, dd).get
      }
      val cat = s.sessionState.catalogManager.catalog("gcat")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("probeann2"), "ann3_src")).asInstanceOf[graft.sources.GraftTable]
      val feed = t("ann3: changes plan")(graft.sources.Snapshots.changes(s, tbl,
        since = v1, end = Some(v2), hydrateMor = true))
      t("ann3: foldFeed")(Engine2.ann3FoldFeed(s, ns2, feed, v2))
    }
    // fts2 mutation phases (mirrors the q171-family setup tail)
    locally {
      val ns2 = "gcat.probefts2"
      val v1 = s.table(s"$ns2.fts2_meta")
        .agg(max(col("indexed_version"))).first().getLong(0)
      t("fts2: DELETE %9=4")(s.sql(s"DELETE FROM $ns2.fts2_src WHERE doc_id % 9 = 4"))
      t("fts2: UPDATE %9=5")(s.sql(
        s"""UPDATE $ns2.fts2_src SET text = concat(text, ' recrawled')
           |WHERE doc_id % 9 = 5 AND text NOT LIKE '%recrawled'""".stripMargin))
      val v2 = Engine3.fts2SrcVersion(s, ns2)
      val cat = s.sessionState.catalogManager.catalog("gcat")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("probefts2"), "fts2_src")).asInstanceOf[graft.sources.GraftTable]
      val feed = graft.sources.Snapshots.changes(s, tbl, since = v1, end = Some(v2))
      t("fts2: foldFeed")(Engine3.fts2FoldFeed(s, ns2, s"$ns2.fts2_src", feed, v1, v2))
    }
    // pure txn-protocol overhead: a 4-table transaction of 1-row writes
    locally {
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.probetxn")
      Engine3.fts2Create(s, "gcat.probetxn")
      val coord = s.conf.get("spark.sql.catalog.gcat.warehouse")
      t("txn: 4x 1-row write+commit") {
        graft.sources.Transactions.run(s, coord) { txn =>
          txn.write("gcat.probetxn.fts2_post",
            s.range(1).selectExpr("'a' tok", "id doc_id", "id tf", "id dl", "id rev"))
          txn.write("gcat.probetxn.fts2_pos",
            s.range(1).selectExpr("'a' tok", "id doc_id", "id pos", "id rev"))
          txn.write("gcat.probetxn.fts2_glob", s.range(1).selectExpr("id nd", "id sl"))
          txn.write("gcat.probetxn.fts2_meta", s.range(1).selectExpr("id indexed_version"))
        }
      }
      t("txn: 1x 1-row write+commit") {
        graft.sources.Transactions.run(s, coord) { txn =>
          txn.write("gcat.probetxn.fts2_meta", s.range(1).selectExpr("id indexed_version"))
        }
      }
      t("plain: 1-row append")(
        s.range(1).selectExpr("id nd", "id sl").writeTo("gcat.probetxn.fts2_glob").append())
    }
    spark.stop()
  }
}
