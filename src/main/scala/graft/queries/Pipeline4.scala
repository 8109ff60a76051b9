package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.FreqSketchAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 pipeline widening: mergeable heavy-hitters sketching, RAG-style
  * document chunking, and the deterministic epoch-shuffle that fixes a
  * training run's data order. All bounded-shuffle shapes — the sketch
  * moves O(partitions × capacity) rows, chunking is scan-linear, and the
  * shuffle orders within hash shards (never a single global window).
  */
object Pipeline4 {

  val defs: Seq[QueryDef] = Seq(

    // ---- q149: corpus heavy hitters via a mergeable Misra-Gries sketch --
    // Top tokens over the corpus WITHOUT a token-cardinality shuffle:
    // [[FreqSketchAgg]] folds each partition into a ≤capacity-entry
    // summary map-side, merges summaries (one-row shuffle), and the
    // top-10 falls out of the merged summary. Capacity 64 ≥ the corpus
    // vocabulary puts this run in the sketch's EXACTNESS REGIME (no
    // decrement ever fires — see FreqSketchAgg's scaladoc), so the
    // DuckDB oracle can replay it as exact counts; the sub-capacity
    // approximation guarantees are FreqSketchSpec's job. At 100 TB the
    // same plan stands with capacity ~1e5: the shuffle stays
    // O(partitions × capacity) however skewed or large the vocabulary.
    QueryDef(
      "q149_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val toks = t.documents
          .select(explode(split(col("text"), " ")).as("token"))
          .as[String]
        toks.select(FreqSketchAgg(64).toColumn.name("summary"))
          .select(explode(col("summary")).as(Seq("token", "cnt")))
          .orderBy(desc("cnt"), col("token"))
          .limit(10)
      },
      Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY cnt DESC, token LIMIT 10""")),

    // ---- q150: RAG-style document chunking (fixed window + overlap) -----
    // Split every document into 120-char windows advancing by an 80-char
    // stride (40-char overlap) — the retrieval/embedding prep step.
    // Chunk COUNT is integer-exact ((max(n_chars-120,0)+79) div 80 extra
    // chunks after the first, so the last window always reaches the end
    // of the document), offsets are pure row-local arithmetic, and the
    // per-chunk digest is the engine-portable md5 hash — so the whole
    // expansion replays bit-for-bit on any engine or partitioning.
    // Scan-linear: sequence+explode inside the projection, one aggregate;
    // no shuffle until the per-source rollup. At 100 TB this is the shape
    // that feeds the embedding stage: chunks stream out of the scan.
    QueryDef(
      "q150_chunking",
      (s, dir) => {
        val t = Tables(s, dir)
        val hash = QueryDef.md5Long60("chunk")
        t.documents
          .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
          .withColumn("i",
            explode(sequence(lit(0L), expr("(greatest(n_chars - 120, 0L) + 79) div 80"))))
          .withColumn("chunk", expr("substring(text, cast(i * 80 + 1 as int), 120)"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(length(col("chunk"))).cast("long").as("chunk_chars"),
            sum(expr(s"$hash % 1000000007")).cast("long").as("digest"))
          .orderBy(col("source"))
      },
      Some {
        val hex15 = QueryDef.duckMd5Long60("md5(chunk)")
        """WITH idx AS (
          SELECT source, text,
                 unnest(generate_series(0, (greatest(n_chars - 120, 0) + 79) // 80)) AS i
          FROM documents),
        c AS (
          SELECT source, substr(text, i * 80 + 1, 120) AS chunk FROM idx)
        SELECT source, COUNT(*) AS n_chunks,
               CAST(SUM(length(chunk)) AS BIGINT) AS chunk_chars,
               CAST(SUM((HASH15) % 1000000007) AS BIGINT) AS digest
        FROM c GROUP BY source ORDER BY source""".replace("HASH15", hex15)
      }),

    // ---- q151: deterministic epoch shuffle (hash shards + in-shard rank) -
    // The data-order step of a reproducible training run: for each epoch,
    // every document is assigned a SHARD by a salted hash (row-local, no
    // shuffle skew — epoch in the salt means re-shuffling between epochs)
    // and ordered within its shard by the same hash. The global read
    // order is (shard, position): a pure function of (doc_id, epoch),
    // reproducible on any engine, partitioning, or cluster size — rerun
    // the job, get the same batches. At 100 TB: shard count scales with
    // the cluster (here 8), each in-shard sort is 1/shards of the data,
    // and there is NO single global-order window anywhere. The checksum
    // sum(pos * doc_id) pins the entire permutation per (epoch, shard).
    QueryDef(
      "q151_epoch_shuffle",
      (s, dir) => {
        val t = Tables(s, dir)
        val epochs = Seq(1, 2).map { e =>
          val h = QueryDef.md5Long60(
            s"concat('shuffle:$e:', cast(doc_id as string))")
          t.documents.select(
            lit(e).as("epoch"), col("doc_id"), expr(h).as("h"))
        }.reduce(_ unionAll _)
        val w = Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("h"), col("doc_id"))
        epochs
          .withColumn("shard", pmod(col("h"), lit(8)).cast("int"))
          .withColumn("pos", row_number().over(w).cast("long"))
          .groupBy(col("epoch"), col("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("pos") * col("doc_id")).cast("long").as("order_checksum"),
            min(col("doc_id")).as("min_doc"))
          .orderBy(col("epoch"), col("shard"))
      },
      Some {
        val hex15 = QueryDef.duckMd5Long60(
          "md5('shuffle:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))")
        s"""WITH e AS (
          SELECT epoch, doc_id, ($hex15) AS h
          FROM documents CROSS JOIN (VALUES (1), (2)) AS ep(epoch)),
        r AS (
          SELECT epoch, doc_id, h, CAST(h % 8 AS INTEGER) AS shard,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY epoch, h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos
          FROM e)
        SELECT epoch, shard, COUNT(*) AS n_docs,
               CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum,
               MIN(doc_id) AS min_doc
        FROM r GROUP BY epoch, shard ORDER BY epoch, shard"""
      }),

    // ---- q152: bloom-indexed point lookup on an unclustered column ------
    // The needle-in-a-haystack gate for [[graft.sources.BloomIndex]]: the
    // corpus lands in 8 commits INTERLEAVED by doc_id % 8, so every
    // file's [min, max] spans the whole id domain and range disproof can
    // never skip a file — the layout where a point lookup otherwise
    // reads the entire table. With `index.bloom.columns = doc_id`, each
    // commit's registry entry carries a per-file bitset and the IN-list
    // lookup plans only the files whose blooms might hold a probed id
    // (BloomIndexSpec counter-asserts the skip; this gate proves values).
    // At 100 TB: the driver disproves files from metadata it already
    // holds — a point lookup is O(matching files), not O(table).
    QueryDef(
      "q152_bloom_lookup",
      (s, dir) => {
        val ns = Engine.ensureCatalog(s, dir)
        s.sql(
          s"""SELECT doc_id, lang, source, n_chars FROM $ns.bloomdocs
             |WHERE doc_id IN (7, 123, 200, 301) ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id IN (7, 123, 200, 301) ORDER BY doc_id"""),
      setup = Some((s, dir) => {
        val ns = Engine.ensureCatalog(s, dir)
        s.sql(s"DROP TABLE IF EXISTS $ns.bloomdocs")
        s.sql(
          s"""CREATE TABLE $ns.bloomdocs
             |(doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT)
             |TBLPROPERTIES ('index.bloom.columns' = 'doc_id')""".stripMargin)
        for (r <- 0 until 8) s.sql(
          s"""INSERT INTO $ns.bloomdocs
             |SELECT doc_id, lang, source, n_chars
             |FROM parquet.`$dir/documents.parquet` WHERE doc_id % 8 = $r""".stripMargin)
        ()
      })),

    // ---- q153: top principal component via distributed power iteration --
    // The PCA direction of the embedding space (drift monitoring, whitening
    // prep, intrinsic-dimension probes) WITHOUT ever materializing the
    // 64×64 covariance or collecting the corpus: each power-iteration step
    // is one per-row dot product with the broadcast current vector plus one
    // per-dimension aggregate — cov·v = Σ_x (x−m)((x−m)·v) folded
    // distributively, O(corpus × dims) per round, model-sized (64-row)
    // state between rounds. Two unrolled rounds from the all-ones start;
    // INTEGER-EXACT quantization throughout (elements at 1e6, the round-1
    // vector re-quantized at 1e3, round-2 accumulation in decimal(38,0))
    // so partial-aggregation order cannot change a bit and DuckDB replays
    // the whole recursion. Output: the direction in exact integer ppm.
    QueryDef(
      "q153_power_iteration",
      (s, dir) => {
        val t = Tables(s, dir)
        val c0 = t.embeddings.select(
          col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        val m = c0.groupBy(col("pos"))
          .agg(sum(expr("round(x * 1e6)")).as("qsum"), count(lit(1)).as("n"))
        val c = c0.join(broadcast(m), "pos")
          .select(col("vec_id"), col("pos"),
            expr("cast(round((x - (qsum / n) / 1e6) * 1e6) as long)").as("q"))
        val d1 = c.groupBy(col("vec_id")).agg(sum(col("q")).as("d"))
        val w1 = c.join(d1, "vec_id").groupBy(col("pos"))
          .agg(sum(col("d") * col("q")).as("w"))
        val n1 = w1.agg(
          expr("sqrt(sum(cast(w as double) * cast(w as double)))").as("nrm"))
        val v1 = w1.crossJoin(broadcast(n1))
          .select(col("pos"), expr("cast(round(w / nrm * 1000) as long)").as("vq"))
        val d2 = c.join(broadcast(v1), "pos").groupBy(col("vec_id"))
          .agg(sum(col("q") * col("vq")).as("d2"))
        val w2 = c.join(d2, "vec_id").groupBy(col("pos"))
          .agg(sum(expr("cast(d2 as decimal(38, 0)) * q")).as("w"))
        val n2 = w2.agg(
          expr("sqrt(sum(cast(w as double) * cast(w as double)))").as("nrm"))
        w2.crossJoin(broadcast(n2))
          .select(col("pos"),
            expr("cast(round(cast(w as double) / nrm * 1e6) as long)").as("v_ppm"))
          .orderBy(col("pos"))
      },
      Some("""WITH c0 AS (
          SELECT vec_id, CAST(p.i AS INT) AS pos,
                 CAST(embedding[p.i + 1] AS DOUBLE) AS x
          FROM embeddings CROSS JOIN (SELECT CAST(i AS BIGINT) AS i
                                      FROM range(0, 64) t(i)) p),
        m AS (SELECT pos, SUM(round(x * 1e6)) AS qsum, COUNT(*) AS n
              FROM c0 GROUP BY pos),
        c AS (SELECT vec_id, c0.pos,
                     CAST(round((x - (qsum / n) / 1e6) * 1e6) AS BIGINT) AS q
              FROM c0 JOIN m ON m.pos = c0.pos),
        d1 AS (SELECT vec_id, CAST(SUM(q) AS BIGINT) AS d FROM c GROUP BY vec_id),
        w1 AS (SELECT pos, CAST(SUM(d * q) AS BIGINT) AS w
               FROM c JOIN d1 USING (vec_id) GROUP BY pos),
        n1 AS (SELECT sqrt(SUM(CAST(w AS DOUBLE) * CAST(w AS DOUBLE))) AS nrm
               FROM w1),
        v1 AS (SELECT pos, CAST(round(w / nrm * 1000) AS BIGINT) AS vq
               FROM w1, n1),
        d2 AS (SELECT vec_id, CAST(SUM(q * vq) AS BIGINT) AS d2
               FROM c JOIN v1 USING (pos) GROUP BY vec_id),
        w2 AS (SELECT pos, SUM(CAST(d2 AS HUGEINT) * CAST(q AS HUGEINT)) AS w
               FROM c JOIN d2 USING (vec_id) GROUP BY pos),
        n2 AS (SELECT sqrt(SUM(CAST(w AS DOUBLE) * CAST(w AS DOUBLE))) AS nrm
               FROM w2)
        SELECT pos, CAST(round(CAST(w AS DOUBLE) / nrm * 1e6) AS BIGINT) AS v_ppm
        FROM w2, n2 ORDER BY pos""")))
}
