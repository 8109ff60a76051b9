package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Equality-delete files — the merge-on-read half of row-level mutations
  * (the copy-on-write half is [[GraftRowLevelOperation]]).
  *
  * A merge-on-read DELETE/UPDATE/MERGE does not rewrite the data files
  * holding the matched rows; it writes small sorted key lists under
  * `data/_deletes/` naming the `row_key`s that no longer exist, and
  * registers them in the same `_stats.tsv` manifest as data files. Scans
  * apply them at read time: a delete file with data sequence number D
  * (the snapshot version of its commit — see [[TableStats.Entry.seq]])
  * suppresses a row iff the row's key is listed AND the row's data file
  * entered the manifest at seq < D. Rows (re-)written at or after D —
  * including the inserts of the same MERGE — are untouched, so
  * re-inserting a deleted key behaves exactly like the copy-on-write
  * path.
  *
  * The 100 TB trade: a point DELETE costs one tiny side file instead of
  * rewriting every data file that holds a matched row; reads pay a
  * hash-probe per row until [[Compaction.compact]] folds outstanding
  * deletes into the rewritten files and drops the delete entries whose
  * every older data file is gone. Time travel is free — a pinned manifest
  * carries exactly the delete entries (and seqs) of its version.
  */
object GraftDeletes {

  /** Directory (under `data/`) holding delete files; doubles as the
    * rel-path marker distinguishing delete entries from data entries in
    * the manifest. */
  val Dir = "_deletes"

  /** Registry keys of equality-delete files — layout-relative, so a
    * cloned (`ext:`) delete entry classifies exactly like it did in its
    * source table. */
  def isDeleteRel(rel: String): Boolean =
    TableStats.layoutRel(rel).startsWith(Dir + "/")

  /** Table property selecting the row-level strategy: `copy-on-write`
    * (default — rewrite affected files) or `merge-on-read` (write
    * equality-delete files; requires a STRING `row_key` column). */
  val ModeProp = "write.mutation.mode"

  def mergeOnRead(props: Map[String, String]): Boolean =
    props.get(ModeProp).exists(_.trim.equalsIgnoreCase("merge-on-read"))

  private def enc(v: String): String = java.net.URLEncoder.encode(v, "UTF-8")
  private def dec(v: String): String = java.net.URLDecoder.decode(v, "UTF-8")

  /** Open a task-local delete fragment writer. Keys stream straight to
    * the file (one URL-encoded key per line) so a large predicate delete
    * never buffers its matches in task memory. The file name carries the
    * writeId + task identity: retried/speculative attempts never collide,
    * and commit/abort cleanup finds strays by writeId substring, same as
    * data part-files. */
  final class FragmentWriter(fs: FileSystem, dataDir: Path, writeId: String,
                             partitionId: Int, taskId: Long) {
    val rel = s"$Dir/del-$partitionId-$taskId-$writeId.tsv"
    private val path = new Path(dataDir, rel)
    private var out: org.apache.hadoop.fs.FSDataOutputStream = _
    private var count = 0L

    def add(key: String): Unit = {
      if (out == null) {
        fs.mkdirs(path.getParent)
        out = fs.create(path, true)
      }
      out.write(enc(key).getBytes(StandardCharsets.UTF_8))
      out.write('\n')
      count += 1
    }

    /** Close and return the manifest entry, or None if no key was ever
      * added (no fragment file was created). */
    def finish(): Option[(String, TableStats.Entry)] =
      if (out == null) None
      else {
        out.close()
        val len = fs.getFileStatus(path).getLen
        Some(rel -> TableStats.Entry(count, Map.empty, len))
      }

    def abort(): Unit = {
      if (out != null) { try out.close() catch { case _: Exception => () } }
      try fs.delete(path, false) catch { case _: Exception => () }
    }
  }

  /** Read one delete file's keys. Resolves `ext:` (cloned) entries to
    * their source-table path. */
  def readKeys(fs: FileSystem, dataDir: Path, rel: String): Seq[String] = {
    val in = fs.open(TableStats.pathOf(dataDir, rel))
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map(dec).toSeq
  }

  /** Fold a manifest's delete entries into (key -> max applicable seq):
    * a row in a file with seq S is deleted iff map(key) > S. Driver-side
    * — delete files are the small side by design (compaction bounds
    * their accretion), the corpus side never materializes. A session
    * cap (`spark.graft.deletes.max.bytes`, default 256 MB) fails loudly
    * when a mutation-heavy table has accreted more delete metadata than
    * the driver should carry: the fix is a compaction, not a silent
    * multi-GB task broadcast. */
  /** The session cap on delete metadata materialized driver-side
    * (`spark.graft.deletes.max.bytes`, default 256 MB) — shared by the
    * scan's [[keyMap]] and both CDC feeds. */
  def byteCap(): Long =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.deletes.max.bytes",
        String.valueOf(256L * 1024 * 1024)).toLong
    catch { case _: Exception => 256L * 1024 * 1024 }

  def keyMap(fs: FileSystem, dataDir: Path,
             manifest: Map[String, TableStats.Entry]): Map[String, Long] = {
    val cap = byteCap()
    val total = manifest.iterator.collect {
      case (rel, e) if isDeleteRel(rel) => math.max(e.bytes, 0L)
    }.sum
    if (total > cap) throw new IllegalStateException(
      s"graft: $dataDir carries $total bytes of outstanding equality " +
        s"deletes (> cap $cap); run Compaction.compact (or OPTIMIZE) to " +
        "fold them into the data, or raise spark.graft.deletes.max.bytes")
    val out = scala.collection.mutable.HashMap[String, Long]()
    manifest.foreach { case (rel, e) =>
      if (isDeleteRel(rel))
        readKeys(fs, dataDir, rel).foreach { k =>
          val prev = out.getOrElse(k, Long.MinValue)
          if (e.seq > prev) out(k) = e.seq
        }
    }
    out.toMap
  }
}
