package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot history for graft tables — time travel and storage reclaim.
  *
  * Every successful commit (INSERT, truncate-overwrite, partition DELETE,
  * row-level COW, compaction swap, streaming epoch) rewrites the live
  * `_stats.tsv` registry under the table lock; [[TableStats.write]] also
  * records the new manifest as `<table>/_snapshots/v<N>.tsv`. Because data
  * files are immutable and replaced files are only REMOVED FROM THE
  * MANIFEST (never physically deleted by a commit — see the deferred
  * deletes in `GraftTable`/`GraftRowLevel`/`Compaction`), every recorded
  * manifest stays readable: `VERSION AS OF n` / `TIMESTAMP AS OF t` pin a
  * scan to a historical manifest with zero copies.
  *
  * Scale: a snapshot costs one small side file per commit, independent of
  * data size — the 100 TB cost model is identical to the registry itself.
  * [[vacuum]] bounds the history: it drops expired manifests and deletes
  * data files no retained manifest references (one recursive listing,
  * driver-side set difference on RELATIVE paths — O(#files) metadata, no
  * data movement).
  *
  * The reference has nothing comparable (HBase versioning is per-cell,
  * never exposed through its Spark layer); this is table-format behavior
  * the pipeline needs for reproducible training runs: a job can pin the
  * corpus version it was launched against while ingestion keeps
  * committing.
  */
object Snapshots {
  val Dir = "_snapshots"

  private def fmt(v: Long): String = f"v$v%09d.tsv"

  def snapDir(dataDir: Path): Path = new Path(dataDir.getParent, Dir)

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".tsv"))
      n.substring(1, n.length - 4).toLongOption
    else None
  }

  /** All recorded (version, commitTimeMillis), ascending by version. */
  def list(fs: FileSystem, dataDir: Path): Seq[(Long, Long)] = {
    val d = snapDir(dataDir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .flatMap(s => versionOf(s.getPath).map(_ -> s.getModificationTime))
      .sortBy(_._1)
  }

  /** Delta-encoded snapshot head line: `#delta\t<baseVersion>`. The body
    * is `-\t<rel>` removal lines and `+\t<registry line>` add/update
    * lines against the BASE snapshot's resolved manifest. Snapshots
    * without the header are full manifests (including every snapshot
    * written before deltas existed). */
  private[sources] val DeltaPrefix = "#delta\t"
  /** Longest allowed base chain before [[recordAt]] forces a full
    * checkpoint: bounds cold-resolution to ≤ this many small side-file
    * reads however many commits the table has seen. */
  private[sources] val MaxChainDepth = 16

  /** Process-wide cache of RESOLVED manifests, keyed by snapshot file
    * path and validated by (length, mtime): snapshot files are immutable
    * once renamed into place and vacuum retains every base of a retained
    * delta, so a matching stat proves the cached resolution — including
    * its whole base chain — is current. Bounded LRU (accessOrder). */
  private val resolveCache =
    new java.util.LinkedHashMap[String, (Long, Long, Int, Map[String, TableStats.Entry])](
        32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, Int, Map[String, TableStats.Entry])])
          : Boolean = size > 24
    }

  /** Drop every cached resolution under a table's snapshot dir. DROP
    * TABLE + CREATE TABLE reuses the same deterministic paths, and the
    * cache's (length, mtime) validation can collide across generations
    * (equal-length manifests within one mtime millisecond — common in
    * tight test loops), serving the OLD table's manifest to the new one.
    * The immutability assumption only holds within one table generation,
    * so the generation boundary must purge. */
  def invalidateCacheUnder(dataDir: Path): Unit =
    invalidateCachePrefix(snapDir(dataDir))

  /** Prefix form for whole-namespace deletes (cascade). */
  def invalidateCachePrefix(dir: Path): Unit = {
    val prefix = dir.toString + "/"
    resolveCache.synchronized {
      val it = resolveCache.keySet.iterator
      while (it.hasNext) if (it.next().startsWith(prefix)) it.remove()
    }
  }

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Resolve snapshot `v` to (full manifest, delta-chain depth); depth 0
    * = the file is a full manifest. None if the snapshot was never
    * recorded or expired; throws if `v` is a delta whose base is missing
    * (vacuum retains chain bases, so that is corruption, not expiry). */
  private def resolveWithDepth(fs: FileSystem, dataDir: Path, v: Long)
      : Option[(Map[String, TableStats.Entry], Int)] = {
    val p = new Path(snapDir(dataDir), fmt(v))
    val st =
      try fs.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val key = p.toString
    resolveCache.synchronized {
      val hit = resolveCache.get(key)
      if (hit != null && hit._1 == st.getLen && hit._2 == st.getModificationTime)
        return Some((hit._4, hit._3))
    }
    val text = readText(fs, p)
    val (m, d) =
      if (text.startsWith(DeltaPrefix)) {
        val nl = text.indexOf('\n')
        val base = text.substring(DeltaPrefix.length, if (nl < 0) text.length else nl)
          .trim.toLong
        val (bm, bd) = resolveWithDepth(fs, dataDir, base).getOrElse(
          throw new IllegalStateException(
            s"graft: snapshot v$v of $dataDir is a delta over missing base " +
              s"v$base — chain bases must outlive their deltas"))
        var acc = bm
        text.linesIterator.drop(1).filter(_.nonEmpty).foreach { line =>
          if (line.startsWith("-\t")) acc -= line.substring(2)
          else if (line.startsWith("+\t")) acc += TableStats.parseLine(line.substring(2))
          // header lines: validate the format revision, ignore unknown
          // headers (same forward-compat contract as full registries)
          else if (line.startsWith("#")) TableStats.checkHeader(line)
          else throw new IllegalStateException(s"graft: bad delta line in v$v: $line")
        }
        (acc, bd + 1)
      } else (TableStats.deserialize(text), 0)
    resolveCache.synchronized {
      resolveCache.put(key, (st.getLen, st.getModificationTime, d, m))
    }
    Some((m, d))
  }

  /** Read a file's first 64 bytes and parse the digits following the
    * first matching prefix — the shared primitive behind the registry
    * head pointer ([[TableStats.liveVersion]]) and the delta-base line
    * here. None on a missing/short/unprefixed head or I/O error. */
  /** Bounded retry for the LOCAL-FS artifact of an OVERWRITE rename
    * racing a read: ChecksumFileSystem swaps a file and its `.crc`
    * sidecar as TWO renames, so a reader squeezed between them gets
    * new-bytes-with-old-crc — a transient ChecksumException that would
    * otherwise either crash the reader or (worse, in readers that map
    * IOException to None) silently read as "no registry", demoting a
    * valid serve pin or misfiring a version probe. Hot under live
    * maintenance: serves read `_stats.tsv`/`versions.head` per query
    * while every fold commit rewrites them. HDFS renames atomically
    * (no sidecar), so this never fires there; a PERSISTENT checksum
    * error is real corruption and propagates after the retries. */
  private[sources] def withCrcRetry[T](body: => T): T = {
    def go(left: Int): T =
      try body catch {
        case _: org.apache.hadoop.fs.ChecksumException if left > 0 =>
          Thread.sleep(20); go(left - 1)
      }
    go(5)
  }

  private[sources] def readHeadDigits(
      fs: FileSystem, p: Path, prefixes: Seq[String]): Option[Long] =
    try withCrcRetry {
      val in = fs.open(p)
      val head = try new String(in.readNBytes(64), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      prefixes.collectFirst { case pre if head.startsWith(pre) =>
        head.substring(pre.length).takeWhile(_.isDigit)
      }.filter(_.nonEmpty).map(_.toLong)
    } catch { case _: java.io.IOException => None }

  /** The base version of snapshot `v`'s delta, or None for full
    * manifests / missing snapshots. Reads only the file's first bytes. */
  def baseOf(fs: FileSystem, dataDir: Path, v: Long): Option[Long] =
    readHeadDigits(fs, new Path(snapDir(dataDir), fmt(v)), Seq(DeltaPrefix))

  /** Delta-chain depth of snapshot `v` (0 = full manifest), or None. */
  def chainDepth(fs: FileSystem, dataDir: Path, v: Long): Option[Int] =
    resolveWithDepth(fs, dataDir, v).map(_._2)

  /** The manifest recorded as version `v`, or None if expired/unknown. */
  def read(fs: FileSystem, dataDir: Path, v: Long): Option[Map[String, TableStats.Entry]] =
    resolveWithDepth(fs, dataDir, v).map(_._1)

  /** Latest version committed at or before `tsMillis` (TIMESTAMP AS OF).
    * Only LIVE-CHAIN versions resolve: WAP stages and crashed-commit
    * orphans (Aborted-marked, or unmarked above the live head awaiting
    * the next committer's healing) hold rows that were never committed —
    * an implicit timestamp lookup must never surface them. */
  def latestAsOf(fs: FileSystem, dataDir: Path, tsMillis: Long): Option[Long] = {
    val head = TableStats.liveVersion(fs, dataDir)
    // lazy from the newest: the marker check (a side-file stat each) runs
    // only until the first live version, not across the whole history
    list(fs, dataDir).reverseIterator.find { case (v, ts) =>
      ts <= tsMillis && head.forall(v <= _) &&
        !ChangeLog.kindOf(fs, dataDir, v).exists(k =>
          k == ChangeLog.Staged || k == ChangeLog.Aborted)
    }.map(_._1)
  }

  /** Refuse a crashed commit's snapshot as readable/restorable history:
    * either healed (Aborted marker) or not yet (unmarked above the live
    * head — a live version can never exceed the head pointer, though a
    * commit IN FLIGHT sits there for the moments between its snapshot
    * record and pointer swap; the message covers both readings). WAP
    * stages (Staged marker) pass — the audit read is their purpose.
    * Shared by catalog time travel, the catalog-free snapshot options,
    * and RESTORE. */
  def requireLiveHistory(
      fs: FileSystem, dataDir: Path, version: Long, what: String): Unit = {
    val kind = ChangeLog.kindOf(fs, dataDir, version)
    if (kind.contains(ChangeLog.Aborted))
      throw new IllegalArgumentException(
        s"graft: v$version of $what is a crashed commit's aborted " +
          "snapshot — its rows were never committed")
    if (kind.isEmpty)
      TableStats.liveVersion(fs, dataDir).foreach(head =>
        require(version <= head,
          s"graft: v$version of $what is above the live head v$head with " +
            "no commit marker — either a commit still in flight (retry) " +
            "or an unhealed crashed commit; not readable history"))
  }

  /** The project's timestamp spellings, shared by `RESTORE ... TIMESTAMP
    * AS OF` and the catalog-free `option("snapshot-timestamp", ...)`:
    * an ISO instant, a local date-time (UTC — the pinned session zone),
    * or a bare date (UTC midnight). */
  def parseTsMillis(ts: String): Long =
    try java.time.Instant.parse(ts).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            java.time.LocalDate.parse(ts).atStartOfDay()
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        }
    }

  /** The newest LIVE-chain version at or below `v`: WAP audit snapshots
    * ([[stageWap]]) sit on the version sequence but are side branches —
    * a diff BASED on one already contains the staged files, so a feed
    * using it as its previous-manifest cursor would silently drop the
    * published rows (or, after a DISCARD, see phantom removals and fail
    * forever). Versions are contiguous (max+1 assignment), so walking
    * down is exact; marker reads are one side-file stat each. */
  def liveBaseline(fs: FileSystem, dataDir: Path, v: Long): Long = {
    def sideBranch(k: Option[ChangeLog.Kind]): Boolean =
      k.contains(ChangeLog.Staged) || k.contains(ChangeLog.Aborted)
    var b = v
    while (b > 0 && sideBranch(ChangeLog.kindOf(fs, dataDir, b)))
      b -= 1
    b
  }

  /** The manifest a scan should read: the pinned snapshot (`version`) or
    * the live registry, optionally reduced to the INCREMENTAL APPEND SCAN
    * `(since, version]` — only files added after snapshot `since`
    * (exclusive; 0 = from table creation). This is the change-feed a
    * 100 TB ingest pipeline tails: each poll reads only the files new
    * commits added, never rescanning the corpus.
    *
    * Incremental reads are exact only over append commits, so the range
    * is VERIFIED: every step in `(since, end]` is checked against the
    * snapshot log and a commit that removed manifest files (COW
    * DELETE/UPDATE, truncate, compaction swap) throws — rewritten files
    * would otherwise surface old rows as new. O(#versions in range)
    * side-file reads, no data I/O. Returns None only when the table has
    * no registry at all (out-of-band writes). */
  def readManifest(
      fs: FileSystem,
      dataDir: Path,
      version: Option[Long],
      since: Option[Long]): Option[Map[String, TableStats.Entry]] = {
    def readOrThrow(v: Long): Map[String, TableStats.Entry] =
      read(fs, dataDir, v).getOrElse(throw new IllegalArgumentException(
        s"graft: no snapshot v$v for $dataDir (never recorded, or expired by vacuum)"))
    val end = version match {
      case Some(v) => Some(readOrThrow(v))
      case None => TableStats.readIfExists(fs, dataDir)
    }
    since match {
      case None => end
      case Some(m) =>
        val endM = end.getOrElse(throw new IllegalArgumentException(
          s"graft: incremental read requires a stats registry under $dataDir"))
        // a `since` pinned to a WAP audit snapshot already contains the
        // staged files — rebase to the live chain so a later PUBLISH
        // surfaces them (and a DISCARD isn't a phantom removal)
        val base =
          if (m == 0) Map.empty[String, TableStats.Entry]
          else readOrThrow(liveBaseline(fs, dataDir, m))
        // live-registry reads walk to the LIVE head where known (an
        // unhealed crashed-commit orphan above it is not part of the
        // chain the endM registry represents)
        val endV = version.orElse(TableStats.liveVersion(fs, dataDir))
          .orElse(list(fs, dataDir).lastOption.map(_._1)).getOrElse(0L)
        require(m <= endV,
          s"graft: since-version $m is after the end version $endV")
        var prev = base.keySet
        for (v <- (m + 1) to endV)
          // a WAP audit snapshot — or an aborted (crashed-commit orphan)
          // one — is a side branch: skip it WITHOUT advancing prev (its
          // adds either surface at the publish version or never existed
          // on the live chain)
          if (ChangeLog.kindOf(fs, dataDir, v).exists(k =>
              k == ChangeLog.Staged || k == ChangeLog.Aborted)) ()
          // a vacuumed-away mid-range snapshot is skipped: the files it
          // removed (if any) still show up as a removal at the next
          // retained step, so the check stays sound
          else read(fs, dataDir, v).foreach { cur =>
            val removed = prev -- cur.keySet
            if (removed.nonEmpty) throw new IllegalArgumentException(
              s"graft: incremental read ($m, $endV] of $dataDir crosses a " +
                s"non-append commit at v$v (${removed.size} file(s) left the " +
                "manifest — COW delete/update, truncate, or compaction); " +
                "read a full snapshot instead")
            // a merge-on-read mutation ADDS an equality-delete file: the
            // commit is just as non-append (rows disappeared), it merely
            // expressed the removal as metadata — refuse the same way
            val addedDeletes = (cur.keySet -- prev).filter(GraftDeletes.isDeleteRel)
            if (addedDeletes.nonEmpty) throw new IllegalArgumentException(
              s"graft: incremental read ($m, $endV] of $dataDir crosses a " +
                s"merge-on-read mutation at v$v (${addedDeletes.size} delete " +
                "file(s) entered the manifest); read a full snapshot instead")
            prev = cur.keySet
          }
        Some(endM -- base.keySet)
    }
  }

  /** Every relative path any retained snapshot has recorded. A file on
    * disk but absent from BOTH the live registry and this set was never
    * registered (a crash between durability marker and registration); a
    * file absent from the registry but present here was REMOVED on
    * purpose (COW delete, truncate, compaction swap) and must not be
    * re-registered by recovery paths. O(#retained snapshots) side-file
    * reads — recovery-path cost, not query-path. */
  def everRecorded(fs: FileSystem, dataDir: Path): Set[String] = {
    val head = TableStats.liveVersion(fs, dataDir)
    list(fs, dataDir).iterator.filter { case (v, _) =>
      val kind = ChangeLog.kindOf(fs, dataDir, v)
      // an ABORTED commit's manifest — or its not-yet-healed shape, an
      // unmarked version above the live head — never published its
      // files: counting them as "recorded" would make crash-repair treat
      // an acked epoch's files as deliberately-removed tombstones and
      // drop the rows. Staged (WAP) versions stay included: their files
      // are pending, not removed.
      !kind.contains(ChangeLog.Aborted) &&
        (head.forall(v <= _) || kind.contains(ChangeLog.Staged))
    }.flatMap { case (v, _) =>
      read(fs, dataDir, v).map(_.keySet).getOrElse(Set.empty[String])
    }.toSet
  }

  /** The version the next commit will record. Race-free only under
    * [[TableStats.withLock]]. */
  def nextVersion(fs: FileSystem, dataDir: Path): Long =
    list(fs, dataDir).lastOption.map(_._1).getOrElse(0L) + 1

  /** Record `stats` as the next snapshot version. MUST be called under
    * [[TableStats.withLock]] (all callers are commit paths, which hold
    * it): max-version+1 is race-free only while the lock is held. */
  def record(fs: FileSystem, dataDir: Path, stats: Map[String, TableStats.Entry]): Long =
    recordAt(fs, dataDir, stats, nextVersion(fs, dataDir))

  /** [[record]] at a caller-chosen version — the caller computed
    * [[nextVersion]] itself (to stamp entry seqs with it) and must pass
    * the same value so entry seq == manifest version stays an invariant.
    *
    * With `base` set (the version whose resolved manifest the caller
    * derived `stats` from — the live head for commits and WAP stages),
    * the snapshot is written as a DELTA when that is smaller than the
    * full manifest: the commit's metadata write is then O(files touched).
    * Full checkpoints are forced when the chain would exceed
    * [[MaxChainDepth]] or the delta would not be smaller (e.g. truncate),
    * bounding resolution cost. */
  def recordAt(fs: FileSystem, dataDir: Path, stats: Map[String, TableStats.Entry],
               next: Long, base: Option[Long] = None): Long = {
    val d = snapDir(dataDir)
    fs.mkdirs(d)
    val resolvedBase = base.flatMap(b =>
      resolveWithDepth(fs, dataDir, b).map { case (m, depth) => (b, m, depth) })
    val (body, depth) = resolvedBase match {
      case Some((b, bm, bd)) if bd + 1 <= MaxChainDepth =>
        val removes = (bm.keySet -- stats.keySet).toSeq.sorted
        val adds = stats.toSeq.sortBy(_._1)
          .filter { case (r, e) => !bm.get(r).contains(e) }
        if (removes.size + adds.size < stats.size)
          // the base pointer stays the FIRST line (deltaBase reads only
          // head bytes). NO format-revision header in delta bodies:
          // pre-header delta parsers (unlike the full-manifest parser,
          // which always skipped '#') hard-throw on any '#' line, so a
          // header here would break every older binary on a
          // revision-UNCHANGED table — the exact break the contract
          // forbids. The revision is declared by the full checkpoint at
          // the chain's base; a future revision-N writer adds the header
          // to ITS deltas, where current readers (tolerant, see resolve)
          // refuse with the named error.
          ((Iterator(s"$DeltaPrefix$b") ++
            removes.iterator.map("-\t" + _) ++
            adds.iterator.map { case (r, e) => "+\t" + TableStats.serializeLine(r, e) })
            .mkString("", "\n", "\n"), bd + 1)
        else (TableStats.serialize(stats), 0)
      case _ => (TableStats.serialize(stats), 0)
    }
    // attempt-unique tmp (like the tags/registry writers): commit paths
    // hold the table lock, but a cross-process local-FS racer is only
    // best-effort excluded — with a SHARED tmp name its overwrite-create
    // deletes our `.crc` sidecar mid-write (the chmod-on-vanished-crc
    // crash); with unique names the race degrades to last-rename-wins,
    // which the registry swap upstream already resolves.
    val tmp = new Path(d, s".${fmt(next)}.tmp-${java.util.UUID.randomUUID()}")
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = fs.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    TableStats.metaBytesWritten.addAndGet(bytes.length)
    val dest = new Path(d, fmt(next))
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"graft: could not record snapshot $next under $d")
    // prime the resolve cache: the committer (and the first readers) will
    // resolve this version next — no reason to re-read what we just wrote
    try {
      val st = fs.getFileStatus(dest)
      resolveCache.synchronized {
        resolveCache.put(dest.toString,
          (st.getLen, st.getModificationTime, depth, stats))
      }
    } catch { case _: java.io.IOException => () }
    next
  }

  // ---- tags: named, vacuum-protected snapshot refs -----------------------
  // The reproducible-run primitive: `tag(dir, "train-v1")` pins the
  // current (or a given) version under a stable name; readers say
  // `VERSION AS OF 'train-v1'` (or option("snapshot-tag", ...)) and keep
  // getting byte-identical data while ingestion commits past them —
  // vacuum never expires a tagged manifest. One tiny side file,
  // independent of table size.

  private def tagsPath(dataDir: Path) = new Path(dataDir.getParent, "_tags.tsv")

  def tags(fs: FileSystem, dataDir: Path): Map[String, Long] = {
    val p = tagsPath(dataDir)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      text.linesIterator.filter(_.nonEmpty).map { l =>
        val i = l.lastIndexOf('\t')
        l.substring(0, i) -> l.substring(i + 1).toLong
      }.toMap
    }
  }

  private def writeTags(fs: FileSystem, dataDir: Path, m: Map[String, Long]): Unit = {
    val tmp = new Path(dataDir.getParent, s".tags.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(m.toSeq.sortBy(_._1).map { case (n, v) => s"$n\t$v" }
      .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    TableStats.renameOverwrite(fs, tmp, tagsPath(dataDir))
  }

  /** Tag `version` (default: the current head) as `name`. Re-tagging an
    * existing name moves it. Serialized under the commit lock so a
    * concurrent vacuum cannot expire the snapshot mid-tag. */
  def tag(tableDir: String, name: String, version: Option[Long] = None): Long = {
    require(name.nonEmpty && !name.forall(_.isDigit),
      s"graft: tag name '$name' must be non-numeric (numbers are versions)")
    // the TSV store (and the SQL grammar) cannot carry whitespace or
    // control characters — a stray tab/newline would corrupt _tags.tsv
    // and take SHOW TAGS, resolveTag AND vacuum down with it
    require(name.matches("[\\w][\\w.-]*"),
      s"graft: tag name '$name' must match [A-Za-z0-9_][A-Za-z0-9_.-]*")
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    TableStats.withLock(fs, dataDir) {
      val v = version.getOrElse(list(fs, dataDir).lastOption.map(_._1).getOrElse(
        throw new IllegalArgumentException(s"graft: $tableDir has no snapshots")))
      require(read(fs, dataDir, v).isDefined,
        s"graft: no snapshot v$v for $dataDir (never recorded, or expired)")
      writeTags(fs, dataDir, tags(fs, dataDir) + (name -> v))
      v
    }
  }

  /** Drop a tag (the snapshot then expires normally). */
  def dropTag(tableDir: String, name: String): Unit = {
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    TableStats.withLock(fs, dataDir) {
      writeTags(fs, dataDir, tags(fs, dataDir) - name)
    }
  }

  /** Resolve a tag to its version, or None. */
  def resolveTag(fs: FileSystem, dataDir: Path, name: String): Option[Long] =
    tags(fs, dataDir).get(name)

  // ---- write-audit-publish (WAP): staged commits -------------------------
  // The training-pipeline gate: a producer stages a commit
  // (`df.writeTo(t).option("wap.id", "x")`), an auditor reads it via
  // `VERSION AS OF 'wap-x'` (the staged snapshot, tagged and therefore
  // vacuum-protected) while every normal reader still sees the
  // pre-stage table, and only `ALTER TABLE t PUBLISH WAP 'x'` folds the
  // files into the live registry — one atomic swap, no data movement.
  // `ALTER TABLE t DISCARD WAP 'x'` deletes the staged files instead.

  private def wapPath(dataDir: Path, id: String): Path = {
    require(id.matches("[\\w][\\w.-]*"),
      s"graft: WAP id '$id' must match [A-Za-z0-9_][A-Za-z0-9_.-]*")
    new Path(dataDir.getParent, s"_wap/$id.tsv")
  }

  /** Marker making a staged commit a REPLACE: publish swaps the live
    * registry to exactly the staged adds (dropping every prior entry)
    * instead of folding them in. Written BEFORE the adds-list, so a
    * crash between the two leaves only an inert marker (no adds-list =
    * not a stage); publish/discard remove both. */
  private def wapReplacePath(dataDir: Path, id: String): Path =
    new Path(dataDir.getParent, s"_wap/$id.replace")

  /** Is the staged commit `id` a REPLACE stage? */
  def isReplaceWap(fs: FileSystem, dataDir: Path, id: String): Boolean =
    fs.exists(wapReplacePath(dataDir, id))

  def wapTag(id: String): String = s"wap-$id"

  /** Stage `adds` (this commit's uniquely-named files) under `id`:
    * persist the adds-list, record the AUDIT snapshot (live ++ adds) and
    * tag it `wap-<id>`. The live registry is untouched, so normal reads
    * cannot see the staged files. MUST be called under
    * [[TableStats.withLock]] (the batch commit path holds it). */
  def stageWap(fs: FileSystem, dataDir: Path, id: String,
               adds: Map[String, TableStats.Entry],
               replace: Boolean = false): Long = {
    val p = wapPath(dataDir, id)
    require(!fs.exists(p),
      s"graft: WAP id '$id' already has a staged commit; PUBLISH or DISCARD it first")
    // a registry-less table lists directories instead of the manifest and
    // would SEE the staged files — materialize the (empty) registry first
    if (TableStats.readIfExists(fs, dataDir).isEmpty)
      TableStats.write(fs, dataDir, Map.empty)
    val next = nextVersion(fs, dataDir)
    val stamped = adds.map { case (r, e) =>
      r -> (if (e.seq < 0) e.copy(seq = next) else e)
    }
    fs.mkdirs(p.getParent)
    // user-chosen WAP ids are reusable after a publish: clear the prior
    // use's published-version record (or [[publishedWapVersion]] would
    // report the OLD publish for this new stage) and any stale replace
    // marker (a leftover marker must not turn this append stage into a
    // registry swap)
    fs.delete(wapPublishedPath(dataDir, id), false)
    fs.delete(wapReplacePath(dataDir, id), false)
    // replace marker BEFORE the adds-list: the adds-list is what makes
    // the stage exist, so its mode must already be durable by then
    if (replace) fs.create(wapReplacePath(dataDir, id), false).close()
    val out = fs.create(p, false)
    try out.write(TableStats.serialize(stamped)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // the audit snapshot previews what publish will make live: live ++
    // adds for an append stage, the adds ALONE for a replace stage
    recordAt(fs, dataDir,
      if (replace) stamped else TableStats.read(fs, dataDir) ++ stamped, next,
      base = TableStats.liveVersion(fs, dataDir))
    // mark the audit snapshot as a SIDE BRANCH: change feeds must skip it
    // without advancing, so the adds surface at the publish version (and
    // never surface for a discarded stage)
    ChangeLog.writeMarker(fs, dataDir, next, ChangeLog.Staged)
    writeTags(fs, dataDir, tags(fs, dataDir) + (wapTag(id) -> next))
    next
  }

  /** The staged adds-list of `id`, or None. */
  def readWap(fs: FileSystem, dataDir: Path, id: String)
      : Option[Map[String, TableStats.Entry]] = {
    val p = wapPath(dataDir, id)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      Some(TableStats.deserialize(text))
    }
  }

  /** All staged WAP ids of a table. */
  def listWap(fs: FileSystem, dataDir: Path): Seq[String] = {
    val d = new Path(dataDir.getParent, "_wap")
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".tsv")).map(_.stripSuffix(".tsv")).sorted
  }

  /** PUBLISH: fold the staged adds into the live registry — one atomic
    * registry swap. Commits that landed since staging are safe: WAP
    * stages only appends of uniquely-named files, so the fold is a pure
    * addition (the fast-forward). Returns the published version.
    *
    * A REPLACE stage ([[stageWap]] with `replace = true`) publishes as a
    * registry SWAP instead: the live manifest becomes exactly the staged
    * adds, every prior entry (data AND outstanding equality deletes)
    * drops, and the version is marked [[ChangeLog.Replace]] so change
    * feeds replay it as delete(removed rows) + insert(added rows). A
    * replace publish has NO fast-forward property — a commit landing
    * between stage and publish is silently dropped from the live view —
    * so replace stages belong to single-maintainer rewrite protocols
    * ([[Transactions.Txn.replace]] race-checks the window up to its
    * commit point); replaced-away files stay on disk for time travel
    * until vacuum, exactly like compaction victims. */
  def publishWap(tableDir: String, id: String): Long = {
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    TableStats.withLock(fs, dataDir) {
      val adds = readWap(fs, dataDir, id).getOrElse(
        throw new IllegalArgumentException(
          s"graft: no staged WAP commit '$id' under $tableDir"))
      val replace = isReplaceWap(fs, dataDir, id)
      // the Replace marker commits BEFORE the swap inside TableStats.write
      // (the chokepoint's marker discipline): the reverse order left a
      // crash window where the shrink version was live UNMARKED and every
      // feed interval crossing it threw ("unrecorded rewrite") forever.
      // BOTH crash sub-windows heal at the next commit (or the recover()
      // re-publish): a death before recordAt leaves only a stray marker,
      // which the chokepoint overwrites or clears when the version is
      // re-minted; a death between recordAt and the swap leaves a marked
      // snapshot above head, which the chokepoint's healing loop
      // overwrites to Aborted (any non-Staged version above head is dead
      // under the lock).
      val v =
        if (replace)
          TableStats.write(fs, dataDir, adds, kind = Some(ChangeLog.Replace))
        else TableStats.write(fs, dataDir, TableStats.read(fs, dataDir) ++ adds)
      // record the published version BEFORE retiring the staged list: a
      // multi-table transaction that crashes mid-complete can then still
      // learn where this participant landed ([[publishedWapVersion]] —
      // the basis of [[Transactions.readAt]]'s cross-table snapshot). A
      // re-publish after a crash-between-the-two-steps folds the same
      // adds again and OVERWRITES the record with the newer version —
      // both versions contain the stage, so the final record is sound.
      val out = fs.create(wapPublishedPath(dataDir, id), true)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(wapPath(dataDir, id), false)
      fs.delete(wapReplacePath(dataDir, id), false)
      writeTags(fs, dataDir, tags(fs, dataDir) - wapTag(id))
      v
    }
  }

  private def wapPublishedPath(dataDir: Path, id: String): Path =
    new Path(dataDir.getParent, s"_wap/$id.published")

  /** The version [[publishWap]] recorded for `id`, or None if `id` was
    * never published (or predates the record). NOT vacuum-pinned: the
    * version expires like any other snapshot — readers needing a durable
    * cross-table snapshot tag the recorded versions. */
  def publishedWapVersion(fs: FileSystem, dataDir: Path, id: String): Option[Long] = {
    val p = wapPublishedPath(dataDir, id)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.trim.toLongOption
    }
  }

  /** DISCARD: the staged write never happened — delete its files, its
    * adds-list, and the audit tag. Returns the number of files removed. */
  def discardWap(tableDir: String, id: String): Int = {
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    TableStats.withLock(fs, dataDir) {
      val adds = readWap(fs, dataDir, id).getOrElse(
        throw new IllegalArgumentException(
          s"graft: no staged WAP commit '$id' under $tableDir"))
      val live = TableStats.read(fs, dataDir)
      val dead = adds.keysIterator.filterNot(live.contains).toSeq
      dead.foreach(rel => fs.delete(new Path(dataDir, rel), false))
      fs.delete(wapPath(dataDir, id), false)
      fs.delete(wapReplacePath(dataDir, id), false)
      writeTags(fs, dataDir, tags(fs, dataDir) - wapTag(id))
      dead.size
    }
  }

  /** CHANGE FEED — the CDC read: every row-level change in `(since,
    * end]` as a DataFrame of the table's columns plus `_change_type`
    * ('insert' | 'delete' | 'update_preimage' | 'update_postimage') and
    * `_commit_version`. Each version replays by its [[ChangeLog]] kind:
    *
    *  - appends: added files read directly as inserts (only the delta,
    *    never the table);
    *  - merge-on-read mutations: equality keys become delete rows
    *    (row_key populated, data columns NULL) — except keys re-written
    *    in the same commit, which PAIR into update_preimage (the key
    *    row) + update_postimage (the new values), Delta-CDF style.
    *    With `hydrateMor = true` the NULL-columned rows are replaced by
    *    FULL preimages recovered from the prior live snapshot: every row
    *    visible at v-1 whose key the commit deleted IS the deleted row,
    *    so one key-pruned snapshot read (≤4096 keys push an IN filter
    *    into the scan — registry ranges and blooms prune to the files
    *    holding those keys; larger sets broadcast-semi-join) rebuilds
    *    what merge-on-read never wrote down. Hydrated feeds emit one
    *    delete row PER DELETED ROW (not per key) and emit nothing for a
    *    key that matched no row — the physical truth, where the
    *    unhydrated feed echoes the commit's key list verbatim;
    *  - copy-on-write mutations: the change files the commit recorded
    *    ([[ChangeLog.stageCowChanges]]) stream out with full pre/post
    *    images — the feed works in the engine's DEFAULT mutation mode;
    *  - truncate / partition DELETE / INSERT OVERWRITE (static or
    *    dynamic): removed files' surviving rows are deletes (full
    *    preimages), added files are inserts;
    *  - compaction: skipped (rows moved, not changed);
    *  - RESTORE or pre-change-log rewrites: refused loudly.
    *
    * Cost: O(#versions) side-file reads + a scan of exactly the files
    * each commit touched — at 100 TB each poll reads the delta, never
    * the corpus. Delete keys materialized on the driver are capped by
    * `spark.graft.deletes.max.bytes` and fail loudly pointing at
    * compaction. */
  def changes(spark: SparkSession, table: GraftTable, since: Long,
              end: Option[Long] = None, hydrateMor: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, when}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dataDir = new Path(table.dataDir)
    val fs = dataDir.getFileSystem(new Configuration())
    // default end = the LIVE head where known: a crashed commit's orphan
    // snapshot above it (unmarked until the next committer heals it) must
    // not replay as an append
    val endV = end.getOrElse(
      TableStats.liveVersion(fs, dataDir).orElse(
        list(fs, dataDir).lastOption.map(_._1)).getOrElse(0L))
    require(since <= endV, s"graft: since-version $since is after $endV")
    require(table.renames.isEmpty,
      "graft: change feed over a renamed-column table is not supported yet")
    val schema = table.schema0
    require(!schema.fieldNames.contains("_change_type") &&
      !schema.fieldNames.contains("_commit_version"),
      "graft: change feed over a table whose own columns shadow " +
        "_change_type/_commit_version would be silently ambiguous")
    val key = graft.functions.ColumnNames.RowKey
    val keyed = schema.fieldNames.contains(key)
    // delete/preimage rows carry NULL data columns — the feed's columns
    // are nullable regardless of the table's declared nullability
    val nullable = StructType(schema.fields.map(_.copy(nullable = true)))

    def manifestAt(v: Long): Map[String, TableStats.Entry] =
      if (v == 0) Map.empty
      else read(fs, dataDir, v).getOrElse(throw new IllegalArgumentException(
        s"graft: no snapshot v$v for $dataDir (never recorded, or expired by vacuum)"))

    val cap = GraftDeletes.byteCap()
    var delBytes = 0L
    def capCheck(add: Long): Unit = {
      delBytes += add
      if (delBytes > cap) throw new IllegalStateException(
        s"graft: change feed ($since, $endV] of $dataDir would materialize " +
          s"$delBytes bytes of delete keys on the driver (> cap $cap); run " +
          "Compaction.compact (or OPTIMIZE) and restart from a newer version, " +
          "read a narrower range, or raise spark.graft.deletes.max.bytes")
    }

    // the baseline must sit on the LIVE chain: a WAP audit snapshot as
    // `since` already contains the staged files and would swallow their
    // publish (or, post-DISCARD, surface phantom removals)
    var prevV = liveBaseline(fs, dataDir, since)
    var prev = manifestAt(prevV)
    val inserts = scala.collection.mutable.ArrayBuffer[(Long, Seq[String])]()
    // (v, prior live version, inserted-file paths, delete keys) — keys
    // pair with re-written rows; the prior version anchors hydration
    val morBatches = scala.collection.mutable.ArrayBuffer[(Long, Long, Seq[String], Seq[String])]()
    val cowBatches = scala.collection.mutable.ArrayBuffer[(Long, Seq[String])]()
    // (v, removed (path, seq), applicable delete keys (key, delete seq))
    val replaceBatches =
      scala.collection.mutable.ArrayBuffer[(Long, Seq[(String, Long)], Seq[(String, Long)])]()
    // every version in the range must resolve: silently skipping a
    // vacuumed snapshot would collapse commits into one diff (wrong
    // _commit_version) and could hide an intra-gap rewrite
    for (v <- (since + 1) to endV) {
      val kind = ChangeLog.kindOf(fs, dataDir, v)
      // a WAP audit snapshot — or an aborted orphan — is a side branch,
      // not a live commit: skip it WITHOUT advancing prev, so its files
      // diff against the live chain at the publish version (or never,
      // when the stage was discarded / the commit crashed)
      if (kind.contains(ChangeLog.Staged) || kind.contains(ChangeLog.Aborted)) ()
      else {
        val cur = manifestAt(v)
        def abs(rels: Seq[String]): Seq[String] =
          rels.map(r => TableStats.absOf(table.dataDir, r))
        ChangeLog.rowChanges(fs, dataDir, v, kind, prev, cur, keyed, capCheck,
            s"change feed ($since, $endV]") match {
          case ChangeLog.NoRows => ()
          case ChangeLog.CowRows(cf) =>
            if (cf.nonEmpty) cowBatches += ((v, cf))
          case ChangeLog.ReplaceRows(removed, dkeys, dataAdded) =>
            replaceBatches += ((v,
              removed.map { case (rel, seq) => (TableStats.absOf(table.dataDir, rel), seq) },
              dkeys))
            if (dataAdded.nonEmpty) inserts += ((v, abs(dataAdded)))
          case ChangeLog.AppendRows(dataRels) =>
            if (dataRels.nonEmpty) inserts += ((v, abs(dataRels)))
          case ChangeLog.MorRows(dataRels, keys) =>
            morBatches += ((v, prevV, abs(dataRels), keys))
        }
        prev = cur
        prevV = v
      }
    }

    val withMeta = StructType(nullable.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), withMeta)
    def readRows(files: Seq[String]) =
      spark.read.schema(nullable).parquet(files: _*)
        .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    /** NULL-columns rows from a key column `__dk` (delete / preimage). */
    val keyOnlyCols = schema.fields.toIndexedSeq.map { f =>
      if (f.name == key) col("__dk").as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }

    val insertDf = inserts.map { case (v, files) =>
      readRows(files)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v))
    }
    val cowDf = cowBatches.map { case (v, files) =>
      spark.read.schema(ChangeLog.changeSchema(schema)).parquet(files: _*)
        .select((schema.fieldNames :+ ChangeLog.TypeCol).toIndexedSeq.map(col): _*)
        .withColumn("_commit_version", lit(v))
    }
    val replaceDf = replaceBatches.map { case (v, files, dkeys) =>
      import spark.implicits._
      // same seq rule as the scan reader: a delete suppresses rows of
      // files older than it — group removed files by seq, anti-join
      val parts = files.groupBy(_._2).toSeq.sortBy(_._1).map { case (s, fls) =>
        val ks = dkeys.collect { case (k, ds) if ds > s => k }.distinct
        val df = readRows(fls.map(_._1))
        if (ks.isEmpty) df
        else df.join(broadcast(ks.toDF("__dk")), df(key) === col("__dk"), "left_anti")
          .select(schema.fieldNames.toIndexedSeq.map(col): _*)
      }
      parts.reduce(_ unionByName _)
        .withColumn("_change_type", lit("delete"))
        .withColumn("_commit_version", lit(v))
    }
    val morDf = morBatches.map { case (v, pv, insertFiles, keys) =>
      import spark.implicits._
      val kdf = keys.toDF("__dk")
      if (hydrateMor) {
        // full preimages from the prior live snapshot: the key-pruned
        // merged read at pv (older equality deletes applied) holds every
        // row this commit's keys delete — files at pv all have data seq
        // < this commit's delete seq, so the key match IS the deletion
        val pre0 =
          if (pv == 0) empty.select(schema.fieldNames.toIndexedSeq.map(col): _*)
          else {
            val snap = spark.read.format("graft")
              .option("path", table.tableDir)
              .option("snapshot-version", pv).load()
              .select(schema.fieldNames.toIndexedSeq.map(col): _*)
            // ≤4096 keys: an IN filter the scan prunes by (ranges/blooms);
            // beyond that, a broadcast semi-join (the keys are already
            // driver-materialized under the delete byte cap)
            if (keys.size <= 4096) snap.filter(col(key).isin(keys: _*))
            else snap.join(broadcast(kdf), snap(key) === col("__dk"), "left_semi")
          }
        if (insertFiles.isEmpty)
          pre0.withColumn("_change_type", lit("delete"))
            .withColumn("_commit_version", lit(v))
        else {
          val ins = readRows(insertFiles)
          val insKeys = ins.select(col(key).as("__ik")).distinct()
          val preTyped = pre0
            .join(broadcast(insKeys), pre0(key) === col("__ik"), "left")
            .withColumn("_change_type",
              when(col("__ik").isNotNull, lit("update_preimage"))
                .otherwise(lit("delete")))
            .select((schema.fieldNames :+ "_change_type").toIndexedSeq.map(col): _*)
          val insTyped = ins.join(broadcast(kdf), ins(key) === col("__dk"), "left")
            .withColumn("_change_type",
              when(col("__dk").isNotNull, lit("update_postimage"))
                .otherwise(lit("insert")))
            .select((schema.fieldNames :+ "_change_type").toIndexedSeq.map(col): _*)
          insTyped.unionByName(preTyped).withColumn("_commit_version", lit(v))
        }
      } else if (insertFiles.isEmpty)
        // pure DELETE commit — keys become delete rows, nothing to pair
        kdf.select(keyOnlyCols: _*)
          .withColumn("_change_type", lit("delete"))
          .withColumn("_commit_version", lit(v))
      else {
        val ins = readRows(insertFiles)
        // UPDATE PAIRING: a key deleted AND re-written by the same commit
        // is an update — the new row is its postimage, the key row its
        // preimage (values not recorded by merge-on-read; columns NULL)
        val insTyped = ins.join(broadcast(kdf), ins(key) === col("__dk"), "left")
          .withColumn("_change_type",
            when(col("__dk").isNotNull, lit("update_postimage"))
              .otherwise(lit("insert")))
          .select((schema.fieldNames :+ "_change_type").toIndexedSeq.map(col): _*)
        val insKeys = ins.select(col(key).as("__ik")).distinct()
        val keyTyped = kdf.join(insKeys, col("__dk") === col("__ik"), "left")
          .withColumn("_change_type",
            when(col("__ik").isNotNull, lit("update_preimage"))
              .otherwise(lit("delete")))
          .select(keyOnlyCols :+ col("_change_type"): _*)
        insTyped.unionByName(keyTyped).withColumn("_commit_version", lit(v))
      }
    }
    (insertDf ++ cowDf ++ replaceDf ++ morDf).foldLeft(empty)(_ unionByName _)
  }

  /** Snapshot log as a DataFrame — the DESCRIBE HISTORY analog:
    * (version, committed_at, files, rows, bytes). */
  def history(spark: SparkSession, tableDir: String): DataFrame = {
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    val rows = list(fs, dataDir).map { case (v, ts) =>
      // delete files are metadata, not table content: report data files
      // only (their row counts would otherwise inflate the table's)
      val m = read(fs, dataDir, v).getOrElse(Map.empty)
        .filterNot(e => GraftDeletes.isDeleteRel(e._1))
      (v, new java.sql.Timestamp(ts), m.size.toLong,
        m.valuesIterator.map(_.rows).sum,
        m.valuesIterator.map(e => math.max(e.bytes, 0L)).sum)
    }
    import spark.implicits._
    rows.toDF("version", "committed_at", "files", "rows", "bytes")
  }

  /** ROLL BACK the table to snapshot `version` — the RESTORE analog. The
    * restored manifest is committed as a NEW snapshot (history is
    * append-only: the bad commits stay visible to time travel, and the
    * restore itself can be time-traveled past), so nothing is rewritten
    * or deleted — a pure metadata operation regardless of table size.
    * Throws if any file of the target manifest was already vacuumed away.
    * @return the new (restored) version */
  def restore(tableDir: String, version: Long): Long = {
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    TableStats.withLock(fs, dataDir) {
      val m = read(fs, dataDir, version).getOrElse(throw new IllegalArgumentException(
        s"graft: no snapshot v$version for $dataDir (never recorded, or expired by vacuum)"))
      // a WAP audit snapshot is a side branch: restoring to it would
      // silently PUBLISH the staged files — route through PUBLISH WAP
      val kind = ChangeLog.kindOf(fs, dataDir, version)
      require(!kind.contains(ChangeLog.Staged),
        s"graft: v$version is a write-audit-publish AUDIT snapshot; " +
          "use ALTER TABLE ... PUBLISH WAP to make it live")
      // a crashed commit's snapshot holds rows that were NEVER committed:
      // restoring one would publish them
      requireLiveHistory(fs, dataDir, version, dataDir.getParent.getName)
      val missing = m.keySet.filterNot(rel =>
        fs.exists(TableStats.pathOf(dataDir, rel)))
      require(missing.isEmpty,
        s"graft: cannot restore v$version — ${missing.size} data file(s) were " +
          s"vacuumed away (e.g. ${missing.take(3).mkString(", ")})")
      // an arbitrary manifest swap: its row delta is a two-snapshot diff
      // the feeds refuse to guess — they fail loudly at this version
      // (marker committed BEFORE the swap inside the chokepoint)
      TableStats.write(fs, dataDir, m, kind = Some(ChangeLog.Restore))
    }
  }

  /** Expire history: keep the latest `retain` snapshots (and always the
    * live registry), physically delete data files referenced by NO
    * retained manifest, and drop the expired manifest files. Manifests
    * younger than `minAgeMillis` are retained even beyond `retain` —
    * see the tombstone note below. Returns
    * (dataFilesDeleted, snapshotsDropped).
    *
    * The table lock is held only while the reachability set is computed
    * (one registry read + one recursive listing + set membership) — the
    * file deletions themselves run AFTER the lock is released, so a
    * large vacuum never starves concurrent committers past the lock's
    * 30 s wait. That is safe because the victims are unreferenced by the
    * live registry and every retained manifest, and older than
    * `minAgeMillis`: no reader can plan them and no commit path
    * re-registers an old unreferenced name. Files younger than
    * `minAgeMillis` are never touched: an IN-FLIGHT write lands its part
    * files before it takes the commit lock, so an unreferenced-but-fresh
    * file may be about to be committed — the age guard (the standard
    * orphan-cleanup discipline) keeps vacuum safe to run concurrently
    * with writers. */
  def vacuum(tableDir: String, retain: Int = 2,
             minAgeMillis: Long = 3600L * 1000): (Int, Int) = {
    require(retain >= 0, "retain must be >= 0")
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    if (!fs.exists(dataDir)) return (0, 0)
    val (victims, dropped) = TableStats.withLock(fs, dataDir) {
      val versions = list(fs, dataDir)
      val (expired, retained) = versions.splitAt(math.max(0, versions.length - retain))
      // the age guard covers MANIFESTS too: a snapshot younger than
      // minAge may still be serving as the tombstone record for data
      // files the same guard is keeping on disk (crash-recovery replay
      // checks [[everRecorded]]) — dropping the manifest first would
      // leave an on-disk file with no tombstone, exactly the
      // resurrection window the snapshot log exists to close
      val now = System.currentTimeMillis()
      // tagged snapshots are pinned: a tag is a promise that readers can
      // keep resolving that exact manifest, so vacuum never expires one.
      // The transaction coordinator's HEAD entry is a pin of the same
      // kind: maintained-index serves resolve their cut from it and read
      // VERSION AS OF that entry, so expiring it would crash (or un-pin)
      // every serve racing this vacuum.
      val tagged = tags(fs, dataDir).values.toSet ++
        Transactions.headPinnedVersion(tableDir)
      val (dropped0, keptYoung) = expired.partition {
        case (v, ts) => now - ts >= minAgeMillis && !tagged.contains(v)
      }
      // the live pointer target, and every delta-chain ancestor of a
      // surviving (or tagged, or live) manifest, must outlive them: a
      // pointer registry with a missing target — or a delta snapshot
      // with a missing base — would be unreadable corruption
      val liveHead = TableStats.liveVersion(fs, dataDir)
      val needed = scala.collection.mutable.Set[Long]()
      needed ++= liveHead
      var frontier: Set[Long] =
        (keptYoung ++ retained).map(_._1).toSet ++ tagged ++ liveHead
      while (frontier.nonEmpty) {
        val bases = frontier.flatMap(v => baseOf(fs, dataDir, v)) -- needed
        needed ++= bases
        frontier = bases
      }
      val (keptChain, dropped) = dropped0.partition { case (v, _) => needed.contains(v) }
      val kept = keptYoung ++ keptChain ++ retained
      val live = TableStats.read(fs, dataDir).keySet
      val reachable: Set[String] =
        live ++ kept.flatMap { case (v, _) =>
          read(fs, dataDir, v).map(_.keySet).getOrElse(Set.empty[String])
        }
      // collect unreferenced data files (never side files / commit markers)
      val it = fs.listFiles(dataDir, true)
      val victims = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) {
        val st = it.next()
        val p = st.getPath
        val rel = TableStats.relOf(p.toString)
        // data part-files AND equality-delete files (dropped from the
        // manifest once compaction folded them in) are reclaimable
        val reclaimable = p.getName.endsWith(".parquet") ||
          GraftDeletes.isDeleteRel(rel)
        if (st.isFile && reclaimable &&
            System.currentTimeMillis() - st.getModificationTime >= minAgeMillis &&
            !reachable.contains(rel))
          victims += p
      }
      // drop the expired MANIFESTS while still holding the lock: restore()
      // also runs under it, so once we release no one can re-register a
      // victim by committing a dropped snapshot's manifest (restore of a
      // still-present manifest would otherwise race the deletions below)
      dropped.foreach { case (v, _) =>
        fs.delete(new Path(snapDir(dataDir), fmt(v)), false)
        // the change-log marker and any recorded change files expire with
        // their snapshot — the feed already refuses expired versions
        fs.delete(ChangeLog.markerPath(dataDir, v), false)
        fs.delete(ChangeLog.changeDataDir(dataDir, v), true)
      }
      // staging dirs orphaned by a crashed COW commit (never renamed into
      // place) are reclaimable once past the age guard
      val chDir = ChangeLog.changesDir(dataDir)
      if (fs.exists(chDir)) fs.listStatus(chDir).foreach { st =>
        if (st.getPath.getName.startsWith(".staging-") &&
            now - st.getModificationTime >= minAgeMillis)
          fs.delete(st.getPath, true)
      }
      // snapshot tmp files orphaned by a crash between create and rename:
      // recordAt's tmp names are attempt-unique (.vNNN.tsv.tmp-<uuid>), so
      // no retry ever overwrites an orphan — without this reclaim a
      // crash-retry loop accumulates unbounded tmp + .crc litter in
      // _snapshots/ (round-13 ADVICE). Same age guard as data files: an
      // in-flight recordAt's tmp is younger than minAge.
      val sDir = snapDir(dataDir)
      if (fs.exists(sDir)) fs.listStatus(sDir).foreach { st =>
        if (st.isFile && st.getPath.getName.contains(".tmp-") &&
            now - st.getModificationTime >= minAgeMillis)
          fs.delete(st.getPath, false)
      }
      (victims.toSeq, dropped)
    }
    // data-file deletions outside the lock so a large vacuum never starves
    // committers; a crash here leaves only unreferenced orphans that the
    // next vacuum reclaims (the manifests that referenced them are gone)
    victims.foreach(fs.delete(_, false))
    // publish markers (`_wap/<id>.published`, written by [[publishWap]]
    // for transactional read snapshots) expire on a fixed TTL: they are
    // only read while their transaction's coordinator markers exist —
    // a crash-recovery window far shorter than the TTL — and a per-
    // micro-batch transactional maintainer must not grow this dir
    // without bound
    val wapDir = new Path(dataDir.getParent, "_wap")
    if (fs.exists(wapDir)) {
      val now = System.currentTimeMillis()
      fs.listStatus(wapDir).foreach { st =>
        if (st.getPath.getName.endsWith(".published") &&
            now - st.getModificationTime >= Transactions.RecordTtlMillis)
          fs.delete(st.getPath, false)
      }
    }
    (victims.size, dropped.size)
  }

  /** Time-based retention (`VACUUM t OLDER THAN '<ts>'`): expire every
    * snapshot committed before `cutoffMillis` and reclaim data files no
    * surviving manifest references. Translates to [[vacuum]]'s
    * count-based contract — retain = #snapshots at-or-after the cutoff,
    * age guard aligned to the same instant — so all of its protections
    * (tagged snapshots pinned, delta-chain bases kept, live head kept,
    * lock discipline) apply unchanged. The in-flight-write age guard is
    * FLOORED at `minAgeMillis` (default 1 h): a cutoff at or after now
    * must not zero the guard, or it would reclaim a concurrent writer's
    * just-landed part files before their commit registers them — the
    * exact race the guard exists for. The live registry and its chain
    * always survive whatever the cutoff.
    *
    * Concurrency note: `keep` is counted from an UNLOCKED [[list]]; a
    * commit landing between that count and [[vacuum]]'s own locked
    * re-list shifts the count-based retain window by one. That is benign
    * by construction — the age guard is aligned to the same cutoff
    * instant, so no manifest or data file committed at-or-after the
    * cutoff can ever be reclaimed regardless of what the stale count
    * says; the count only decides how far BELOW the cutoff the expiry
    * reaches, never above it. */
  def vacuumOlderThan(tableDir: String, cutoffMillis: Long,
                      minAgeMillis: Long = 3600L * 1000): (Int, Int) = {
    val dataDir = new Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new Configuration())
    if (!fs.exists(dataDir)) return (0, 0)
    val keep = list(fs, dataDir).count(_._2 >= cutoffMillis)
    vacuum(tableDir, retain = keep,
      minAgeMillis =
        math.max(minAgeMillis, System.currentTimeMillis() - cutoffMillis))
  }
}
