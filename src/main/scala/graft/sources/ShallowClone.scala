package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF <v | 'tag'>]` —
  * a ZERO-COPY table copy: the clone's initial manifest REFERENCES the
  * source snapshot's data files (`ext:` registry keys, see
  * [[TableStats.ExtPrefix]]) instead of rewriting them, so cloning a
  * 100 TB table moves O(manifest) metadata bytes and no data.
  *
  * Semantics after the clone:
  *  - reads serve the cloned snapshot byte-for-byte (same files, same
  *    outstanding merge-on-read deletes, same stats/blooms/sort
  *    evidence — the entries are copied verbatim);
  *  - writes DIVERGE: appends land in the clone's own directory;
  *    COW/MOR mutations swap ext references out of the clone's manifest
  *    without ever touching the source's files (no commit path deletes
  *    a replaced file physically, and the clone's vacuum walks only its
  *    OWN data dir — external files are structurally unreclaimable);
  *  - the source is PINNED: cloning tags the source snapshot
  *    (`clone-<dest>-<attempt>` — the prefix is reserved), which the
  *    source's vacuum already retains, and DROP/RENAME of a table with
  *    incoming `clone-` pins refuse loudly — so neither "vacuum the
  *    source" nor "drop the source" can corrupt a live clone (the
  *    failure modes Delta Lake documents for its shallow clones).
  *    DROP TABLE on the clone releases the pin;
  *  - `OPTIMIZE dst` REIFIES the clone (external entries are always
  *    compaction victims): after one compaction the clone is a fully
  *    independent table and the compaction itself RELEASES the pin
  *    (drops the tag and clears the clone properties —
  *    [[releasePinIfReified]]), so the source's DROP/RENAME/vacuum
  *    unblock with no manual step;
  *  - the clone's version counter STARTS at the cloned source version
  *    ([[TableStats.write]]'s floor), so cloned entries' data sequence
  *    numbers stay below every later clone commit — a MOR DELETE in the
  *    clone applies to cloned files exactly like any older data.
  *
  * Cloning a clone WORKS, including unreified ones: inherited external
  * entries keep their absolute upstream paths, and the new clone places
  * its OWN transitive pins on every upstream table (re-pinning the
  * versions the source's tags name, recorded in [[PinsProp]]) — so the
  * chain's files survive any interleaving of drops/vacuums of the
  * intermediate clones. Remaining boundaries, refused loudly: cloning
  * across catalogs with different filesystems is allowed only insofar
  * as paths stay resolvable (same-warehouse clones always are), and
  * streaming the clone's file-based source before reification (the
  * offsets are own-dir listings).
  *
  * The reference has no snapshot/clone machinery at all — its DDL and
  * scans operate on the single live HBase table via the Admin/Table
  * handles in `client/HBaseClientImpl.scala` (create/drop/scan, no
  * version or snapshot concept anywhere); this is lakehouse surface
  * the Spark-native engine adds.
  */
object ShallowClone {
  /** Dest-table property: the source table's directory. */
  val SourceDirProp = "clone.source.dir"
  /** Dest-table property: the source snapshot version cloned. */
  val SourceVersionProp = "clone.source.version"
  /** Dest-table property: the vacuum-pin tag this clone holds on the
    * source (dropped by DROP TABLE on the clone, or released by
    * [[releasePinIfReified]] once OPTIMIZE has materialized every
    * external entry). */
  val PinTagProp = "clone.pin.tag"
  /** Dest-table property: ALL vacuum pins this clone holds — the direct
    * source plus, for a clone-of-a-clone, every upstream table whose
    * files the inherited external entries still reference. Encoded one
    * `tableDir<TAB>tag` per line. [[SourceDirProp]]/[[PinTagProp]] keep
    * naming the DIRECT source (reporting, version floor); release sites
    * iterate this list. */
  val PinsProp = "clone.pins"

  private[sources] def encodePins(pins: Seq[(String, String)]): String =
    pins.map { case (d, t) => s"$d\t$t" }.mkString("\n")

  /** Every (tableDir, pinTag) this clone holds: the full [[PinsProp]]
    * list, or the legacy single direct pin for pre-list clones. */
  private[sources] def decodePins(props: Map[String, String]): Seq[(String, String)] =
    props.get(PinsProp) match {
      case Some(s) => s.split('\n').toSeq.filter(_.nonEmpty).map { l =>
        val i = l.lastIndexOf('\t')
        (l.substring(0, i), l.substring(i + 1))
      }
      case None =>
        for (d <- props.get(SourceDirProp).toSeq; t <- props.get(PinTagProp).toSeq)
          yield (d, t)
    }

  /** Called after a compaction swap (and on a no-op OPTIMIZE, to heal a
    * crash between a past swap and its release): if this clone's LIVE
    * manifest no longer holds any external (`ext:`) entry, the clone is
    * fully reified — drop the vacuum-pin tag it held on its source and
    * clear the clone properties from `_meta.yml`, so DROP/RENAME/vacuum
    * of the source unblock without a manual DROP TAG (the promise the
    * refusal message makes). After release, time travel to the clone's
    * PRE-reification versions is no longer vacuum-protected on the
    * source side — the same exposure as dropping the clone. The tag
    * drop is best-effort (a vanished source must not fail OPTIMIZE);
    * crash between dropTag and the props rewrite leaves stale props
    * whose later release re-drops a missing tag, a no-op. */
  def releasePinIfReified(fs: org.apache.hadoop.fs.FileSystem,
                          table: GraftTable): Unit =
    if (decodePins(table.props).nonEmpty) {
      val dataDir = new Path(table.dataDir)
      // the whole check-release-rewrite runs under the clone's commit
      // lock: the ext-free check cannot interleave with a commit, and
      // the _meta.yml read-modify-write cannot race the lock-guarded
      // meta writers (setPartitionSpec; plain ALTER writeMeta remains
      // unlocked — a pre-existing property of every meta path)
      TableStats.withLock(fs, dataDir) {
        val live = TableStats.readIfExists(fs, dataDir).getOrElse(Map.empty)
        if (!live.keysIterator.exists(TableStats.isExternal)) {
          // tags drop FIRST: a crash before the props rewrite leaves
          // props claiming already-dropped tags, which the NEXT release
          // (or DROP TABLE) re-drops as a no-op and then strips —
          // self-healing. The reverse order would leak live tags with
          // no owning props to find them by.
          decodePins(table.props).foreach { case (dir, tag) =>
            try Snapshots.dropTag(dir, tag)
            catch { case _: Exception => () }
          }
          // strip the clone markers from _meta.yml (read-modify-write
          // of the same three-key layout the catalog writes)
          val metaFile = new Path(table.tableDir, "_meta.yml")
          val text = {
            val in = fs.open(metaFile)
            try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
            finally in.close()
          }
          val (schema, props, partCols) = GraftTable.parseMeta(text)
          import scala.jdk.CollectionConverters._
          val opts = new org.yaml.snakeyaml.DumperOptions()
          opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
          val yaml = new org.yaml.snakeyaml.Yaml(opts).dump(Map(
            "schema_json" -> schema.json,
            "properties" ->
              (props - SourceDirProp - SourceVersionProp - PinTagProp - PinsProp).asJava,
            "partitions" -> partCols.asJava).asJava)
          val out = fs.create(metaFile, true)
          try out.write(yaml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    }

  /** Execute the clone; returns (cloned version, #files referenced). */
  def run(session: SparkSession, destParts: Seq[String], srcParts: Seq[String],
          versionRef: Option[String]): (Long, Long) = {
    val (scat, sid) = GraftViewBridge.resolveIdent(session, srcParts).getOrElse(
      throw new IllegalArgumentException(
        s"graft: SHALLOW CLONE source ${srcParts.mkString(".")} is not a graft table"))
    val (dcat, did) = GraftViewBridge.resolveIdent(session, destParts).getOrElse(
      throw new IllegalArgumentException(
        s"graft: SHALLOW CLONE destination ${destParts.mkString(".")} is not in a graft catalog"))
    val src = scat.loadTable(sid).asInstanceOf[GraftTable]
    val srcDataDir = new Path(src.dataDir)
    val fs = srcDataDir.getFileSystem(new Configuration())
    val srcName = scat.fullNameOf(sid)
    val destName = dcat.fullNameOf(did)

    val v = versionRef match {
      case None => TableStats.liveVersion(fs, srcDataDir).getOrElse(
        throw new IllegalStateException(
          s"graft: $srcName has no registry head to clone (written " +
            "out-of-band?); route one commit through the catalog first"))
      case Some(ref) => ref.toLongOption.getOrElse(
        Snapshots.resolveTag(fs, srcDataDir, ref).getOrElse(
          throw new IllegalArgumentException(
            s"graft: VERSION AS OF expects a snapshot number or a tag, " +
              s"and '$ref' is no tag of $srcName")))
    }
    // crashed-commit orphans are not cloneable history (same rule as
    // time travel and RESTORE) ...
    Snapshots.requireLiveHistory(fs, srcDataDir, v, srcName)
    // ... and neither are WAP AUDIT snapshots, which requireLiveHistory
    // deliberately lets time travel read: DISCARD WAP physically deletes
    // staged files without consulting clone pins, so a clone of the
    // audit branch would dangle — publish first, then clone
    require(!ChangeLog.kindOf(fs, srcDataDir, v).contains(ChangeLog.Staged),
      s"graft: v$v of $srcName is a write-audit-publish AUDIT snapshot; " +
        "PUBLISH WAP first, then clone the published version")

    // fail on an existing dest BEFORE pinning (the failure cleanup below
    // must never drop a table this command did not create)
    if (dcat.tableExists(did))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(did)

    // PIN FIRST: the tag (validated + written under the source's lock)
    // makes v vacuum-proof before the manifest is read, so the clone can
    // never capture references a concurrent vacuum is reclaiming. The
    // tag carries a per-ATTEMPT unique suffix: two racing clones of the
    // same dest name then hold distinct pins, and the loser's failure
    // cleanup below can never unpin the winner's committed clone.
    def freshTag(): String =
      s"clone-$destName-" + java.util.UUID.randomUUID().toString.take(8)
    val pinTag = freshTag()
    val srcTableDir = new Path(src.dataDir).getParent.toString
    Snapshots.tag(srcTableDir, pinTag, Some(v))
    val pins = scala.collection.mutable.ArrayBuffer[(String, String)](
      (srcTableDir, pinTag))
    var created = false
    try {
      val manifest = Snapshots.read(fs, srcDataDir, v).getOrElse(
        throw new IllegalStateException(
          s"graft: no snapshot v$v for $srcName (expired by vacuum?)"))
      // CLONE OF A CLONE: inherited external entries live in UPSTREAM
      // tables' directories, protected only by the source's own pins —
      // which die with the source. Re-pin every upstream dir the
      // inherited entries ACTUALLY REFERENCE at the version the source's
      // tag names, under tags owned by THIS clone. Ordering is safe
      // against a concurrent OPTIMIZE of the source: our bootstrap pin
      // (above) blocks DROP, and if the source reified between our props
      // read and the resolveTag here, the tag is gone and the clone
      // aborts loudly (retry against the reified head).
      val extEntries = manifest.keysIterator.filter(TableStats.isExternal).toSeq
      if (extEntries.nonEmpty) {
        val upstream = decodePins(src.props)
        val uncovered = extEntries.filterNot(r => upstream.exists {
          case (dir, _) => r.startsWith(TableStats.ExtPrefix + dir + "/") })
        require(uncovered.isEmpty,
          s"graft: $srcName's snapshot v$v holds external references with " +
            s"no recorded pin (e.g. ${uncovered.headOption.getOrElse("")}; " +
            "out-of-band clone props edit?); run OPTIMIZE " +
            s"$srcName to materialize it, then clone")
        upstream.filter { case (dir, _) =>
          extEntries.exists(_.startsWith(TableStats.ExtPrefix + dir + "/"))
        }.foreach { case (dir, tag) =>
          val dd = new Path(dir, "data")
          val ufs = dd.getFileSystem(new Configuration())
          val uv = Snapshots.resolveTag(ufs, dd, tag).getOrElse(
            throw new IllegalStateException(
              s"graft: $srcName's upstream pin '$tag' on $dir no longer " +
                "resolves (the source was reified concurrently?); retry " +
                "the clone"))
          val t2 = freshTag()
          Snapshots.tag(dir, t2, Some(uv))
          pins += ((dir, t2))
        }
      }
      // a PURE-CLONE source — no own files in the cloned snapshot — is
      // not referenced by the new clone at all (every entry points at
      // upstream dirs, now pinned above): release the bootstrap pin, so
      // a 12-deep chain of undiverged clones pins the ROOT 12 times and
      // the intermediates ZERO times (O(depth) total bookkeeping, and
      // dropping an intermediate never strands a descendant).
      val hasRelative = manifest.keysIterator.exists(r => !TableStats.isExternal(r))
      val keptPins =
        if (hasRelative || manifest.isEmpty) pins.toSeq
        else {
          // if the release fails (transient FS error), KEEP the pin in
          // the recorded list: the clone's DROP retries the release
          // through decodePins — dropping it from the record here would
          // orphan a live tag no release path can ever find again
          val released =
            try { Snapshots.dropTag(srcTableDir, pinTag); true }
            catch { case _: Exception => false }
          if (released) pins.toSeq.filterNot(_ == ((srcTableDir, pinTag)))
          else pins.toSeq
        }
      val props = {
        import scala.jdk.CollectionConverters._
        val base = src.properties().asScala.toMap +
          (SourceDirProp -> srcTableDir) +
          (SourceVersionProp -> v.toString) +
          (PinsProp -> encodePins(keptPins))
        if (keptPins.contains((srcTableDir, pinTag))) base + (PinTagProp -> pinTag)
        else base - PinTagProp
      }
      val dest = dcat.createCloneShell(did, src.schema0, props, src.partitionSpecs)
      created = true
      val destData = new Path(dest.dataDir)
      val dfs = destData.getFileSystem(new Configuration())
      // relative entries become external references into the source's
      // dir; INHERITED external entries keep their absolute upstream
      // paths verbatim (now protected by this clone's transitive pins)
      val mapped: Map[String, TableStats.Entry] = manifest.map { case (rel, e) =>
        (if (TableStats.isExternal(rel)) rel
         else TableStats.extKey(s"${src.dataDir}/$rel")) -> e
      }
      TableStats.withLock(dfs, destData) {
        // commit AT the source version (floor): cloned seqs stay ≤ head.
        // Unmarked = append semantics for feeds; the clone's history
        // begins here — there is nothing earlier to diff against.
        val recorded = TableStats.write(dfs, destData, mapped, floor = v)
        require(recorded == v,
          s"graft: clone commit recorded v$recorded, expected v$v")
      }
      (v, mapped.size.toLong)
    } catch { case e: Throwable =>
      // release every pin this attempt placed (and the half-created
      // dest, never a pre-existing table) on failure
      pins.foreach { case (dir, tag) =>
        try Snapshots.dropTag(dir, tag) catch { case _: Exception => () }
      }
      if (created) { try dcat.dropTable(did) catch { case _: Exception => () } }
      throw e
    }
  }
}

final case class GraftShallowCloneCommand(
    destParts: Seq[String], srcParts: Seq[String], versionRef: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("source_version", LongType),
    MaintenanceSql.attr("files_referenced", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = ShallowClone.run(session, destParts, srcParts, versionRef)
    Seq(Row(v, n))
  }
}
