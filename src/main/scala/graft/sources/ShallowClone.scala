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
  * Boundaries, all refused loudly: cloning a clone that still holds
  * external entries (its pin chain would need transitive bookkeeping —
  * OPTIMIZE first), cloning across catalogs with different filesystems
  * is allowed only insofar as paths stay resolvable (same-warehouse
  * clones always are), streaming the clone's file-based source before
  * reification (the offsets are own-dir listings).
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
    for (tag <- table.props.get(PinTagProp)) {
      val dataDir = new Path(table.dataDir)
      val live = TableStats.readIfExists(fs, dataDir).getOrElse(Map.empty)
      if (!live.keysIterator.exists(TableStats.isExternal)) {
        for (srcDir <- table.props.get(SourceDirProp))
          try Snapshots.dropTag(srcDir, tag)
          catch { case _: Exception => () }
        // strip the clone markers from _meta.yml (read-modify-write of
        // the same three-key layout the catalog writes)
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
            (props - SourceDirProp - SourceVersionProp - PinTagProp).asJava,
          "partitions" -> partCols.asJava).asJava)
        val out = fs.create(metaFile, true)
        try out.write(yaml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
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
    val pinTag = s"clone-$destName-" +
      java.util.UUID.randomUUID().toString.take(8)
    Snapshots.tag(new Path(src.dataDir).getParent.toString, pinTag, Some(v))
    var created = false
    try {
      val manifest = Snapshots.read(fs, srcDataDir, v).getOrElse(
        throw new IllegalStateException(
          s"graft: no snapshot v$v for $srcName (expired by vacuum?)"))
      require(!manifest.keysIterator.exists(TableStats.isExternal),
        s"graft: $srcName is itself an unreified shallow clone — its " +
          "external references would need a transitive pin; run " +
          s"OPTIMIZE $srcName to materialize it, then clone")
      val props = {
        import scala.jdk.CollectionConverters._
        src.properties().asScala.toMap +
          (SourceDirProp -> new Path(src.dataDir).getParent.toString) +
          (SourceVersionProp -> v.toString) +
          (PinTagProp -> pinTag)
      }
      val dest = dcat.createCloneShell(did, src.schema0, props, src.partitionSpecs)
      created = true
      val destData = new Path(dest.dataDir)
      val dfs = destData.getFileSystem(new Configuration())
      val mapped: Map[String, TableStats.Entry] = manifest.map { case (rel, e) =>
        TableStats.extKey(s"${src.dataDir}/$rel") -> e
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
      // release the pin (and the half-created dest, never a pre-existing
      // table) on failure
      try Snapshots.dropTag(new Path(src.dataDir).getParent.toString, pinTag)
      catch { case _: Exception => () }
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
