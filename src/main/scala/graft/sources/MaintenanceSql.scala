package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL spellings for the table-maintenance operations, intercepted by the
  * injected parser BEFORE delegation (none of them are Spark grammar):
  *
  *  - `OPTIMIZE t` / `OPTIMIZE t SORT BY c` / `OPTIMIZE t ZORDER BY (a, b)`
  *    / `OPTIMIZE t WHERE day = '...' [SORT BY c]` (partition-scoped)
  *    → [[Compaction.compact]] (small-file consolidation, optionally
  *    sort- or Z-curve-clustered, optionally restricted to the identity
  *    partitions a decidable predicate selects);
  *  - `VACUUM t [RETAIN n SNAPSHOTS | OLDER THAN '<ts>']` →
  *    [[Snapshots.vacuum]] / [[Snapshots.vacuumOlderThan]];
  *  - `RESTORE [TABLE] t [TO] VERSION AS OF <v | 'tag'>` /
  *    `RESTORE ... TIMESTAMP AS OF '<ts>'` → [[Snapshots.restore]];
  *  - `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c1, c2]` (standard
  *    Spark grammar, but aimed at a graft catalog) → [[Analyze.run]];
  *  - `CHECKSUM TABLE t [GROUP BY c1, c2]` → order-independent content
  *    digest, optionally one row per group — the replica-diff primitive
  *    ([[GraftChecksumCommand]]);
  *  - `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF <v | 'tag'>]`
  *    → zero-copy table clone ([[ShallowClone]]).
  *
  * Each command resolves its identifier exactly like the view bridge: a
  * 3-part name whose head is a registered [[GraftCatalog]], or 1-2 parts
  * against the current catalog when that is one. Anything else falls
  * through to Spark untouched, so the interception is invisible outside
  * graft tables.
  */
object MaintenanceSql {

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([\w.`]+)(?:\s+WHERE\s+(.*?))?\s*(?:SORT\s+BY\s+\(?\s*([\w`]+(?:\s*,\s*[\w`]+)*)\s*\)?|ZORDER\s+BY\s+\(?\s*([\w`]+(?:\s*,\s*[\w`]+)*)\s*\)?)?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.`]+)\s*(?:RETAIN\s+(\d+)\s+SNAPSHOTS|OLDER\s+THAN\s+'([^']+)')?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.`]+)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(?:(\d+)|'([\w][\w.-]*)'|`([\w][\w.-]*)`)\s*;?\s*""".r
  private val RestoreTs =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.`]+)\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val AnalyzeSql =
    """(?is)\s*ANALYZE\s+TABLE\s+([\w.`]+)\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+COLUMNS\s+([\w`]+(?:\s*,\s*[\w`]+)*))?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r
  private val Checksum =
    """(?is)\s*CHECKSUM\s+TABLE\s+([\w.`]+)(?:\s+GROUP\s+BY\s+([\w`]+(?:\s*,\s*[\w`]+)*))?\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.`]+)\s*;?\s*""".r
  private val CreateTag =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+CREATE\s+TAG\s+`?([\w][\w.-]*)`?(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""".r
  private val DropTag =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+TAG\s+`?([\w][\w.-]*)`?\s*;?\s*""".r
  private val ShowTags =
    """(?is)\s*SHOW\s+TAGS\s+(?:IN\s+|FROM\s+)?([\w.`]+)\s*;?\s*""".r
  private val SetPartSpec =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+SET\s+PARTITION\s+SPEC\s*\(\s*(.*?)\s*\)\s*;?\s*""".r
  private val PublishWap =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+PUBLISH\s+WAP\s+'?`?([\w][\w.-]*)'?`?\s*;?\s*""".r
  private val DiscardWap =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DISCARD\s+WAP\s+'?`?([\w][\w.-]*)'?`?\s*;?\s*""".r
  private val ShowWap =
    """(?is)\s*SHOW\s+WAP\s+(?:IN\s+|FROM\s+)?([\w.`]+)\s*;?\s*""".r
  private val CreateMv =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s+AS\s+(.+?)\s*;?\s*""".r
  private val RefreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*""".r
  private val DropMv =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?([\w.`]+)\s*;?\s*""".r
  private val ShowMv =
    """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s+(?:IN\s+|FROM\s+)?([\w.`]+)\s*;?\s*""".r
  private val CloneTable =
    """(?is)\s*CREATE\s+TABLE\s+([\w.`]+)\s+SHALLOW\s+CLONE\s+([\w.`]+)(?:\s+VERSION\s+AS\s+OF\s+(?:(\d+)|'([\w][\w.-]*)'|`([\w][\w.-]*)`))?\s*;?\s*""".r

  private def parts(ident: String): Seq[String] =
    ident.split('.').map(_.stripPrefix("`").stripSuffix("`")).toSeq

  private def cols(s: String): Seq[String] =
    s.split(',').map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq

  /** Parse a maintenance statement, or None to delegate to Spark. Only
    * intercepts when the identifier resolves to a graft catalog. */
  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] = {
    def graft(p: Seq[String]): Boolean =
      GraftViewBridge.resolveIdent(session, p).isDefined
    sqlText match {
      case Optimize(id, where, sortBy, zorderBy) if graft(parts(id)) =>
        Some(GraftOptimizeCommand(parts(id),
          Option(sortBy).map(cols).getOrElse(Nil),
          Option(zorderBy).map(cols).getOrElse(Nil),
          Option(where).map(_.trim).filter(_.nonEmpty)))
      case Vacuum(id, retain, olderThan) if graft(parts(id)) =>
        Some(GraftVacuumCommand(parts(id),
          Option(retain).map(_.toInt).getOrElse(2),
          Option(olderThan).map(_.trim)))
      case Restore(id, v, tagQ, tagB) if graft(parts(id)) =>
        Some(GraftRestoreCommand(parts(id),
          Option(v).orElse(Option(tagQ)).getOrElse(tagB),
          refIsTag = v == null))
      case RestoreTs(id, ts) if graft(parts(id)) =>
        Some(GraftRestoreTsCommand(parts(id), ts.trim))
      case AnalyzeSql(id, forCols) if graft(parts(id)) =>
        Some(GraftAnalyzeCommand(parts(id),
          Option(forCols).map(cols).getOrElse(Nil)))
      case History(id) if graft(parts(id)) =>
        Some(GraftHistoryCommand(parts(id)))
      case Checksum(id, groupBy) if graft(parts(id)) =>
        Some(GraftChecksumCommand(parts(id),
          Option(groupBy).map(cols).getOrElse(Nil)))
      case Detail(id) if graft(parts(id)) =>
        Some(GraftDetailCommand(parts(id)))
      case CreateTag(id, name, v) if graft(parts(id)) =>
        Some(GraftCreateTagCommand(parts(id), name, Option(v).map(_.toLong)))
      case DropTag(id, name) if graft(parts(id)) =>
        Some(GraftDropTagCommand(parts(id), name))
      case ShowTags(id) if graft(parts(id)) =>
        Some(GraftShowTagsCommand(parts(id)))
      case PublishWap(id, wap) if graft(parts(id)) =>
        Some(GraftPublishWapCommand(parts(id), wap))
      case DiscardWap(id, wap) if graft(parts(id)) =>
        Some(GraftDiscardWapCommand(parts(id), wap))
      case ShowWap(id) if graft(parts(id)) =>
        Some(GraftShowWapCommand(parts(id)))
      case CloneTable(dst, src, v, tagQ, tagB)
          if graft(parts(src)) && graft(parts(dst)) =>
        Some(GraftShallowCloneCommand(parts(dst), parts(src),
          Option(v).orElse(Option(tagQ)).orElse(Option(tagB))))
      case CreateMv(id, select) if graft(parts(id)) =>
        Some(GraftCreateMvCommand(parts(id), select.trim))
      case RefreshMv(id) if graft(parts(id)) =>
        Some(GraftRefreshMvCommand(parts(id)))
      case DropMv(ifExists, id) if graft(parts(id)) =>
        Some(GraftDropMvCommand(parts(id), ifExists != null))
      case ShowMv(ns) if graft(parts(ns) :+ "_") => // ident is a NAMESPACE
        Some(GraftShowMvCommand(parts(ns)))
      case SetPartSpec(id, specText) if graft(parts(id)) =>
        // split on top-level commas only: bucket(8, id) keeps its own
        val specs = scala.collection.mutable.ArrayBuffer[String]()
        var depth = 0; val cur = new StringBuilder
        specText.foreach {
          case '(' => depth += 1; cur.append('(')
          case ')' => depth -= 1; cur.append(')')
          case ',' if depth == 0 => specs += cur.toString; cur.clear()
          case c => cur.append(c)
        }
        if (cur.nonEmpty) specs += cur.toString
        Some(GraftSetPartitionSpecCommand(parts(id),
          specs.toSeq.map(_.replaceAll("\\s+", "").replace("`", ""))
            .filter(_.nonEmpty)))
      case _ => None
    }
  }

  /** Data-changing maintenance (RESTORE, PUBLISH/DISCARD WAP) bypasses
    * the DSv2 write exec whose callback refreshes cached plans — without
    * an explicit refresh, `CACHE TABLE t` would keep serving the
    * pre-command contents (plan-cache substitution is possible precisely
    * because [[GraftTable]] has value equality). */
  private[sources] def refreshCache(session: SparkSession, parts: Seq[String]): Unit =
    session.catalog.refreshTable(parts.map(p => s"`$p`").mkString("."))

  private[sources] def loadGraftTable(
      session: SparkSession, p: Seq[String]): (GraftTable, String) = {
    val (cat, ident) = GraftViewBridge.resolveIdent(session, p).getOrElse(
      throw new IllegalArgumentException(s"graft: ${p.mkString(".")} is not a graft table"))
    val t = cat.loadTable(ident).asInstanceOf[GraftTable]
    (t, new org.apache.hadoop.fs.Path(t.dataDir).getParent.toString)
  }

  private[sources] def attr(name: String, dt: org.apache.spark.sql.types.DataType): Attribute =
    AttributeReference(name, dt, nullable = false)()
}

final case class GraftOptimizeCommand(
    parts: Seq[String], sortBy: Seq[String], zorderBy: Seq[String],
    where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("files_removed", IntegerType),
    MaintenanceSql.attr("files_written", IntegerType))

  /** `OPTIMIZE ... WHERE` predicate → sources.Filter: the decidable
    * comparison shapes over plain column names (=, <, <=, >, >=, IN,
    * AND/OR) — anything else fails loudly; Compaction then re-validates
    * that every referenced column is an identity partition column. */
  private def toFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.sources.Filter = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.{sources => sf}
    def ext(l: Literal): Any =
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType)
    e match {
      case And(l, r) => sf.And(toFilter(l), toFilter(r))
      case Or(l, r) => sf.Or(toFilter(l), toFilter(r))
      case EqualTo(a: UnresolvedAttribute, l: Literal) => sf.EqualTo(a.name, ext(l))
      case EqualTo(l: Literal, a: UnresolvedAttribute) => sf.EqualTo(a.name, ext(l))
      case GreaterThan(a: UnresolvedAttribute, l: Literal) => sf.GreaterThan(a.name, ext(l))
      case GreaterThan(l: Literal, a: UnresolvedAttribute) => sf.LessThan(a.name, ext(l))
      case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) =>
        sf.GreaterThanOrEqual(a.name, ext(l))
      case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) =>
        sf.LessThanOrEqual(a.name, ext(l))
      case LessThan(a: UnresolvedAttribute, l: Literal) => sf.LessThan(a.name, ext(l))
      case LessThan(l: Literal, a: UnresolvedAttribute) => sf.GreaterThan(a.name, ext(l))
      case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) =>
        sf.LessThanOrEqual(a.name, ext(l))
      case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) =>
        sf.GreaterThanOrEqual(a.name, ext(l))
      case In(a: UnresolvedAttribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        sf.In(a.name, vs.map(v => ext(v.asInstanceOf[Literal])).toArray)
      case other => throw new IllegalArgumentException(
        s"graft: OPTIMIZE ... WHERE supports =, <, <=, >, >=, IN, AND, OR " +
          s"over partition columns; cannot use: ${other.sql}")
    }
  }

  override def run(session: SparkSession): Seq[Row] = {
    val (t, _) = MaintenanceSql.loadGraftTable(session, parts)
    val filters = where.toSeq.map(w =>
      toFilter(session.sessionState.sqlParser.parseExpression(w)))
    val (removed, written) = Compaction.compact(
      session, t, sortBy = sortBy, zorderBy = zorderBy,
      partitionFilter = filters)
    Seq(Row(removed, written))
  }
}

/** `olderThan`: a timestamp spelling ([[Snapshots.parseTsMillis]]) for
  * time-based retention — `VACUUM t OLDER THAN '2026-08-01'` expires
  * every snapshot committed before that instant (tagged snapshots,
  * delta-chain bases and the live head always survive). Without it,
  * count-based retention (`RETAIN n SNAPSHOTS`, default 2). */
final case class GraftVacuumCommand(parts: Seq[String], retain: Int,
    olderThan: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("files_deleted", IntegerType),
    MaintenanceSql.attr("snapshots_dropped", IntegerType))
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    val (files, snaps) = olderThan match {
      case Some(ts) =>
        Snapshots.vacuumOlderThan(tableDir, Snapshots.parseTsMillis(ts))
      case None => Snapshots.vacuum(tableDir, retain = retain)
    }
    Seq(Row(files, snaps))
  }
}

/** `ref` is a snapshot number (bare digits) or a tag name (quoted) —
  * tag-ness is decided by the PARSER, not re-guessed from the string, and
  * the tag resolves at run so `RESTORE ... VERSION AS OF 'train-v1'`
  * follows the tag's CURRENT value. */
final case class GraftRestoreCommand(parts: Seq[String], ref: String,
    refIsTag: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("restored_to", LongType),
    MaintenanceSql.attr("new_version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    val version =
      if (!refIsTag) ref.toLong
      else {
        // tags are non-numeric by construction (Snapshots.tag enforces it)
        require(!ref.forall(_.isDigit),
          s"graft: '$ref' cannot be a tag (tag names are non-numeric); " +
            "drop the quotes to restore to a version number")
        val dataDir = new org.apache.hadoop.fs.Path(tableDir, "data")
        val fs = dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
        Snapshots.tags(fs, dataDir).getOrElse(ref, throw new IllegalArgumentException(
          s"graft: no tag '$ref' on $tableDir (SHOW TAGS lists them)"))
      }
    val nv = Snapshots.restore(tableDir, version)
    MaintenanceSql.refreshCache(session, parts)
    Seq(Row(version, nv))
  }
}

/** `RESTORE ... TIMESTAMP AS OF '<ts>'`: latest snapshot committed at or
  * before the given instant (UTC when no zone given — the project's pinned
  * session semantics). */
final case class GraftRestoreTsCommand(parts: Seq[String], ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("restored_to", LongType),
    MaintenanceSql.attr("new_version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    val dataDir = new org.apache.hadoop.fs.Path(tableDir, "data")
    val fs = dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val version = Snapshots.latestAsOf(fs, dataDir, Snapshots.parseTsMillis(ts))
      .getOrElse(throw new IllegalArgumentException(
        s"graft: no snapshot at or before $ts on $tableDir"))
    val nv = Snapshots.restore(tableDir, version)
    MaintenanceSql.refreshCache(session, parts)
    Seq(Row(version, nv))
  }
}

final case class GraftAnalyzeCommand(parts: Seq[String], forCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(session: SparkSession): Seq[Row] = {
    val (t, _) = MaintenanceSql.loadGraftTable(session, parts)
    Analyze.run(session, t, forCols)
    Nil
  }
}

final case class GraftSetPartitionSpecCommand(parts: Seq[String], specs: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViewBridge.resolveIdent(session, parts).getOrElse(
      throw new IllegalArgumentException(
        s"graft: ${parts.mkString(".")} is not a graft table"))
    cat.setPartitionSpec(ident, specs)
    Nil
  }
}

final case class GraftCreateTagCommand(
    parts: Seq[String], name: String, version: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("tagged_version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    Seq(Row(Snapshots.tag(tableDir, name, version)))
  }
}

final case class GraftDropTagCommand(parts: Seq[String], name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    Snapshots.dropTag(tableDir, name)
    Nil
  }
}

/** `ALTER TABLE t PUBLISH WAP 'id'` — fold a staged write-audit-publish
  * commit into the live table (see [[Snapshots.stageWap]]). */
final case class GraftPublishWapCommand(parts: Seq[String], wapId: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("published_version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    val v = Snapshots.publishWap(tableDir, wapId)
    MaintenanceSql.refreshCache(session, parts)
    Seq(Row(v))
  }
}

/** `ALTER TABLE t DISCARD WAP 'id'` — delete a staged commit's files. */
final case class GraftDiscardWapCommand(parts: Seq[String], wapId: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("files_discarded", IntegerType))
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    val n = Snapshots.discardWap(tableDir, wapId)
    MaintenanceSql.refreshCache(session, parts)
    Seq(Row(n))
  }
}

/** `SHOW WAP IN t` — staged (unpublished) WAP ids. */
final case class GraftShowWapCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("wap_id", org.apache.spark.sql.types.StringType))
  override def run(session: SparkSession): Seq[Row] = {
    val (t, _) = MaintenanceSql.loadGraftTable(session, parts)
    val dataDir = new org.apache.hadoop.fs.Path(t.dataDir)
    Snapshots.listWap(
      dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration()), dataDir)
      .map(Row(_))
  }
}

final case class GraftShowTagsCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("tag", org.apache.spark.sql.types.StringType),
    MaintenanceSql.attr("version", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val (t, _) = MaintenanceSql.loadGraftTable(session, parts)
    val dataDir = new org.apache.hadoop.fs.Path(t.dataDir)
    Snapshots.tags(dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration()),
        dataDir)
      .toSeq.sortBy(_._1).map { case (n, v) => Row(n, v) }
  }
}

/** `DESCRIBE DETAIL t` — the one-row operational summary (location,
  * file/row/byte totals, partitioning, sort clustering, mutation mode,
  * current snapshot version, outstanding delete files) straight from the
  * stats registry and `_meta.yml`: zero data I/O at any table size.
  * `rows` is the REGISTERED data-file total — an upper bound on live
  * rows while merge-on-read deletes are outstanding (the same reason
  * COUNT(*) pushdown is withheld then); `delete_rows` counts the
  * registered delete entries so the gap is visible. */
final case class GraftDetailCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("location", StringType),
    MaintenanceSql.attr("format", StringType),
    MaintenanceSql.attr("version", LongType),
    MaintenanceSql.attr("num_files", LongType),
    MaintenanceSql.attr("num_delete_files", LongType),
    MaintenanceSql.attr("rows", LongType),
    MaintenanceSql.attr("delete_rows", LongType),
    MaintenanceSql.attr("size_bytes", LongType),
    MaintenanceSql.attr("partition_columns", StringType),
    MaintenanceSql.attr("sort_columns", StringType),
    MaintenanceSql.attr("mutation_mode", StringType))

  override def run(session: SparkSession): Seq[Row] = {
    val (t, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    val dataDir = new org.apache.hadoop.fs.Path(t.dataDir)
    val fs = dataDir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val stats = TableStats.read(fs, dataDir)
    val (dels, datas) = stats.partition(e => GraftDeletes.isDeleteRel(e._1))
    val version = MaterializedViews.currentVersion(t.dataDir)
    val props = t.properties()
    Seq(Row(tableDir, "graft", version,
      datas.size.toLong, dels.size.toLong,
      datas.valuesIterator.map(_.rows).sum,
      dels.valuesIterator.map(_.rows).sum,
      datas.valuesIterator.map(e => math.max(e.bytes, 0L)).sum,
      t.partitionSpecs.mkString(","),
      String.valueOf(Option(props.get("write.sort.columns")).getOrElse("")),
      String.valueOf(Option(props.get(GraftDeletes.ModeProp))
        .getOrElse("copy-on-write"))))
  }
}

/** `CHECKSUM TABLE t` — an order-independent digest of the table's LIVE
  * logical content: `sum(xxhash64(c1, ..., cn) :: decimal(38,0))` over
  * one distributed scan, plus the exact row count. Two tables holding the
  * same rows checksum equal REGARDLESS of physical layout — file count,
  * partitioning, clustering, row order, copy-on-write vs merge-on-read
  * history (the digest reads through the scan, so outstanding equality
  * deletes are applied) — which makes it the replica-verification
  * primitive pairing with the CDC apply path: compare one row per side
  * instead of shipping either table. Column ORDER and types follow the
  * table schema (replicas must share the declaration, which the CDC
  * apply path guarantees). The per-row hash skips NULL-valued columns
  * (xxhash64 semantics), so rows differing only in WHICH of two
  * same-typed columns is null can collide — a checksum, not a proof;
  * the decimal(38,0) accumulation is overflow-free to ~2^63 rows. */
final case class GraftChecksumCommand(parts: Seq[String],
    groupCols: Seq[String] = Nil)
    extends LeafRunnableCommand {
  /** `GROUP BY c1, c2` adds the group columns (external STRING form —
    * the command's output schema cannot depend on the table's) ahead of
    * rows/checksum: ONE digest row per group, the replica-DIFF
    * primitive — compare two |groups|-row frames, repair only the
    * groups that differ (see q167). Group columns join the per-row hash
    * implicitly (they are table columns), so a row moving between
    * groups changes both groups' digests. */
  override val output: Seq[Attribute] =
    groupCols.map(MaintenanceSql.attr(_,
      org.apache.spark.sql.types.StringType)) ++ Seq(
    MaintenanceSql.attr("rows", LongType),
    MaintenanceSql.attr("checksum",
      org.apache.spark.sql.types.DecimalType(38, 0)))
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions._
    val df = session.table(parts.map(p => s"`$p`").mkString("."))
    val cks = coalesce(
      sum(xxhash64(df.schema.fieldNames.toIndexedSeq.map(col): _*)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
      lit(java.math.BigDecimal.ZERO)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("checksum")
    if (groupCols.isEmpty) {
      val row = df.agg(count(lit(1)).cast("long").as("rows"), cks).head()
      Seq(Row(row.getLong(0), row.getDecimal(1)))
    } else {
      df.groupBy(groupCols.map(c => col(s"`$c`").cast("string").as(c)): _*)
        .agg(count(lit(1)).cast("long").as("rows"), cks)
        .orderBy(groupCols.map(c => col(s"`$c`")): _*)
        .collect().toSeq
    }
  }
}

final case class GraftHistoryCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    MaintenanceSql.attr("version", LongType),
    MaintenanceSql.attr("committed_at",
      org.apache.spark.sql.types.TimestampType),
    MaintenanceSql.attr("files", LongType),
    MaintenanceSql.attr("rows", LongType),
    MaintenanceSql.attr("bytes", LongType))
  override def run(session: SparkSession): Seq[Row] = {
    val (_, tableDir) = MaintenanceSql.loadGraftTable(session, parts)
    Snapshots.history(session, tableDir).collect().toSeq
  }
}
