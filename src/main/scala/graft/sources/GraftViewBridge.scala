package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL bridge for graft views. Spark 4.1 ships the DSv2 `ViewCatalog`
  * interface but wires neither view DDL nor view resolution to it (the
  * analyzer rejects `CREATE VIEW` on any non-session catalog with
  * MISSING_CATALOG_ABILITY before extension resolution rules run). This
  * bridge supplies the missing wiring without touching Spark internals:
  *
  *  - [[GraftViewSqlParser]] (via `injectParser`) rewrites parsed
  *    CREATE/DROP/SHOW VIEW plans that target a [[GraftCatalog]] into
  *    runnable commands against its `ViewCatalog` implementation;
  *  - [[GraftViewSubstitution]] (via `injectResolutionRule`) expands a
  *    stored view's SQL text in place of the unresolved relation — the
  *    same expand-at-resolution semantics as the reference
  *    (`HBaseSessionCatalog.scala:63-155`).
  *
  * View text is re-analyzed in the CURRENT catalog/namespace context, so
  * view bodies should use qualified table names (stored views created via
  * the bridge keep their creation context in metadata for inspection).
  */
object GraftViewBridge {

  private def catalogOf(session: SparkSession, name: String): Option[GraftCatalog] =
    Try(session.sessionState.catalogManager.catalog(name)).toOption.collect {
      case g: GraftCatalog => g
    }

  /** `cat.ns.view` → (catalog, ident) when `cat` is a registered graft
    * catalog; 1-2 part names resolve against the current catalog if THAT
    * is a graft catalog. */
  def resolveIdent(session: SparkSession, parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    if (parts.length >= 3)
      catalogOf(session, parts.head)
        .map(c => (c, Identifier.of(parts.tail.init.toArray, parts.last)))
    else
      session.sessionState.catalogManager.currentCatalog match {
        case g: GraftCatalog if parts.nonEmpty =>
          val ns =
            if (parts.length == 2) Array(parts.head)
            else session.sessionState.catalogManager.currentNamespace
          Some((g, Identifier.of(ns, parts.last)))
        case _ => None
      }

  def lookupViewSql(session: SparkSession, parts: Seq[String]): Option[String] =
    resolveIdent(session, parts).flatMap { case (c, id) => c.lookupViewSqlCached(id) }

  /** Parse-time plan rewrite: view DDL aimed at a graft catalog becomes a
    * graft command; everything else passes through untouched. */
  def rewrite(session: SparkSession, plan: LogicalPlan): LogicalPlan = {
    def partsOf(child: LogicalPlan): Option[Seq[String]] = child match {
      case UnresolvedIdentifier(parts, _) => Some(parts)
      case u: UnresolvedView => Some(u.multipartIdentifier)
      case _ => None
    }
    plan match {
      case CreateView(UnresolvedIdentifier(parts, _), cols, comment, _, props,
          originalText, _, allowExisting, replace, _)
          if cols.isEmpty && originalText.isDefined &&
            parts.length >= 3 && catalogOf(session, parts.head).isDefined =>
        GraftCreateViewCommand(parts, originalText.get, allowExisting, replace,
          props, comment)
      case DropView(child, ifExists) =>
        partsOf(child).filter(p => p.length >= 3 && catalogOf(session, p.head).isDefined)
          .map(p => GraftDropViewCommand(p, ifExists))
          .getOrElse(plan)
      case sv @ ShowViews(ns: UnresolvedNamespace, pattern, output)
          if ns.multipartIdentifier.nonEmpty &&
            catalogOf(session, ns.multipartIdentifier.head).isDefined =>
        GraftShowViewsCommand(ns.multipartIdentifier, pattern, sv.output)
      case other => other
    }
  }
}

/** Delegating parser that applies [[GraftViewBridge.rewrite]] to every
  * parsed plan. Registered by `GraftExtensions` via `injectParser`. */
final class GraftViewSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    MaintenanceSql.parse(session, sqlText).getOrElse(
      GraftViewBridge.rewrite(session, delegate.parsePlan(sqlText)))
  override def parsePlanWithParameters(sqlText: String, ctx: ParameterContext): LogicalPlan =
    MaintenanceSql.parse(session, sqlText).getOrElse(
      GraftViewBridge.rewrite(session, delegate.parsePlanWithParameters(sqlText, ctx)))
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

/** Analyzer rule: an unresolved relation naming a stored graft view is
  * replaced by the parsed view text (expand-at-resolution). Tables are
  * never touched — substitution only fires when a `_view.yml` exists. */
final case class GraftViewSubstitution(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      GraftViewBridge.lookupViewSql(session, u.multipartIdentifier)
        .map(sql => SubqueryAlias(u.multipartIdentifier.last,
          session.sessionState.sqlParser.parsePlan(sql)))
        .getOrElse(u)
  }
}

final case class GraftCreateViewCommand(
    parts: Seq[String],
    viewSql: String,
    allowExisting: Boolean,
    replace: Boolean,
    props: Map[String, String],
    comment: Option[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViewBridge.resolveIdent(session, parts).get
    if (cat.viewExists(ident)) {
      if (replace) cat.dropView(ident)
      else if (allowExisting) return Nil
      // plain CREATE over an existing view: fall through, createView throws
    }
    // analyze the body now: validates it and captures the schema
    val analyzed = session.sessionState
      .executePlan(session.sessionState.sqlParser.parsePlan(viewSql)).analyzed
    val cm = session.sessionState.catalogManager
    cat.createView(new ViewInfo(ident, viewSql, cm.currentCatalog.name(),
      cm.currentNamespace, analyzed.schema, analyzed.schema.fieldNames,
      Array.empty, Array.empty,
      (props ++ comment.map("comment" -> _)).asJava))
    Nil
  }
}

final case class GraftDropViewCommand(parts: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViewBridge.resolveIdent(session, parts).get
    if (!cat.dropView(ident) && !ifExists) throw new NoSuchViewException(ident)
    Nil
  }
}

final case class GraftShowViewsCommand(
    nsParts: Seq[String],
    pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(nsParts.head)
      .asInstanceOf[GraftCatalog]
    val ns = nsParts.tail
    val regex = pattern.map(p => p.replace("*", ".*").r)
    cat.listViews(ns: _*).toSeq
      .filter(id => regex.forall(_.matches(id.name())))
      .map(id => Row(ns.mkString("."), id.name(), false))
  }
}
