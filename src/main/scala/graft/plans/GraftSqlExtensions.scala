package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, RelationTimeTravel, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateMaterializedViewAsSelect, CreateView, DescribeRelation, DropView, LeafCommand, LogicalPlan, SetViewProperties, ShowCreateTable, ShowViews, SubqueryAlias, UnaryCommand, UnresolvedTableSpec, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, StructType, TimestampType}

import graft.sources.{GraftView, SnapshotCatalog}

/** The SQL surface Spark 4.1 does not route to V2 catalogs natively,
  * carried through session extensions exactly the way Iceberg's runtime
  * carries it (`IcebergSparkSessionExtensions`: parser + resolution rule +
  * planner strategy):
  *
  *   - `CREATE [OR REPLACE] VIEW cat.ns.v AS …` / `DROP VIEW` — Spark's
  *     `ResolveSessionCatalog` throws `missingCatalogViewsAbilityError`
  *     for ANY non-session `CreateView` (there is no V2 CreateViewExec in
  *     4.1), so the statements are intercepted at PARSE time, before that
  *     rule can see them, and re-planned onto the catalog's `ViewCatalog`
  *     face. Reads expand eagerly in [[GraftViewReads]].
  *   - `ALTER TABLE t ADD/DROP PARTITION FIELD <transform>` — Iceberg's
  *     spec-evolution dialect; Spark's grammar rejects it, so the parse
  *     failure falls through to a hand parser that routes to the SAME
  *     `evolvePartitionSpec` mechanism as
  *     `CALL cat.system.evolve_partition_spec`.
  */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan =
      try delegate.parsePlan(sqlText)
      catch {
        case e: ParseException =>
          GraftAlterPartitionField.parse(sqlText, delegate)
            .orElse(GraftMvSql.parse(sqlText, delegate))
            .getOrElse(throw e)
      }
    rewriteViewCommands(plan)
  }

  /** Reroute view DDL aimed at a graft catalog; session-catalog view DDL
    * (temp views, spark_catalog) passes through untouched. */
  private def rewriteViewCommands(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, originalText, query, allowExisting, replace, _)
        if GraftCatalogs.owns(parts) =>
      GraftCreateView(parts, cols, comment, props, originalText, query,
        allowExisting, replace)
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists)
        if GraftCatalogs.owns(parts) =>
      GraftDropView(parts, ifExists)
    // SHOW VIEWS IN cat.ns — ResolveSessionCatalog throws
    // missingCatalogViewsAbility for any non-session namespace, so this
    // is intercepted at parse like CREATE/DROP.
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, out)
        if parts.nonEmpty && GraftCatalogs.resolve(parts.head).isDefined =>
      GraftShowViews(parts, pattern, out)
    // DESCRIBE over a graft VIEW (a table ident falls through untouched:
    // the existence probe is O(1) against the view's v1 claim file).
    case dr @ DescribeRelation(u: UnresolvedTableOrView, spec, extended, out)
        if spec.isEmpty && GraftCatalogs.isView(u.multipartIdentifier) =>
      GraftDescribeView(u.multipartIdentifier, extended, out)
    // CREATE MATERIALIZED VIEW parses natively in Spark 4.1 — but only
    // Declarative Pipelines can execute it; outside a pipeline it fails
    // in analysis. Re-plan it onto the catalog's MV mechanism
    // ([[graft.sources.MaterializedViews]]), keeping the body as the
    // child so the analyzer resolves it before the maintainability check.
    case mv: CreateMaterializedViewAsSelect
        if ownsIdent(mv.name) && mv.columns.isEmpty =>
      val UnresolvedIdentifier(parts, _) = mv.name: @unchecked
      val (props, comment) = mv.tableSpec match {
        case u: UnresolvedTableSpec => (u.properties, u.comment)
        case t: org.apache.spark.sql.catalyst.plans.logical.TableSpec =>
          (t.properties, t.comment)
        case _ => (Map.empty[String, String], None)
      }
      GraftCreateMaterializedView(parts, mv.partitioning,
        props ++ comment.map("comment" -> _),
        Option(mv.originalText).getOrElse(sys.error(
          "CREATE MATERIALIZED VIEW needs the original query text")),
        mv.query, mv.ifNotExists)
    case mv: CreateMaterializedViewAsSelect if ownsIdent(mv.name) =>
      sys.error("CREATE MATERIALIZED VIEW with an explicit column list " +
        "is not supported — the view's schema is its body's (alias " +
        "columns in the SELECT)")
    // ALTER VIEW on a graft catalog: Spark's ResolveSessionCatalog throws
    // missingCatalogViewsAbility for all of these, so they are re-planned
    // at parse like CREATE/DROP. `… AS` appends the next DEFINITION
    // version; SET/UNSET TBLPROPERTIES append a properties-only version.
    case AlterViewAs(u: UnresolvedView, originalText, query)
        if GraftCatalogs.owns(u.multipartIdentifier) =>
      GraftAlterViewAs(u.multipartIdentifier, originalText, query)
    case SetViewProperties(u: UnresolvedView, props)
        if GraftCatalogs.owns(u.multipartIdentifier) =>
      GraftSetViewProperties(u.multipartIdentifier, props)
    case UnsetViewProperties(u: UnresolvedView, keys, ifExists)
        if GraftCatalogs.owns(u.multipartIdentifier) =>
      GraftUnsetViewProperties(u.multipartIdentifier, keys, ifExists)
    // SHOW CREATE TABLE over a graft VIEW renders the view DDL (Spark's
    // native v2 exec serves graft TABLES); `SHOW CREATE VIEW` is not in
    // Spark's grammar and arrives via the hand parser below.
    case ShowCreateTable(u: UnresolvedTableOrView, _, out)
        if GraftCatalogs.isView(u.multipartIdentifier) =>
      GraftShowCreateView(u.multipartIdentifier, out)
    case other => other
  }

  private def ownsIdent(name: LogicalPlan): Boolean = name match {
    case UnresolvedIdentifier(parts, _) => GraftCatalogs.owns(parts)
    case _ => false
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Which multipart identifiers belong to a [[SnapshotCatalog]]? Decided
  * from the ACTIVE session's catalog manager (parse time has a session:
  * `sql()` sets it). Head-qualified names only — the engine's sessions
  * keep `spark_catalog` current, so graft views are always written
  * catalog-qualified. */
private[plans] object GraftCatalogs {
  def owns(parts: Seq[String]): Boolean =
    parts.length >= 2 && resolve(parts.head).isDefined

  def resolve(name: String): Option[SnapshotCatalog] =
    SparkSession.getActiveSession.flatMap { s =>
      val cm = s.sessionState.catalogManager
      try {
        if (!cm.isCatalogRegistered(name)) None
        else cm.catalog(name) match {
          case c: SnapshotCatalog => Some(c)
          case _ => None
        }
      } catch { case _: Exception => None }
    }

  def isView(parts: Seq[String]): Boolean =
    owns(parts) && {
      val (c, id) = identOf(parts)
      c.viewExists(id)
    }

  /** (catalog, namespace-qualified Identifier) of `parts`. */
  def identOf(parts: Seq[String]): (SnapshotCatalog, Identifier) = {
    val cat = resolve(parts.head).getOrElse(sys.error(
      s"'${parts.head}' is not a graft snapshot catalog"))
    (cat, Identifier.of(parts.tail.init.toArray, parts.last))
  }
}

/** `CREATE [OR REPLACE] VIEW` on a graft catalog. The query rides as the
  * child so the analyzer RESOLVES it before execution — a definition that
  * does not analyze never lands in the log, and its analyzed schema is
  * what the log stores. */
final case class GraftCreateView(parts: Seq[String],
    userCols: Seq[(String, Option[String])], comment: Option[String],
    properties: Map[String, String], originalText: Option[String],
    query: LogicalPlan, allowExisting: Boolean, replace: Boolean)
    extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftCreateView =
    copy(query = newChild)
}

final case class GraftDropView(parts: Seq[String], ifExists: Boolean)
    extends LeafCommand

/** `CREATE MATERIALIZED VIEW` on a graft catalog — the body rides as the
  * child so it analyzes before [[graft.sources.MaterializedViews]] checks
  * maintainability. The check runs at ANALYSIS time ([[GraftMvValidate]])
  * against the resolved-but-unoptimized plan and stows its result in
  * `spec`: by execution the optimizer has pushed filters INTO the scan
  * and collapsed the relation to a ScanRelation, so a WHERE extracted
  * from the optimized child could silently vanish — and a lost predicate
  * means every later refresh folds unfiltered deltas. */
final case class GraftCreateMaterializedView(parts: Seq[String],
    partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
    userProps: Map[String, String], bodySql: String, query: LogicalPlan,
    ifNotExists: Boolean,
    spec: Option[(graft.sources.MaterializedViews.Spec, StructType)] = None)
    extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(newChild: LogicalPlan):
      GraftCreateMaterializedView = copy(query = newChild)
}

/** Analysis-time maintainability validation + spec extraction (see
  * [[GraftCreateMaterializedView.spec]]). */
final case class GraftMvValidate(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case c: GraftCreateMaterializedView if c.query.resolved && c.spec.isEmpty =>
      c.copy(spec = Some((
        graft.sources.MaterializedViews.extract(c.parts.head, c.query),
        c.query.schema)))
    case other => other
  }
}

final case class GraftDropMaterializedView(parts: Seq[String],
    ifExists: Boolean) extends LeafCommand

/** `ALTER VIEW … AS <query>` — the next DEFINITION version: new SQL +
  * freshly analyzed schema under the CURRENT session context (the same
  * capture CREATE does), properties carried over, column aliases reset
  * (the new body's own names stand). */
final case class GraftAlterViewAs(parts: Seq[String],
    originalText: String, query: LogicalPlan) extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(newChild: LogicalPlan):
      GraftAlterViewAs = copy(query = newChild)
}

final case class GraftSetViewProperties(parts: Seq[String],
    properties: Map[String, String]) extends LeafCommand

final case class GraftUnsetViewProperties(parts: Seq[String],
    keys: Seq[String], ifExists: Boolean) extends LeafCommand

final case class GraftShowCreateView(parts: Seq[String],
    override val output: Seq[Attribute]) extends LeafCommand

object GraftShowCreateView {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType
  def outputAttrs: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", StringType, nullable = false)())
}

final case class GraftRefreshMaterializedView(parts: Seq[String],
    override val output: Seq[Attribute]) extends LeafCommand

object GraftRefreshMaterializedView {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{BooleanType, LongType}
  def outputAttrs: Seq[Attribute] = Seq(
    AttributeReference("from_version", LongType, nullable = false)(),
    AttributeReference("to_version", LongType, nullable = false)(),
    AttributeReference("refreshed", BooleanType, nullable = false)())
}

final case class GraftShowViews(parts: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafCommand

final case class GraftDescribeView(parts: Seq[String], isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafCommand

object GraftViewStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: GraftCreateView if c.query.resolved => GraftCreateViewExec(c) :: Nil
    case d: GraftDropView => GraftDropViewExec(d) :: Nil
    case c: GraftCreateMaterializedView if c.spec.isDefined =>
      GraftCreateMaterializedViewExec(c) :: Nil
    case d: GraftDropMaterializedView =>
      GraftDropMaterializedViewExec(d) :: Nil
    case r: GraftRefreshMaterializedView =>
      GraftRefreshMaterializedViewExec(r) :: Nil
    case a: GraftAlterViewAs if a.query.resolved =>
      GraftAlterViewAsExec(a) :: Nil
    case s: GraftSetViewProperties => GraftSetViewPropertiesExec(s) :: Nil
    case u: GraftUnsetViewProperties => GraftUnsetViewPropertiesExec(u) :: Nil
    case s: GraftShowCreateView => GraftShowCreateViewExec(s) :: Nil
    case v: GraftShowViews => GraftShowViewsExec(v) :: Nil
    case v: GraftDescribeView => GraftDescribeViewExec(v) :: Nil
    case e: GraftEvolveSpecField => GraftEvolveSpecFieldExec(e) :: Nil
    case _ => Nil
  }
}

private[plans] trait GraftCommandExec extends LeafExecNode {
  def run(): Unit
  override def output: Seq[Attribute] = Nil
  override def executeCollect(): Array[InternalRow] = { run(); Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    run(); sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }
}

final case class GraftCreateViewExec(c: GraftCreateView) extends GraftCommandExec {
  override def run(): Unit = {
    val (cat, ident) = GraftCatalogs.identOf(c.parts)
    if (c.allowExisting && cat.viewExists(ident)) return
    val sql = c.originalText.getOrElse(throw new IllegalArgumentException(
      "CREATE VIEW needs the original query text"))
    val qSchema = c.query.schema
    require(c.userCols.isEmpty || c.userCols.length == qSchema.length,
      s"view column list has ${c.userCols.length} names for " +
        s"${qSchema.length} query columns")
    val schema =
      if (c.userCols.isEmpty) qSchema
      else StructType(qSchema.fields.zip(c.userCols).map { case (f, (n, _)) =>
        f.copy(name = n) })
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema,
      qSchema.fieldNames, c.userCols.map(_._1).toArray,
      c.userCols.map(_._2.orNull).toArray, {
        val m = new java.util.HashMap[String, String]()
        c.properties.foreach { case (k, v) => m.put(k, v) }
        // The view-level COMMENT rides as the reserved property
        // (ViewCatalog.PROP_COMMENT) — V1 views store it the same way.
        c.comment.foreach(m.put("comment", _))
        m
      })
    if (c.replace) cat.replaceView(info, true) else cat.createView(info)
    ()
  }
}

final case class GraftCreateMaterializedViewExec(c: GraftCreateMaterializedView)
    extends GraftCommandExec {
  override def run(): Unit = {
    val (cat, ident) = GraftCatalogs.identOf(c.parts)
    val (spec, schema) = c.spec.getOrElse(sys.error(
      "internal: CREATE MATERIALIZED VIEW reached execution unvalidated"))
    graft.sources.MaterializedViews.create(session, cat, ident, c.bodySql,
      spec, schema, c.ifNotExists, c.partitioning.toArray, c.userProps,
      Some(c.query))
  }
}

final case class GraftDropMaterializedViewExec(d: GraftDropMaterializedView)
    extends GraftCommandExec {
  override def run(): Unit = {
    val (cat, ident) = GraftCatalogs.identOf(d.parts)
    graft.sources.MaterializedViews.drop(cat, ident, d.ifExists)
  }
}

/** `REFRESH MATERIALIZED VIEW` — sugar over the refresh_mv procedure
  * (same mechanism), returning the watermark movement as rows. */
final case class GraftRefreshMaterializedViewExec(r: GraftRefreshMaterializedView)
    extends LeafExecNode {
  override def output: Seq[Attribute] = r.output
  private def rows(): Array[InternalRow] = {
    GraftCatalogs.identOf(r.parts) // asserts graft ownership, loudly
    val (from, to, refreshed) = graft.sources.MaterializedViews.refresh(
      session, r.parts.head, r.parts.tail, recover = false)
    Array(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](from, to, refreshed)): InternalRow)
  }
  override def executeCollect(): Array[InternalRow] = rows()
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows().toSeq, 1)
}

final case class GraftAlterViewAsExec(a: GraftAlterViewAs)
    extends GraftCommandExec {
  override def run(): Unit = {
    val (cat, ident) = GraftCatalogs.identOf(a.parts)
    val cur = cat.loadViewVersion(ident, None) // loud NoSuchView if absent
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(ident, a.originalText, cm.currentCatalog.name(),
      cm.currentNamespace, a.query.schema, a.query.schema.fieldNames,
      Array.empty, Array.empty, cur.properties())
    cat.replaceView(info, true)
    ()
  }
}

final case class GraftSetViewPropertiesExec(s: GraftSetViewProperties)
    extends GraftCommandExec {
  import org.apache.spark.sql.connector.catalog.ViewChange
  override def run(): Unit = {
    val (cat, ident) = GraftCatalogs.identOf(s.parts)
    val changes = s.properties.toSeq.map { case (k, v) =>
      ViewChange.setProperty(k, v): ViewChange }
    cat.alterView(ident, changes: _*)
    ()
  }
}

final case class GraftUnsetViewPropertiesExec(u: GraftUnsetViewProperties)
    extends GraftCommandExec {
  import org.apache.spark.sql.connector.catalog.ViewChange
  override def run(): Unit = {
    val (cat, ident) = GraftCatalogs.identOf(u.parts)
    val cur = cat.loadViewVersion(ident, None)
    if (!u.ifExists) {
      val have = cur.properties()
      val missing = u.keys.filterNot(have.containsKey)
      require(missing.isEmpty,
        s"view ${u.parts.mkString(".")} has no propert" +
          s"${if (missing.size == 1) "y" else "ies"} " +
          s"${missing.mkString(", ")} — UNSET TBLPROPERTIES IF EXISTS " +
          "skips missing keys")
    }
    val changes = u.keys.map(k => ViewChange.removeProperty(k): ViewChange)
    cat.alterView(ident, changes: _*)
    ()
  }
}

/** `SHOW CREATE TABLE|VIEW` over a graft view: render DDL that
  * re-executes to the SAME definition (the round-trip deploy tooling
  * diffs against). Graft TABLES stay on Spark's native v2 exec. */
final case class GraftShowCreateViewExec(s: GraftShowCreateView)
    extends LeafExecNode {
  import org.apache.spark.unsafe.types.UTF8String
  override def output: Seq[Attribute] = s.output
  private def quoteSql(v: String): String =
    graft.catalog.DdlGenerator.quoteLiteral(v)
  private def bq(n: String): String =
    graft.catalog.DdlGenerator.quoteIdent(n)
  private def rows(): Array[InternalRow] = {
    val (cat, ident) = GraftCatalogs.identOf(s.parts)
    val view = cat.loadViewVersion(ident, None)
    val name = (s.parts.head +: ident.namespace().toSeq :+ ident.name())
      .map(bq).mkString(".")
    val cols =
      if (view.columnAliases().isEmpty) ""
      else view.columnAliases().zipWithIndex.map { case (a, i) =>
        val comment =
          if (i < view.columnComments().length &&
            view.columnComments()(i) != null)
            s" COMMENT ${quoteSql(view.columnComments()(i))}"
          else ""
        s"  ${bq(a)}$comment"
      }.mkString(" (\n", ",\n", ")")
    val comment = Option(view.properties().get("comment"))
      .map(c => s"\nCOMMENT ${quoteSql(c)}").getOrElse("")
    import scala.jdk.CollectionConverters._
    val props = view.properties().asScala.toSeq.filter(_._1 != "comment")
      .sortBy(_._1)
    val tblProps =
      if (props.isEmpty) ""
      else props.map { case (k, v) => s"${quoteSql(k)} = ${quoteSql(v)}" }
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    val ddl = s"CREATE VIEW $name$cols$comment$tblProps AS\n${view.query()}"
    Array(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(ddl))): InternalRow)
  }
  override def executeCollect(): Array[InternalRow] = rows()
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows().toSeq, 1)
}

final case class GraftDropViewExec(d: GraftDropView) extends GraftCommandExec {
  override def run(): Unit = {
    val (cat, ident) = GraftCatalogs.identOf(d.parts)
    if (!cat.dropView(ident) && !d.ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
  }
}

final case class GraftShowViewsExec(v: GraftShowViews) extends LeafExecNode {
  import org.apache.spark.unsafe.types.UTF8String
  override def output: Seq[Attribute] = v.output
  private def rows(): Array[InternalRow] = {
    val (cat, _) = GraftCatalogs.identOf(v.parts :+ "_")
    val ns = v.parts.tail
    val names = cat.listViews(ns: _*).map(_.name()).sorted
    // Spark's SHOW pattern dialect: '|' alternates, '*' wildcards.
    val keep: String => Boolean = v.pattern match {
      case None => _ => true
      case Some(p) =>
        val rx = p.split('|').map(a =>
          java.util.regex.Pattern.quote(a).replace("*", "\\E.*\\Q"))
          .mkString("(?i)^(", "|", ")$").r
        n => rx.findFirstIn(n).isDefined
    }
    names.filter(keep).map(n =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(ns.mkString(".")),
          UTF8String.fromString(n), false)): InternalRow)
  }
  override def executeCollect(): Array[InternalRow] = rows()
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows().toSeq, 1)
}

final case class GraftDescribeViewExec(v: GraftDescribeView) extends LeafExecNode {
  import org.apache.spark.unsafe.types.UTF8String
  override def output: Seq[Attribute] = v.output
  private def rows(): Array[InternalRow] = {
    val (cat, ident) = GraftCatalogs.identOf(v.parts)
    val view = cat.loadViewVersion(ident, None)
    def row(a: String, b: String, c: String): InternalRow =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(a), UTF8String.fromString(b),
          if (c == null) null else UTF8String.fromString(c)))
    val cols = view.schema().fields.zipWithIndex.map { case (f, i) =>
      val comment =
        if (i < view.columnComments().length) view.columnComments()(i) else null
      row(f.name, f.dataType.catalogString, comment)
    }
    val extended =
      if (!v.isExtended) Array.empty[InternalRow]
      else Array(row("", "", null),
        row("# Detailed View Information", "", null),
        row("View Text", view.query(), null),
        row("View Catalog and Namespace",
          (view.currentCatalog() +: view.currentNamespace()).mkString("."), null),
        row("Comment",
          view.properties().getOrDefault("comment", ""), null),
        row("Definition Version", view.definition.version.toString, null))
    cols ++ extended
  }
  override def executeCollect(): Array[InternalRow] = rows()
  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rows().toSeq, 1)
}

/** `ALTER TABLE t ADD|DROP PARTITION FIELD <field>` → the procedure's
  * evolve mechanism, with add/drop editing the CURRENT spec list. */
final case class GraftEvolveSpecField(parts: Seq[String], add: Boolean,
    fieldText: String) extends LeafCommand

final case class GraftEvolveSpecFieldExec(e: GraftEvolveSpecField)
    extends GraftCommandExec {
  override def run(): Unit =
    GraftAlterPartitionField.execute(e.parts, e.add, e.fieldText)
}

object GraftAlterPartitionField {
  private val Grammar = java.util.regex.Pattern.compile(
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+(ADD|DROP)\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""")

  def parse(sqlText: String, parser: ParserInterface): Option[LogicalPlan] = {
    val m = Grammar.matcher(sqlText)
    if (!m.matches()) return None
    val parts = parser.parseMultipartIdentifier(m.group(1))
    Some(GraftEvolveSpecField(parts, m.group(2).equalsIgnoreCase("ADD"),
      m.group(3)))
  }

  def execute(parts: Seq[String], add: Boolean, fieldText: String): Unit = {
    GraftCatalogs.identOf(parts) // asserts graft ownership, loudly
    val (c, t) = graft.sources.SnapshotCatalog.parseSpecField(fieldText)
    val catalogName = parts.head
    val ident = parts.tail
    val current = graft.sources.SnapshotCatalog.currentSpecFields(catalogName, ident)
    val next =
      if (add) {
        require(!current.exists(_._1.equalsIgnoreCase(c)),
          s"source column $c already has a partition field " +
            "(one transform per source column; DROP it first)")
        current :+ (c, t)
      } else {
        val remaining = current.filterNot { case (cc, tt) =>
          cc.equalsIgnoreCase(c) && tt == t }
        require(remaining.length < current.length,
          s"no partition field '${fieldText.trim}' on ${ident.mkString(".")} " +
            s"(current: ${graft.sources.SnapshotCatalog.renderSpec(current)})")
        remaining
      }
    graft.sources.SnapshotCatalog.evolvePartitionSpec(catalogName, ident,
      graft.sources.SnapshotCatalog.renderSpec(next))
    ()
  }
}

/** The MATERIALIZED VIEW statements Spark's grammar rejects outright
  * (`CREATE MATERIALIZED VIEW` parses natively and is intercepted in
  * [[GraftSqlParser.rewriteViewCommands]]; DROP/REFRESH do not). */
object GraftMvSql {
  private val Drop = java.util.regex.Pattern.compile(
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*$""")
  private val Refresh = java.util.regex.Pattern.compile(
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*$""")

  def parse(sqlText: String, parser: ParserInterface): Option[LogicalPlan] = {
    val d = Drop.matcher(sqlText)
    if (d.matches()) {
      val parts = parser.parseMultipartIdentifier(d.group(2))
      if (!GraftCatalogs.owns(parts)) return None
      return Some(GraftDropMaterializedView(parts, d.group(1) != null))
    }
    val r = Refresh.matcher(sqlText)
    if (r.matches()) {
      val parts = parser.parseMultipartIdentifier(r.group(1))
      if (!GraftCatalogs.owns(parts)) return None
      return Some(GraftRefreshMaterializedView(parts,
        GraftRefreshMaterializedView.outputAttrs))
    }
    val sc = ShowCreateView.matcher(sqlText)
    if (sc.matches()) {
      val parts = parser.parseMultipartIdentifier(sc.group(1))
      if (!GraftCatalogs.isView(parts)) return None
      return Some(GraftShowCreateView(parts, GraftShowCreateView.outputAttrs))
    }
    None
  }

  /** `SHOW CREATE VIEW` is not in Spark's grammar (views render through
    * SHOW CREATE TABLE there); accept the natural spelling for graft
    * views. */
  private val ShowCreateView = java.util.regex.Pattern.compile(
    """(?is)^\s*SHOW\s+CREATE\s+VIEW\s+([\w.`]+)\s*;?\s*$""")
}

/** Read-side view resolution (Iceberg's `ResolveViews` shape): expand an
  * unresolved relation naming a graft-catalog VIEW into its parsed body —
  * CTEs substituted (the analyzer's own substitution batch already ran),
  * bare table names qualified under the DEFINITION-TIME catalog/namespace,
  * nested views expanded EAGERLY with an explicit cycle check, and the
  * stored column aliases applied by position. `VERSION AS OF n` on a view
  * resolves the definition that was current at version n; `TIMESTAMP AS
  * OF` picks by definition creation time. */
final case class GraftViewReads(spark: SparkSession) extends Rule[LogicalPlan] {

  /** viewExists probes memoized for ONE rule invocation (one analyzer
    * fixed-point iteration): every unresolved relation costs one
    * filesystem probe per iteration otherwise, and a big union query
    * names the same tables many times. Scoped to the invocation — never
    * across queries — so a view created between two queries is always
    * seen. Single-threaded within apply (the analyzer runs rules
    * sequentially), so a plain HashMap is safe. */
  private val probeMemo = new ThreadLocal[scala.collection.mutable.HashMap[String, Boolean]]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    probeMemo.set(scala.collection.mutable.HashMap.empty)
    try applyMemoized(plan) finally probeMemo.remove()
  }

  private def applyMemoized(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // Batch reads only: a streamed view would silently serve a batch
      // body — `readStream.table` on a view stays a loud non-resolution.
      case u: UnresolvedRelation if !u.isStreaming =>
        expand(u.multipartIdentifier, None, Nil).getOrElse(u)
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if isView(u.multipartIdentifier) =>
        val picked = (ts, version) match {
          case (_, Some(v)) =>
            val n = v.toLongOption.getOrElse(throw new IllegalArgumentException(
              s"view VERSION AS OF must be a definition version number, got '$v'"))
            loadFor(u.multipartIdentifier, Some(Left(n)))
          case (Some(e), _) =>
            loadFor(u.multipartIdentifier, Some(Right(evalMicros(e))))
          case _ => loadFor(u.multipartIdentifier, None)
        }
        picked.map(v => body(u.multipartIdentifier, v, Nil)).getOrElse(tt)
    }

  private def evalMicros(e: Expression): Long = {
    require(e.resolved && e.foldable,
      s"view TIMESTAMP AS OF needs a literal timestamp, got $e")
    Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)).eval() match {
      case l: java.lang.Long => l
      case other => throw new IllegalArgumentException(
        s"view TIMESTAMP AS OF did not evaluate to a timestamp: $other")
    }
  }

  private def split(parts: Seq[String]):
      Option[(SnapshotCatalog, String, Identifier)] =
    if (parts.length < 2) None
    else GraftCatalogs.resolve(parts.head).map(c =>
      (c, parts.head, Identifier.of(parts.tail.init.toArray, parts.last)))

  private def memoizedExists(c: SnapshotCatalog, catName: String,
      id: Identifier): Boolean = {
    val memo = probeMemo.get()
    if (memo == null) return c.viewExists(id)
    memo.getOrElseUpdate(catName + "\u0000" + id.toString, c.viewExists(id))
  }

  private def isView(parts: Seq[String]): Boolean =
    split(parts).exists { case (c, n, id) => memoizedExists(c, n, id) }

  private def loadFor(parts: Seq[String],
      pin: Option[Either[Long, Long]]): Option[GraftView] =
    split(parts).filter { case (c, n, id) => memoizedExists(c, n, id) }
      .map { case (c, _, id) =>
        pin match {
          case Some(Left(version)) => c.loadViewVersion(id, Some(version))
          case Some(Right(micros)) => c.loadViewAsOf(id, micros)
          case None => c.loadViewVersion(id, None)
        }
      }

  private def expand(parts: Seq[String], pin: Option[Either[Long, Long]],
      path: List[String]): Option[LogicalPlan] =
    loadFor(parts, pin).map(v => body(parts, v, path))

  /** Parse + prepare one view body, expanding nested views eagerly so
    * the fixed point never revisits it and a definition cycle is a LOUD
    * error instead of a max-iterations stall. */
  private def body(parts: Seq[String], view: GraftView,
      path: List[String]): LogicalPlan = {
    val key = parts.mkString(".").toLowerCase
    if (path.contains(key))
      throw new IllegalStateException(
        s"view definition cycle: ${(path :+ key).mkString(" -> ")}")
    val parsed = spark.sessionState.sqlParser.parsePlan(view.query())
    val substituted = CTESubstitution(parsed)
    val defCat = view.currentCatalog()
    val defNs = view.currentNamespace().toSeq
    val qualified = substituted transformUp {
      case u: UnresolvedRelation =>
        val q = qualify(u.multipartIdentifier, defCat, defNs)
        expand(q, None, path :+ key)
          .getOrElse(if (q == u.multipartIdentifier) u
            else u.copy(multipartIdentifier = q))
    }
    val aliased =
      if (view.columnAliases().nonEmpty)
        UnresolvedSubqueryColumnAliases(view.columnAliases().toSeq, qualified)
      else qualified
    SubqueryAlias(parts.last, aliased)
  }

  /** Bare names inside a stored definition resolve under the context the
    * view was CREATED in (Iceberg's rule): 1-part names gain the
    * definition catalog + namespace, 2-part names gain the catalog when
    * their head is not itself a catalog. */
  private def qualify(parts: Seq[String], defCat: String,
      defNs: Seq[String]): Seq[String] = parts match {
    case Seq(one) => (defCat +: defNs) :+ one
    case head +: _ if !spark.sessionState.catalogManager
        .isCatalogRegistered(head) => defCat +: parts
    case _ => parts
  }
}
