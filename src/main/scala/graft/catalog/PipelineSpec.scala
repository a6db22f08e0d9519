package graft.catalog

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

/** One step of a declaratively-specified curation pipeline: an operator
  * name from [[graft.PipelineRunner]]'s vocabulary plus its parameters
  * (YAML scalars, validated by the op at build time). */
final case class PipelineStep(op: String, params: Map[String, String]) {
  def param(key: String): String = params.getOrElse(key,
    sys.error(s"op '$op' missing required param '$key'"))
  def paramOr(key: String, default: String): String = params.getOrElse(key, default)
}

/** Declarative pipeline specification — the reference's YAML-driven table
  * provisioning (`customers.yml` → DDL) extended to the DATA path: a
  * source fixture table, an ordered op list, and an optional sink. The
  * same deploy loop that provisions tables from specs can then run
  * curation from specs (`create_iceberg_tables.py:158-166` iterates spec
  * files; [[graft.PipelineRunner]] is that loop's data-plane twin).
  */
final case class PipelineSpec(
    name: String,
    sourceTable: String,
    steps: Seq[PipelineStep],
    sinkFormat: Option[String],
    sinkPath: Option[String],
    sinkTable: Option[String] = None,
    sinkMode: Option[String] = None,
    sinkBranch: Option[String] = None,
    sinkPublish: Option[Boolean] = None,
    sinkAudit: Option[String] = None,
    /** `changes: true` — the source is a VERSIONED catalog table consumed
      * INCREMENTALLY through its `.changes` stream: each trigger reads
      * only the new commits (O(changed) source IO), maintains a mirror of
      * the accumulated corpus, and refreshes the sink with the steps
      * recomputed over it — so the published sink always equals the batch
      * pipeline over everything ingested so far. */
    sourceChanges: Boolean = false,
    sourceStartingVersion: Option[Long] = None,
    /** Streaming admission control: at most this many source COMMITS per
      * trigger (rate-limits the refresh cadence against a bursty source). */
    sourceMaxVersionsPerTrigger: Option[Long] = None,
    /** `refresh: incremental` — maintain the sink with O(changed)-shaped
      * per-trigger work (maintained near-dup components, gram index, and
      * per-language aggregates; see [[graft.queries.IncrementalCuration]])
      * instead of the default FULL recompute of the steps over the
      * accumulated mirror. Requires the step list to fit the incremental
      * grammar (near_dup_drop? span_removal? row-local* temperature_mix?);
      * the published sink is row-identical either way. */
    sourceRefresh: Option[String] = None) {
  require(name.nonEmpty, "pipeline name must be non-empty")
  require(sourceTable.nonEmpty, s"$name: source table must be non-empty")
  require(!sourceChanges || sourceTable.split('.').length >= 3,
    s"$name: a changes source needs a catalog-qualified versioned table " +
      s"(catalog.db.t), got '$sourceTable'")
  require(!sourceChanges || sinkTable.isDefined,
    s"$name: a changes source refreshes a catalog 'table' sink")
  require(sourceStartingVersion.isEmpty || sourceChanges,
    s"$name: source 'starting_version' needs 'changes: true'")
  require(sourceMaxVersionsPerTrigger.isEmpty || sourceChanges,
    s"$name: source 'max_versions_per_trigger' needs 'changes: true'")
  require(sourceRefresh.forall(Set("full", "incremental")),
    s"$name: source refresh must be full or incremental, got '${sourceRefresh.get}'")
  require(sourceRefresh.isEmpty || sourceChanges,
    s"$name: source 'refresh' needs 'changes: true'")
  require(steps.nonEmpty, s"$name: at least one step required")
  require(sinkFormat.isDefined == sinkPath.isDefined,
    s"$name: a path sink needs both 'format' and 'path'")
  require(sinkTable.isEmpty || sinkPath.isEmpty,
    s"$name: sink is EITHER a path (format+path) OR a catalog table, not both")
  require(sinkMode.forall(Set("append", "overwrite")),
    s"$name: sink mode must be append or overwrite, got '${sinkMode.get}'")
  require(sinkMode.isEmpty || hasSink,
    s"$name: sink 'mode' given but no path or table sink")
  // Write-audit-publish: `branch` stages the run's append on a branch of
  // the (versioned-catalog) sink table; `publish: false` leaves it staged
  // for an external audit, the default fast-forwards after the write.
  require(sinkBranch.forall(_.nonEmpty), s"$name: sink branch must be non-empty")
  require(sinkBranch.isEmpty || sinkTable.isDefined,
    s"$name: sink 'branch' needs a catalog 'table' sink")
  require(sinkBranch.isEmpty || effectiveMode == "append",
    s"$name: branch staging is append-only; mode overwrite is not stageable")
  require(sinkPublish.isEmpty || sinkBranch.isDefined,
    s"$name: sink 'publish' given but no 'branch'")
  // The AUDIT of write-audit-publish: a row-level boolean constraint checked
  // against THIS RUN'S rows before staging — a failing audit stages nothing
  // (retries cannot duplicate), and pre-existing base rows never block.
  require(sinkAudit.forall(_.nonEmpty), s"$name: sink audit must be non-empty")
  require(sinkAudit.isEmpty || sinkBranch.isDefined,
    s"$name: sink 'audit' given but no 'branch' to audit")

  def hasSink: Boolean = sinkPath.isDefined || sinkTable.isDefined

  /** Effective write mode: tables default to APPEND (each run = one more
    * auditable commit), paths default to OVERWRITE (a materialized
    * artifact regenerated per run) — each kind's least-surprising default,
    * overridable with `mode:`. */
  def effectiveMode: String =
    sinkMode.getOrElse(if (sinkTable.isDefined) "append" else "overwrite")

  def sinkDescription: String =
    sinkTable.map(t => sinkBranch match {
      case Some(b) =>
        s"table $t via branch $b (${if (publishAfterWrite) "publish" else "staged"})"
      case None => s"table $t ($effectiveMode)"
    }).getOrElse(
      s"${sinkFormat.getOrElse("?")} sink at ${sinkPath.getOrElse("?")} ($effectiveMode)")

  def publishAfterWrite: Boolean = sinkPublish.getOrElse(true)
}

object PipelineSpec {

  def fromYaml(text: String): PipelineSpec = {
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions()))
    val root = yaml.load[java.util.Map[String, Object]](text)
    require(root != null, "empty YAML document")
    val m = root.asScala

    val sourceMap = m.get("source") match {
      case Some(sm: java.util.Map[_, _]) =>
        sm.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
      case _ => sys.error("spec missing 'source' map")
    }
    val unknownSrc = sourceMap.keySet --
      Set("table", "changes", "starting_version", "max_versions_per_trigger",
        "refresh")
    require(unknownSrc.isEmpty,
      s"unknown source key(s) ${unknownSrc.mkString(", ")}; " +
        "known: table, changes, starting_version, max_versions_per_trigger, refresh")
    val source = sourceMap.getOrElse("table", sys.error("source missing 'table'"))
    val changes = sourceMap.get("changes") match {
      case None => false
      case Some("true") => true
      case Some("false") => false
      case Some(other) => sys.error(s"source changes must be true or false, got '$other'")
    }
    def srcLong(key: String): Option[Long] = sourceMap.get(key).map(v =>
      v.toLongOption.getOrElse(sys.error(s"source $key must be a number, got '$v'")))
    val steps = m.get("steps") match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.map {
          case sm: java.util.Map[_, _] =>
            val s = sm.asScala.map { case (k, v) => k.toString -> v.toString }
            PipelineStep(
              s.getOrElse("op", sys.error("step missing 'op'")),
              (s - "op").toMap)
          case other => sys.error(s"bad step entry: $other")
        }
      case _ => sys.error("spec missing 'steps' list")
    }
    val (fmt, path, table, mode, branch, publish, audit) = m.get("sink") match {
      case Some(sm: java.util.Map[_, _]) =>
        val s = sm.asScala.map { case (k, v) => k.toString -> v.toString }
        // A typoed key must not silently degrade the run to a dry-run.
        val unknown = s.keySet --
          Set("format", "path", "table", "mode", "branch", "publish", "audit")
        require(unknown.isEmpty,
          s"unknown sink key(s) ${unknown.mkString(", ")}; " +
            "known: format, path, table, mode, branch, publish, audit")
        require(s.contains("path") || s.contains("table"),
          "a sink block needs a 'path' (with 'format') or a 'table'")
        val pub = s.get("publish").map {
          case "true" => true
          case "false" => false
          case other => sys.error(s"sink publish must be true or false, got '$other'")
        }
        (s.get("format"), s.get("path"), s.get("table"), s.get("mode"),
          s.get("branch"), pub, s.get("audit"))
      case _ => (None, None, None, None, None, None, None)
    }
    PipelineSpec(
      name = m.get("pipeline").map(_.toString)
        .getOrElse(sys.error("spec missing 'pipeline' name")),
      sourceTable = source,
      steps = steps,
      sinkFormat = fmt,
      sinkPath = path,
      sinkTable = table,
      sinkMode = mode,
      sinkBranch = branch,
      sinkPublish = publish,
      sinkAudit = audit,
      sourceChanges = changes,
      sourceStartingVersion = srcLong("starting_version"),
      sourceMaxVersionsPerTrigger = srcLong("max_versions_per_trigger"),
      sourceRefresh = sourceMap.get("refresh"))
  }

  def fromYamlFile(path: String): PipelineSpec =
    fromYaml(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
