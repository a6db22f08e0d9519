package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, DateType, NumericType, TimestampType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** EQUI-HEIGHT HISTOGRAMS for CBO filter selectivity — the statistics
  * that fix SKEWED columns: min/max + NDV land uniform-distribution
  * estimates, and web-corpus columns (Zipf languages, hot keys) are the
  * rule, not the exception — a predicate selecting a rare tail estimates
  * 10×+ too many rows, and every broadcast/join-order decision downstream
  * inherits the error.
  *
  * COLLECTION runs in TWO table scans TOTAL, however many columns opt
  * in — one SELECT computing every column's percentile boundaries +
  * min/max/count, one stacked (posexplode) pass computing every
  * column's per-bin NDV — and rides two surfaces:
  *
  *   - COMPACTION (`rewrite_data_files`): the moment the engine already
  *     rewrites every live row, +2 scans are proportionate;
  *   - `CALL cat.system.collect_stats(table)` — an ANALYZE-style
  *     procedure with NO rewrite, for hot tables that are never
  *     compacted (collection alone is the two scans).
  *
  * Knobs: `stats.histogram-columns = 'v, amount'` opts columns in
  * (numeric/date/timestamp only; others are skipped loudly in the
  * procedure output, never at read); `stats.histogram-bins` (default
  * 32) sets the bin count. Boundaries are `approx_percentile` at i/n
  * quantiles (equi-height by construction: height = rows/n).
  *
  * STORAGE: one table property (`graft.stats.histogram`) holding the
  * bins PLUS the snapshot version they describe. Reads serve the
  * histogram while the table sits at that version OR has only APPENDED
  * since — appends dilute a histogram (its boundary fractions drift
  * toward staleness) but never invalidate its shape for selectivity
  * FRACTIONS, which is how the estimator consumes it; any row-changing
  * commit (delete/update/overwrite) silently retires it until the next
  * collection (an estimate computed over removed rows is not worth a
  * wrong plan). A scan whose pushdown PRUNED files never serves it
  * (the histogram describes the whole table; combining it with a pruned
  * row count would double-count the predicate).
  *
  * Scale: collection is two O(rows) scans regardless of column count;
  * the stored form is O(columns × bins) bytes of metadata; plan time is
  * a property parse. */
private[sources] object StatsHistograms {

  val ColumnsProp = "stats.histogram-columns"
  val BinsProp = "stats.histogram-bins"
  val StoreProp = "graft.stats.histogram"

  final case class Bin(lo: Double, hi: Double, ndv: Long)
  final case class ColHist(height: Double, bins: Vector[Bin])

  /** Histogrammable types. Dates/timestamps must land in the SAME double
    * space catalyst's estimation compares literals in — the INTERNAL
    * representation (days / micros since epoch), not a SQL cast (a
    * timestamp CAST to double yields seconds: a silent 10^6 selectivity
    * error). Booleans and TimestampNTZ have no such conversion surface
    * worth carrying — excluded. */
  private def supported(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType => true
    case _ => false
  }

  /** SQL projecting `c` into catalyst's estimation double space. */
  private def toDoubleSql(c: String, dt: DataType): String = dt match {
    case DateType => s"CAST(unix_date($c) AS DOUBLE)"
    case TimestampType => s"CAST(unix_micros($c) AS DOUBLE)"
    case _ => s"CAST($c AS DOUBLE)"
  }

  /** Fail-fast property validation — called BEFORE compaction's rewrite
    * commits, so a malformed `stats.histogram-bins` fails the procedure
    * with nothing half-done (collection itself runs after the rewrite).
    * Gates exactly like [[collect]]'s column parse: a vacuous columns
    * value (',') collects nothing, so it must not fail over the bins
    * property either. */
  def validate(props: Map[String, String]): Unit = {
    val any = props.get(ColumnsProp).exists(
      _.split(',').exists(_.trim.nonEmpty))
    if (any) { binsOf(props); () }
  }

  private def binsOf(props: Map[String, String]): Int = {
    val bins = props.get(BinsProp).map(raw =>
      raw.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"$BinsProp must be an integer in [2, 1024], got '$raw'")))
      .getOrElse(32)
    require(bins >= 2 && bins <= 1024,
      s"$BinsProp must be in [2, 1024], got $bins")
    bins
  }

  /** Collect + store histograms for the opted-in columns — TWO table
    * scans total, however many columns (called at the end of compaction,
    * and by `CALL system.collect_stats` with no rewrite). Returns the
    * histogrammed column names (for the procedure's report).
    *
    * The stored stamp is the version read BEFORE scanning, re-validated
    * after: a commit landing mid-collection would make the bins describe
    * neither version, so the store is skipped loudly (the stats are an
    * optimization; the next collection re-runs). */
  def collect(spark: SparkSession, catalog: String,
      ident: Seq[String]): Seq[String] = {
    val k = SnapshotStore.keyOf(catalog, ident)
    val st = SnapshotStore.stateOf(k)
    val cols = st.properties.get(ColumnsProp).map(_.trim).filter(_.nonEmpty)
      .fold(Seq.empty[String])(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    if (cols.isEmpty) return Nil
    val bins = binsOf(st.properties)
    val version =
      if (st.snapshots.isEmpty) 0L else st.snapshots.last.version
    val name = (catalog +: ident)
      .map(graft.catalog.DdlGenerator.quoteIdent).mkString(".")
    val fieldOf: Map[String, org.apache.spark.sql.types.StructField] =
      st.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    // Eligibility gates (name, type, field id) are metadata-only; the
    // survivors batch into the two scans below. Keyed by FIELD ID: names
    // are reusable (RENAME + ADD COLUMN would hand a dead column's bins
    // to an unrelated new one); ids are rename-stable.
    val eligible = cols.flatMap { c =>
      fieldOf.get(c.toLowerCase) match {
        case None =>
          logWarning(s"$ColumnsProp names unknown column '$c' on $name — skipped")
          None
        case Some(f) if !supported(f.dataType) =>
          logWarning(s"$ColumnsProp column '$c' (${f.dataType.simpleString}) " +
            "is not histogrammable (numeric/date/timestamp) — skipped")
          None
        case Some(f) =>
          FieldIds.idOf(f) match {
            case None =>
              logWarning(s"$ColumnsProp column '$c' carries no field id " +
                "(legacy schema) — skipped")
              None
            case Some(id) => Some((f.name, id, f.dataType))
          }
      }
    }
    if (eligible.isEmpty) return Nil
    val done = buildAll(spark, name, eligible, bins)
    if (done.isEmpty) return Nil
    val json = JsonMethods.compact(JsonMethods.render(JObject(List(
      "v" -> JLong(version),
      "cols" -> JObject(done.toList.map { case (_, id, h) =>
        id.toString -> (JObject(List(
          "h" -> JDouble(h.height),
          "bins" -> JArray(h.bins.toList.map(b => JArray(List(
            JDouble(b.lo), JDouble(b.hi), JLong(b.ndv))))))): JValue)
      })))))
    val nowV = {
      val s1 = SnapshotStore.stateOf(k)
      if (s1.snapshots.isEmpty) 0L else s1.snapshots.last.version
    }
    if (nowV != version) {
      logWarning(s"$name advanced (v$version -> v$nowV) while histograms " +
        "were collected — the bins describe neither version; skipped " +
        "(rerun collect_stats)")
      return Nil
    }
    SnapshotStore.update(k)(s0 =>
      s0.copy(properties = s0.properties + (StoreProp -> json)))
    done.map(_._1)
  }

  /** Equi-height bins for ALL eligible columns in two scans. Boundaries
    * at the i/n quantiles of each column's non-null values — via
    * `approx_percentile` at its default accuracy, which is APPROXIMATE
    * on large inputs (the same sketch catalyst's own ANALYZE histograms
    * use): boundary error shifts rows between ADJACENT bins only, so
    * total mass and the equi-height shape are preserved to sketch
    * accuracy, and the consumer is a selectivity ESTIMATE, never an
    * answer. Then ONE stacked pass assigns every (column, value) pair
    * its bin (upper-inclusive, catalyst's histogram semantics; the first
    * bin also takes its lower bound) and approx-counts distincts per
    * (column, bin) group. Columns with no non-null rows, or non-finite
    * boundaries (Infinity/NaN would serialize to unparseable SQL and
    * invalid JSON), drop out loudly between the passes. */
  private def buildAll(spark: SparkSession, table: String,
      eligible: Seq[(String, Int, DataType)], bins: Int):
      Seq[(String, Int, ColHist)] = {
    val q = (1 until bins).map(i => i.toDouble / bins)
    val vOf = eligible.map { case (n, _, dt) =>
      toDoubleSql(graft.catalog.DdlGenerator.quoteIdent(n), dt) }
    // Pass 1: every column's boundaries + min/max + non-null count.
    val aggExprs = eligible.indices.flatMap { i =>
      val v = vOf(i)
      Seq(s"approx_percentile($v, array(${q.mkString(",")})) AS _b$i",
        s"min($v) AS _lo$i", s"max($v) AS _hi$i", s"count($v) AS _n$i")
    }
    val head = spark.sql(
      s"SELECT ${aggExprs.mkString(", ")} FROM $table").head()
    final case class Survivor(name: String, id: Int, v: String,
        bounds: Array[Double], n: Long)
    val survivors = eligible.zipWithIndex.flatMap { case ((n, id, _), i) =>
      val base = i * 4
      if (head.isNullAt(base + 1) || head.getLong(base + 3) == 0L) None
      else {
        val bounds = ((head.getDouble(base + 1) +:
          head.getSeq[Double](base)) :+ head.getDouble(base + 2)).toArray
        if (bounds.exists(b => !java.lang.Double.isFinite(b))) {
          logWarning(s"$ColumnsProp column '$n' holds non-finite values " +
            "(Infinity/NaN) — histogram skipped")
          None
        } else Some(Survivor(n, id, vOf(i), bounds, head.getLong(base + 3)))
      }
    }
    if (survivors.isEmpty) return Nil
    // Pass 2: stack the surviving columns into (_c, _v) rows — the scan
    // still reads each row once; the explode feeds straight into a
    // partial (map-side) aggregation over |columns × bins| groups.
    // Balanced decision tree = a BINARY SEARCH over the bin boundaries
    // expressed in plain (whole-stage-codegen'd) CASE expressions:
    // O(log bins) comparisons per (row, column) instead of the linear
    // chain's O(bins) — at 32 bins that is 5 comparisons vs 16 average,
    // and the NDV pass evaluates this once per non-null value of every
    // histogrammed column. Semantics are the lower-bound search the
    // linear chain computed: the SMALLEST i with _v <= bounds(i+1)
    // (upper-inclusive bins; duplicate boundaries — flat quantile
    // regions — resolve to the leftmost bin exactly like the chain, since
    // `_v <= dup` sends the search left). The ELSE arm of every node
    // covers the top bin, so out-of-range values land in the last bin as
    // before.
    def binCase(bounds: Array[Double]): String = {
      def tree(lo: Int, hi: Int): String =
        if (lo == hi) lo.toString
        else {
          val mid = (lo + hi) / 2
          s"(CASE WHEN _v <= ${bounds(mid + 1)} THEN ${tree(lo, mid)} " +
            s"ELSE ${tree(mid + 1, hi)} END)"
        }
      tree(0, bounds.length - 2)
    }
    val dispatch = survivors.zipWithIndex
      .map { case (s, i) => s"WHEN $i THEN (${binCase(s.bounds)})" }
      .mkString("CASE _c ", " ", " END")
    val stacked = s"array(${survivors.map(_.v).mkString(", ")})"
    val ndvRows = spark.sql(
      s"""SELECT _c, $dispatch AS _b, approx_count_distinct(_v) AS _d
        FROM (SELECT posexplode($stacked) AS (_c, _v) FROM $table)
        WHERE _v IS NOT NULL
        GROUP BY 1, 2""").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    survivors.zipWithIndex.map { case (s, ci) =>
      val out = (0 until s.bounds.length - 1).map { i =>
        Bin(s.bounds(i), s.bounds(i + 1),
          math.max(1L, ndvRows.getOrElse((ci, i), 0L)))
      }.toVector
      (s.name, s.id, ColHist(s.n.toDouble / out.length, out))
    }
  }

  /** Parse the stored property IF the table still sits at the stamped
    * version or has only APPENDED since (appends dilute a histogram's
    * fractions, never invalidate its shape — and the estimator consumes
    * fractions); any row-changing commit retires it until the next
    * collection. Returns the STAMP VERSION with the bins: the scan
    * builder's pruned-scan veto exempts files sequenced PAST the stamp
    * (their rows are not in the bins, so pruning them cannot double-
    * count a predicate). Keyed by FIELD ID. Never throws — a malformed
    * property just serves nothing. */
  def forRead(props: Map[String, String], st: SnapshotStore.TableState,
      currentVersion: Long): Option[(Long, Map[Int, ColHist])] =
    props.get(StoreProp).flatMap { raw =>
      try {
        val j = JsonMethods.parse(raw)
        val v = (j \ "v") match { case JLong(x) => x; case JInt(x) => x.toLong
          case _ => return None }
        if (v > currentVersion) return None // rollback past the stamp
        if (v != currentVersion) {
          // Append-only drift keeps serving (conservative); anything else
          // — or an expired gap that makes the drift undecidable — retires.
          val ok = MaterializedViews.opsBetween(st, v, currentVersion)
            .exists(_.subsetOf(Set("append")))
          if (!ok) return None
        }
        (j \ "cols") match {
          case JObject(fields) => Some((v, fields.flatMap { case (c, cj) =>
            val h = (cj \ "h") match { case JDouble(x) => x
              case JInt(x) => x.toDouble; case _ => 0.0 }
            val bs = (cj \ "bins") match {
              case JArray(arr) => arr.map { b =>
                val es = b.asInstanceOf[JArray].arr
                def d(x: JValue): Double = x match {
                  case JDouble(v) => v; case JInt(v) => v.toDouble
                  case JLong(v) => v.toDouble; case _ => 0.0 }
                def l(x: JValue): Long = x match {
                  case JLong(v) => v; case JInt(v) => v.toLong
                  case JDouble(v) => v.toLong; case _ => 0L }
                Bin(d(es.head), d(es(1)), l(es(2)))
              }.toVector
              case _ => Vector.empty
            }
            c.toIntOption.map(_ -> ColHist(h, bs))
          }.toMap))
          case _ => None
        }
      } catch { case _: Exception => None }
    }

  private def logWarning(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
}
