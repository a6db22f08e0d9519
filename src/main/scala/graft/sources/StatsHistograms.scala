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
  * COLLECTION rides COMPACTION (`rewrite_data_files`) — the one moment
  * the engine already rewrites every live row, so two aggregate passes
  * per opted-in column are proportionate:
  *
  *   - `stats.histogram-columns = 'v, amount'` opts columns in
  *     (numeric/date/timestamp/boolean only; others are skipped loudly
  *     in the compaction output, never at read);
  *   - `stats.histogram-bins` (default 32) sets the bin count;
  *   - boundaries are `approx_percentile` at i/n quantiles (equi-height
  *     by construction: height = rows/n), per-bin NDV from one grouped
  *     `approx_count_distinct` pass over the bin index.
  *
  * STORAGE: one table property (`graft.stats.histogram`) holding the
  * bins PLUS the snapshot version they describe. Reads serve the
  * histogram ONLY while the table still sits at that version — any later
  * commit silently retires it until the next compaction (an estimate
  * computed over different rows is not worth a wrong plan), and a scan
  * whose pushdown PRUNED files never serves it (the histogram describes
  * the whole table; combining it with a pruned row count would
  * double-count the predicate).
  *
  * Scale: collection is O(rows) inside an operation that is already
  * O(rows); the stored form is O(columns × bins) bytes of metadata; plan
  * time is a property parse. */
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

  /** Collect + store histograms for the opted-in columns; called at the
    * END of compaction (the table just became one fresh snapshot).
    * Returns the histogrammed column names (for the procedure's report). */
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
    val done = cols.flatMap { c =>
      fieldOf.get(c.toLowerCase) match {
        case None =>
          logWarning(s"$ColumnsProp names unknown column '$c' on $name — skipped")
          None
        case Some(f) if !supported(f.dataType) =>
          logWarning(s"$ColumnsProp column '$c' (${f.dataType.simpleString}) " +
            "is not histogrammable (numeric/date/timestamp) — skipped")
          None
        case Some(f) =>
          // Keyed by FIELD ID: names are reusable (RENAME + ADD COLUMN
          // would hand a dead column's bins to an unrelated new one);
          // ids are rename-stable. Id-less legacy columns skip.
          FieldIds.idOf(f) match {
            case None =>
              logWarning(s"$ColumnsProp column '$c' carries no field id " +
                "(legacy schema) — skipped")
              None
            case Some(id) =>
              buildOne(spark, name, f.name, f.dataType, bins)
                .map(h => (f.name, id, h))
          }
      }
    }
    if (done.isEmpty) return Nil
    val json = JsonMethods.compact(JsonMethods.render(JObject(List(
      "v" -> JLong(version),
      "cols" -> JObject(done.toList.map { case (_, id, h) =>
        id.toString -> (JObject(List(
          "h" -> JDouble(h.height),
          "bins" -> JArray(h.bins.toList.map(b => JArray(List(
            JDouble(b.lo), JDouble(b.hi), JLong(b.ndv))))))): JValue)
      })))))
    SnapshotStore.update(k)(s0 =>
      s0.copy(properties = s0.properties + (StoreProp -> json)))
    done.map(_._1)
  }

  /** Equi-height bins for one column: boundaries at the i/n quantiles of
    * the NON-NULL values (exact percentile via approx_percentile's exact
    * mode default accuracy — boundary error only shifts rows between
    * adjacent bins, preserving total mass), then one grouped pass for
    * per-bin NDV. None when the column has no non-null rows. */
  private def buildOne(spark: SparkSession, table: String, col: String,
      dt: DataType, bins: Int): Option[ColHist] = {
    val q = (1 until bins).map(i => i.toDouble / bins)
    val c = graft.catalog.DdlGenerator.quoteIdent(col)
    val v = toDoubleSql(c, dt)
    val head = spark.sql(
      s"""SELECT approx_percentile($v, array(${q.mkString(",")})) AS b,
        min($v) AS lo, max($v) AS hi,
        count($c) AS n
        FROM $table""").head()
    if (head.isNullAt(1) || head.getLong(3) == 0L) return None
    val lo = head.getDouble(1)
    val hi = head.getDouble(2)
    val n = head.getLong(3)
    val bounds = ((lo +: head.getSeq[Double](0)) :+ hi).toArray
    // Non-finite boundaries (Infinity/NaN in a double column) serialize
    // to unparseable SQL and invalid JSON — skip the column, loudly.
    if (bounds.exists(b => !java.lang.Double.isFinite(b))) {
      logWarning(s"$ColumnsProp column '$col' holds non-finite values " +
        "(Infinity/NaN) — histogram skipped")
      return None
    }
    // Per-bin NDV in one grouped pass: assign each non-null value its bin
    // (upper-inclusive, catalyst's histogram semantics; the first bin
    // also takes its lower bound), approx-distinct per bin.
    val binCase = (1 until bounds.length - 1)
      .map(i => s"WHEN _v <= ${bounds(i)} THEN ${i - 1}")
      .mkString("CASE ", " ", s" ELSE ${bounds.length - 2} END")
    val ndvRows = spark.sql(
      s"""SELECT $binCase AS _b, approx_count_distinct(_v) AS _d
        FROM (SELECT $v AS _v FROM $table WHERE $c IS NOT NULL)
        GROUP BY 1""").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val out = (0 until bounds.length - 1).map { i =>
      Bin(bounds(i), bounds(i + 1), math.max(1L, ndvRows.getOrElse(i, 0L)))
    }.toVector
    Some(ColHist(n.toDouble / out.length, out))
  }

  /** Parse the stored property IF it describes `currentVersion`; any
    * later commit retires it until the next compaction. Keyed by FIELD
    * ID. Never throws — a malformed property just serves nothing. */
  def forRead(props: Map[String, String],
      currentVersion: Long): Map[Int, ColHist] =
    props.get(StoreProp).fold(Map.empty[Int, ColHist]) { raw =>
      try {
        val j = JsonMethods.parse(raw)
        val v = (j \ "v") match { case JLong(x) => x; case JInt(x) => x.toLong
          case _ => return Map.empty }
        if (v != currentVersion) return Map.empty
        (j \ "cols") match {
          case JObject(fields) => fields.flatMap { case (c, cj) =>
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
          }.toMap
          case _ => Map.empty
        }
      } catch { case _: Exception => Map.empty }
    }

  private def logWarning(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
}
