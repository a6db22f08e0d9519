package graft.sources

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform, Expression => VExpression, Literal => VLiteral}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HIDDEN PARTITIONING (Iceberg's partition transforms): a table may be
  * partitioned by a FUNCTION of a data column — `days(ts)`, `hours(ts)`,
  * `months(ts)`, `years(ts)`, `bucket(n, col)`, `truncate(w, col)` — and
  * queries keep filtering on the DATA column; the engine routes writes
  * through the transform and prunes files by pushing data predicates
  * THROUGH it. The reference's own tables declare identity partitioning
  * only (`iceberg_tables/customers.yml:5-7`), but they are `format_version:
  * 2` Iceberg tables (`create_iceberg_tables.py:121-128`), whose defining
  * partitioning feature is exactly these transforms — `PARTITIONED BY
  * (days(ts))` is how real Iceberg tables shard a time series without the
  * query author ever naming a partition column.
  *
  * Time transforms produce ordinals from epoch (days/hours since
  * 1970-01-01, months/years since 1970-01); `truncate` floors numbers to
  * width multiples (negatives toward -∞, Iceberg's rule) and prefixes
  * strings; `bucket` is a Murmur3 hash mod n — DETERMINISTIC and stable
  * across JVMs (Spark's Murmur3 with seed 42 over the value's canonical
  * form), which is all the engine requires: the same function assigns at
  * write and prunes at read. (This catalog's data files are its own
  * format, so byte-level parity with Iceberg's bucket spec is not a
  * compatibility surface.)
  *
  * SOUNDNESS CONTRACT for pruning (see [[TransformPruning]]): time and
  * truncate transforms are MONOTONIC NON-DECREASING in their source value,
  * so `v ≥ lit ⇒ t(v) ≥ t(lit)` and a file whose transformed value lies
  * outside `[t(lo), t(hi)]` cannot hold a matching row; bucket transforms
  * prune equality/IN predicates only. All pruning is file-level and
  * predicates stay residual — a dropped file provably holds no match.
  */
private[graft] sealed trait PTransform extends Serializable {
  /** Wire name (metadata log + display). */
  def name: String
  /** The transformed value's type given the source column's type. */
  def resultType(src: DataType): DataType
  /** Transform a catalyst value of the source type (null → null). */
  def eval(v: Any, src: DataType): Any
  /** The partition label rendered in `.files`/`.partitions` ("ts_day"). */
  def label(col: String): String
  /** Monotonic non-decreasing in the source value (range pruning sound). */
  def monotonic: Boolean
  def isIdentity: Boolean = this == PIdentity
  /** Source types this transform accepts (createTable validation). */
  def accepts(src: DataType): Boolean
}

private[graft] case object PIdentity extends PTransform {
  def name = "identity"
  def resultType(src: DataType): DataType = src
  def eval(v: Any, src: DataType): Any = v
  def label(col: String): String = col
  def monotonic = true
  // Binary is refused at the SEAM (create/evolve validate through this),
  // not at first write: a binary partition VALUE is not serializable in
  // the metadata log (MetadataLog.pvToJson), and raw Array[Byte] tuples
  // compare by reference in every grouping — bucket(n, col) is the
  // supported way to partition by binary content.
  def accepts(src: DataType): Boolean = src != BinaryType
}

/** Shared epoch arithmetic for the time transforms. Timestamps are
  * catalyst micros (TimestampType / TimestampNTZType), dates are catalyst
  * epoch days (DateType); `floorDiv` keeps pre-1970 instants correct. */
private[graft] sealed trait PTimeTransform extends PTransform {
  def monotonic = true
  def resultType(src: DataType): DataType = IntegerType
  def accepts(src: DataType): Boolean = src match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }
  protected def epochDays(v: Any, src: DataType): Long = src match {
    case DateType => v.asInstanceOf[Int].toLong
    case _ => Math.floorDiv(v.asInstanceOf[Long], 86400L * 1000000L)
  }
}

private[graft] case object PDays extends PTimeTransform {
  def name = "days"
  def eval(v: Any, src: DataType): Any =
    if (v == null) null else epochDays(v, src).toInt
  def label(col: String): String = s"${col}_day"
}

private[graft] case object PHours extends PTimeTransform {
  def name = "hours"
  def eval(v: Any, src: DataType): Any =
    if (v == null) null
    else src match {
      case DateType => v.asInstanceOf[Int] * 24 // midnight of that day
      case _ => Math.floorDiv(v.asInstanceOf[Long], 3600L * 1000000L).toInt
    }
  def label(col: String): String = s"${col}_hour"
}

private[graft] case object PMonths extends PTimeTransform {
  def name = "months"
  def eval(v: Any, src: DataType): Any =
    if (v == null) null
    else {
      val d = java.time.LocalDate.ofEpochDay(epochDays(v, src))
      (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
    }
  def label(col: String): String = s"${col}_month"
}

private[graft] case object PYears extends PTimeTransform {
  def name = "years"
  def eval(v: Any, src: DataType): Any =
    if (v == null) null
    else java.time.LocalDate.ofEpochDay(epochDays(v, src)).getYear - 1970
  def label(col: String): String = s"${col}_year"
}

private[graft] final case class PBucket(n: Int) extends PTransform {
  require(n >= 1, s"bucket count must be >= 1, got $n")
  def name = s"bucket[$n]"
  def resultType(src: DataType): DataType = IntegerType
  def monotonic = false
  def accepts(src: DataType): Boolean = src match {
    case IntegerType | LongType | StringType | DateType |
         TimestampType | TimestampNTZType | ShortType | ByteType |
         BinaryType => true
    case _ => false
  }
  def eval(v: Any, src: DataType): Any =
    if (v == null) null
    else {
      // Stable across JVMs: Spark's Murmur3 (seed 42) over the value's
      // widened-long form (integral/temporal types) or raw bytes
      // (strings/binary — this is also the ONLY partition path for
      // binary columns, whose identity values are unserializable) — int
      // 5 and long 5 bucket identically, so a later int→long type
      // widening never reshuffles buckets.
      import org.apache.spark.unsafe.hash.Murmur3_x86_32
      val h = src match {
        case StringType =>
          val s = v.asInstanceOf[UTF8String]
          Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), 42)
        case BinaryType =>
          val b = v.asInstanceOf[Array[Byte]]
          Murmur3_x86_32.hashUnsafeBytes(b,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42)
        case IntegerType => Murmur3_x86_32.hashLong(v.asInstanceOf[Int].toLong, 42)
        case ShortType => Murmur3_x86_32.hashLong(v.asInstanceOf[Short].toLong, 42)
        case ByteType => Murmur3_x86_32.hashLong(v.asInstanceOf[Byte].toLong, 42)
        case DateType => Murmur3_x86_32.hashLong(v.asInstanceOf[Int].toLong, 42)
        case _ => Murmur3_x86_32.hashLong(v.asInstanceOf[Long], 42)
      }
      // Math.floorMod keeps the bucket non-negative for negative hashes.
      Math.floorMod(h, n)
    }
  def label(col: String): String = s"${col}_bucket"
}

private[graft] final case class PTruncate(w: Int) extends PTransform {
  require(w >= 1, s"truncate width must be >= 1, got $w")
  def name = s"truncate[$w]"
  def resultType(src: DataType): DataType = src
  def monotonic = true
  def accepts(src: DataType): Boolean = src match {
    case IntegerType | LongType | StringType => true
    case _ => false
  }
  def eval(v: Any, src: DataType): Any =
    if (v == null) null
    else src match {
      // Iceberg's rule: v - (v mod w) with a POSITIVE mod — negatives
      // truncate toward -∞ so ordering (and range pruning) is preserved.
      case IntegerType => v.asInstanceOf[Int] - Math.floorMod(v.asInstanceOf[Int], w)
      case LongType => v.asInstanceOf[Long] - Math.floorMod(v.asInstanceOf[Long], w.toLong)
      case StringType =>
        val s = v.asInstanceOf[UTF8String]
        if (s.numChars() <= w) s else s.substringSQL(1, w)
    }
  def label(col: String): String = s"${col}_trunc"
}

private[graft] object PTransform {

  /** Parse the wire name back ("days", "bucket[8]", "truncate[4]"). */
  def fromName(s: String): PTransform = s match {
    case "identity" => PIdentity
    case "days" => PDays
    case "hours" => PHours
    case "months" => PMonths
    case "years" => PYears
    case b if b.startsWith("bucket[") && b.endsWith("]") =>
      PBucket(b.stripPrefix("bucket[").stripSuffix("]").toInt)
    case t if t.startsWith("truncate[") && t.endsWith("]") =>
      PTruncate(t.stripPrefix("truncate[").stripSuffix("]").toInt)
    case other => throw new IllegalStateException(
      s"unknown partition transform '$other' in the metadata log")
  }

  /** Parse one V2 [[Transform]] from CREATE TABLE's PARTITIONED BY into
    * (source column, transform). Fails loudly on anything unsupported. */
  def fromV2(t: Transform): (String, PTransform) = {
    def singleRef: String = {
      require(t.references().length == 1 &&
        t.references()(0).fieldNames().length == 1,
        s"partition transform ${t.name} needs exactly one top-level column, " +
          s"got: $t")
      t.references()(0).fieldNames()(0)
    }
    def intArg: Int = {
      val lits = t.arguments().collect { case l: VLiteral[_] => l }
      require(lits.length == 1,
        s"partition transform ${t.name} needs exactly one literal argument, got: $t")
      lits(0).value() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long => l.intValue()
        case other => throw new IllegalArgumentException(
          s"partition transform ${t.name} needs an integer argument, got $other")
      }
    }
    t.name() match {
      case "identity" => (singleRef, PIdentity)
      case "days" | "day" => (singleRef, PDays)
      case "hours" | "hour" => (singleRef, PHours)
      case "months" | "month" => (singleRef, PMonths)
      case "years" | "year" => (singleRef, PYears)
      case "bucket" => (singleRef, PBucket(intArg))
      case "truncate" => (singleRef, PTruncate(intArg))
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform '$other' — supported: identity, " +
          "years, months, days, hours, bucket(n, col), truncate(w, col)")
    }
  }

  /** Render back to the V2 surface (Table.partitioning()). */
  def toV2(col: String, t: PTransform): Transform = t match {
    case PIdentity => Expressions.identity(col)
    case PDays => Expressions.days(col)
    case PHours => Expressions.hours(col)
    case PMonths => Expressions.months(col)
    case PYears => Expressions.years(col)
    case PBucket(n) => Expressions.bucket(n, col)
    case PTruncate(w) => Expressions.apply("truncate",
      Expressions.literal(w), Expressions.column(col))
  }
}

/** The partition transforms as DataSource V2 FUNCTIONS — what makes
  * STORAGE-PARTITIONED JOINS plan: when a scan reports
  * `KeyGroupedPartitioning(bucket(8, k))`, Spark's
  * `V2ScanPartitioningAndOrdering` rule resolves the transform through the
  * table catalog's `FunctionCatalog` (empty-namespace lookup by transform
  * name), and `EnsureRequirements` matches the two sides by the BOUND
  * function's `canonicalName` — same name + same source type ⇒ co-
  * partitioned, no Exchange. `produceResult` delegates to the SAME
  * [[PTransform]] evaluation the write path used, so a side Spark chooses
  * to shuffle INTO this partitioning (`spark.sql.sources.v2.bucketing.
  * shuffle.enabled`) lands rows in exactly the stored buckets.
  *
  * Canonical names carry the SOURCE TYPE (`graft.bucket(int)` ≠
  * `graft.bucket(bigint)`): bucket hashes int and long identically (the
  * widening guarantee), but Spark compares partition VALUES by the
  * expression type, so cross-type co-partitioning is declared only where
  * the value spaces genuinely coincide — conservatively, never. */
private[graft] object PartitionFunctions {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}

  val names: Set[String] = Set("bucket", "years", "months", "days", "hours",
    "truncate", "zorder2")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(new UnboundTransform("bucket", argsWithWidth = true))
    case "years" | "months" | "days" | "hours" =>
      Some(new UnboundTransform(name, argsWithWidth = false))
    case "truncate" => Some(new UnboundTransform("truncate", argsWithWidth = true))
    case "zorder2" => Some(ZOrder2Function)
    case _ => None
  }

  /** `zorder2(x, y)` — the two-dimensional Morton key over the LOW 31
    * bits of each dimension, served through the catalog's FunctionCatalog
    * so a `write.sort-order = 'zorder(x, y)'` table can declare it as the
    * WRITE-path required ordering ([[SortOrders]] →
    * RequiresDistributionAndOrdering → V2ExpressionUtils resolves the
    * transform here). Interleaving is the same formula as
    * [[graft.operators.ZOrder.zKey]] (bit i of x at 2i, of y at 2i+1).
    * Write-path clustering is a HINT (low-bit aliasing on wide domains
    * degrades, never breaks, locality); compaction restores the full
    * layout with manifest-normalized dimensions. */
  private object ZOrder2Function extends UnboundFunction {
    override def name(): String = "zorder2"
    override def description(): String = "graft 2-D Morton (z-order) key"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"zorder2 expects 2 arguments, got ${inputType.simpleString}")
      val ts = inputType.fields.map(_.dataType)
      ts.foreach(t => require(zorderAccepts(t),
        s"zorder2 does not accept ${t.catalogString} (integral types only)"))
      new BoundZOrder2(ts(0), ts(1))
    }
  }

  private[sources] def zorderAccepts(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private[sources] def zorderLong(v: Any): Long = v match {
    case null => 0L
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case other => sys.error(s"zorder2: unexpected value $other")
  }

  /** Interleave the low 31 bits of x (even positions) and y (odd). */
  private[sources] def morton31(x: Long, y: Long): Long = {
    val mask = (1L << 31) - 1
    val xm = x & mask
    val ym = y & mask
    var acc = 0L
    var i = 0
    while (i < 31) {
      acc |= ((xm >> i) & 1L) << (2 * i)
      acc |= ((ym >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    acc
  }

  private final class BoundZOrder2(t0: DataType, t1: DataType)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(t0, t1)
    override def resultType(): DataType = LongType
    override def name(): String = "zorder2"
    override def canonicalName(): String =
      s"graft.zorder2(${t0.catalogString},${t1.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Any = {
      val x = if (input.isNullAt(0)) 0L else zorderLong(input.get(0, t0))
      val y = if (input.isNullAt(1)) 0L else zorderLong(input.get(1, t1))
      morton31(x, y)
    }
  }

  private def pOf(name: String, width: Int): PTransform = name match {
    case "bucket" => PBucket(width)
    case "years" => PYears
    case "months" => PMonths
    case "days" => PDays
    case "hours" => PHours
    case "truncate" => PTruncate(width)
  }

  /** Width-parameterized transforms bind (int width, source); time
    * transforms bind (source). */
  private final class UnboundTransform(fname: String, argsWithWidth: Boolean)
      extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"graft partition transform $fname"
    override def bind(inputType: StructType): BoundFunction = {
      val expected = if (argsWithWidth) 2 else 1
      require(inputType.fields.length == expected,
        s"$fname expects $expected argument(s), got ${inputType.simpleString}")
      if (argsWithWidth)
        require(inputType.fields(0).dataType == IntegerType,
          s"$fname's first argument must be INT, got ${inputType.fields(0).dataType}")
      val srcType = inputType.fields.last.dataType
      // Validate against the same accepts() gate CREATE TABLE uses (width
      // unknown until runtime for parameterized transforms — use 1).
      require(pOf(fname, 1).accepts(srcType),
        s"$fname does not accept source type ${srcType.catalogString}")
      new BoundTransform(fname, argsWithWidth, srcType)
    }
  }

  private final class BoundTransform(fname: String, argsWithWidth: Boolean,
      srcType: DataType) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] =
      if (argsWithWidth) Array(IntegerType, srcType) else Array(srcType)
    override def resultType(): DataType =
      pOf(fname, 1).resultType(srcType)
    override def name(): String = fname
    override def canonicalName(): String =
      s"graft.$fname(${srcType.catalogString})"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any = {
      if (argsWithWidth) {
        val w = input.getInt(0)
        val v = if (input.isNullAt(1)) null else input.get(1, srcType)
        pOf(fname, w).eval(v, srcType)
      } else {
        val v = if (input.isNullAt(0)) null else input.get(0, srcType)
        pOf(fname, 1).eval(v, srcType)
      }
    }
  }
}

/** File pruning through partition TRANSFORMS: decides, from a file's
  * constant TRANSFORMED partition values, whether a predicate over the
  * SOURCE data column can possibly match any row of the file.
  *
  * Soundness: only DEFINITE exclusion drops a file, and every predicate
  * stays residual. For a monotonic transform t, `v op lit` constrains
  * `t(v)` to a half-range of `t(lit)` — e.g. `v < lit ⇒ t(v) ≤ t(lit)` —
  * so a file whose transformed value falls outside the implied range holds
  * no match. Bucket transforms (non-monotonic) prune `=` / `IN` / null
  * tests only. AND excludes if either conjunct does; OR only if both do;
  * NOT and unknown nodes never exclude. */
private[graft] object TransformPruning {

  /** One transform-partition field of a table: source column (lowercased),
    * its transform, the SOURCE column type, and the field's position in
    * the file's partition-value tuple. */
  final case class TField(column: String, t: PTransform, srcType: DataType,
      idx: Int)

  /** The fields usable for transform pruning (identity fields are handled
    * by [[PartitionPredicates]]; this channel takes the rest). */
  def fieldsOf(partitionCols: Seq[String], transforms: Seq[PTransform],
      schema: StructType): Seq[TField] =
    partitionCols.zipWithIndex.flatMap { case (c, i) =>
      val t = if (transforms.isEmpty) PIdentity else transforms(i)
      if (t.isIdentity) None
      else Some(TField(c.toLowerCase, t, schema(c).dataType, i))
    }

  /** Is `p` a predicate this channel can use for pruning at all? (Keeps
    * the scan-builder's pushed-predicate report honest.) */
  def usable(p: VPredicate, fields: Seq[TField]): Boolean =
    excludesImpl(p, fields, values = null).isDefined

  /** True iff NO row of a file with transformed `values` can satisfy `p`. */
  def definitelyExcludes(p: VPredicate, fields: Seq[TField],
      values: Seq[Any]): Boolean =
    excludesImpl(p, fields, values.toIndexedSeq).contains(true)

  /** None = predicate not usable by this channel; Some(excl) = usable,
    * and with `values` bound, whether the file is definitely excluded.
    * With `values == null` only usability is decided (never Some(true)). */
  private def excludesImpl(p: VPredicate, fields: Seq[TField],
      values: IndexedSeq[Any]): Option[Boolean] = {

    def fieldOf(e: VExpression): Option[TField] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        fields.find(_.column == r.fieldNames()(0).toLowerCase)
      case _ => None
    }
    def litOf(e: VExpression): Option[(Any, DataType)] = e match {
      case l: VLiteral[_] => Some((l.value, l.dataType))
      case _ => None
    }
    def child(i: Int): Option[VPredicate] = p.children()(i) match {
      case c: VPredicate => Some(c)
      case _ => None
    }
    /** Compare the file's transformed value against t(lit) with catalyst
      * ordering for the transformed type. */
    def cmpTransformed(f: TField, lit: Any): Option[Int] = {
      if (values == null) return Some(0) // usability probe only
      val fv = values(f.idx)
      val tl = f.t.eval(lit, f.srcType)
      if (fv == null || tl == null) None
      else {
        val dt = f.t.resultType(f.srcType)
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(dt)
        Some(ord.compare(fv, tl))
      }
    }
    /** The literal's discrete predecessor/successor in the SOURCE domain —
      * the boundary-refinement probe (None where the domain has no usable
      * step, e.g. strings). */
    def step(lv: Any, dt: DataType, up: Boolean): Option[Any] = {
      val d = if (up) 1L else -1L
      dt match {
        case LongType | TimestampType | TimestampNTZType =>
          val v = lv.asInstanceOf[Long]
          if (v == (if (up) Long.MaxValue else Long.MinValue)) None
          else Some(v + d)
        case IntegerType | DateType =>
          val v = lv.asInstanceOf[Int]
          if (v == (if (up) Int.MaxValue else Int.MinValue)) None
          else Some(v + d.toInt)
        case _ => None
      }
    }
    /** Is `lv` the SMALLEST (`!up`) / LARGEST (`up`) source value of its
      * transformed partition? At a boundary, strict comparisons exclude
      * the partition itself: `ts < '…T00:00'` holds for NO row of that
      * day. */
    def atBoundary(f: TField, lv: Any, up: Boolean): Boolean =
      step(lv, f.srcType, up).exists { nb =>
        val dt = f.t.resultType(f.srcType)
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(dt)
        ord.compare(f.t.eval(nb, f.srcType), f.t.eval(lv, f.srcType)) != 0
      }

    /** One leaf `col op lit` (field on the left). `flip` when the literal
      * was on the left. */
    def leaf(fe: VExpression, le: VExpression, op: String): Option[Boolean] =
      for {
        f <- fieldOf(fe)
        (lv, lt) <- litOf(le)
        // The literal must be typed exactly as the source column — a
        // cross-type comparison's coercion semantics are not re-derived
        // here (sound: just don't prune).
        if lt == f.srcType
        if f.t.monotonic || op == "="
        excl <- {
          if (lv == null) Some(true) // `v op NULL` matches nothing
          else cmpTransformed(f, lv).map { c =>
            op match {
              // v = lit  ⇒ t(v) must equal t(lit)
              case "=" => c != 0
              // v < lit  ⇒ t(v) ≤ t(lit): exclude when t(file) > t(lit);
              // at the partition's LOWER boundary (lit is its smallest
              // source value) also when equal — no row of the partition
              // is strictly below it.
              case "<" => c > 0 || (c == 0 && atBoundary(f, lv, up = false))
              case "<=" => c > 0
              // v > lit  ⇒ t(v) ≥ t(lit); at the UPPER boundary also
              // exclude the equal partition.
              case ">" => c < 0 || (c == 0 && atBoundary(f, lv, up = true))
              case ">=" => c < 0
              case _ => false
            }
            // A null TRANSFORMED value (cmp undecidable) means the file's
            // rows are ALL NULL in the source column (transforms preserve
            // null, partition values are file-constant) — `v op lit`
            // evaluates NULL on every row, so the file is excludable.
          }.orElse(Some(values != null))
        }
      } yield excl

    p.name() match {
      case "AND" if p.children().length == 2 =>
        (child(0).flatMap(excludesImpl(_, fields, values)),
          child(1).flatMap(excludesImpl(_, fields, values))) match {
          case (None, None) => None
          case (a, b) => Some(a.getOrElse(false) || b.getOrElse(false))
        }
      case "OR" if p.children().length == 2 =>
        for {
          a <- child(0).flatMap(excludesImpl(_, fields, values))
          b <- child(1).flatMap(excludesImpl(_, fields, values))
        } yield a && b
      case "=" | "<" | "<=" | ">" | ">=" if p.children().length == 2 =>
        val Array(l, r) = p.children()
        def flipOp(op: String): String = op match {
          case "<" => ">"
          case "<=" => ">="
          case ">" => "<"
          case ">=" => "<="
          case other => other
        }
        leaf(l, r, p.name()).orElse(leaf(r, l, flipOp(p.name())))
      case "IN" if p.children().length >= 2 =>
        fieldOf(p.children()(0)).flatMap { f =>
          val lits = p.children().drop(1).toSeq.map(litOf)
          if (lits.exists(_.isEmpty) ||
              lits.flatten.exists(_._2 != f.srcType)) None
          // Exclude iff NO list element can match: a NULL literal never
          // matches (IN yields NULL, filtered out), and cmp undecidable
          // means the file's source values are all NULL — also no match.
          else if (values == null) Some(false)
          else Some(lits.flatten.forall { case (lv, _) =>
            lv == null || cmpTransformed(f, lv).forall(_ != 0)
          })
        }
      case "IS_NULL" if p.children().length == 1 =>
        fieldOf(p.children()(0)).map { f =>
          // Transforms preserve null: a file with a NON-null transformed
          // value holds only non-null source values.
          values != null && values(f.idx) != null
        }
      case "IS_NOT_NULL" if p.children().length == 1 =>
        fieldOf(p.children()(0)).map { f =>
          values != null && values(f.idx) == null
        }
      case _ => None
    }
  }
}
