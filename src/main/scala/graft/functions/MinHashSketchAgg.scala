package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a sketch aggregate (TypedImperativeAggregate —
  * the mutable-buffer rung used for HLL/quantile sketches, SURVEY §2.11).
  *
  * Input: the per-shingle 64-bit hash (`xxhash64(shingle)`).
  * Buffer: `Array[Long]` of nPerms running minima — fixed 8·nPerms bytes,
  * updated in place, merged by element-wise min; map-side partial
  * aggregation therefore ships one small buffer per group per task no
  * matter how many shingles stream through.
  *
  * Bit-identical to the relational explode+64-min-columns form
  * ([[graft.operators.MinHashLsh.signaturesFromShingles]]): both compute
  * `min over shingles of xxhash64(h ⊕ salt_i)` with the same salts
  * (`Random(seed)`) and Spark's own XXH64 (seed 42, matching the
  * `xxhash64` SQL function on a LongType input) — parity is asserted in
  * the sbt suite.
  */
case class MinHashSketchAgg(
    child: Expression,
    nPerms: Int = 64,
    seed: Long = 7L,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val salts: Array[Long] = {
    val r = new scala.util.Random(seed)
    Array.fill(nPerms)(r.nextLong())
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input (a shingle hash), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < nPerms) {
        // Same function as SQL xxhash64(longCol ⊕ salt): XXH64 over the
        // 8-byte long with Spark's default seed 42.
        val p = XXH64.hashLong(h ^ salts(i), 42L)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nPerms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any =
    // An all-MaxValue buffer means no input rows: NULL, not a fake signature.
    if (buf.forall(_ == Long.MaxValue)) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}

/** Row-local MinHash signature over a PRE-HASHED shingle array —
  * `sig(i) = min over elements h of XXH64(h ⊕ salt_i, 42)`, the whole
  * signature computed inside one projection.
  *
  * The signature frames this engine aggregates are ONE ROW PER DOCUMENT
  * already (`(id, shingles array)`), so the explode + groupBy("id") the
  * aggregate forms pay exists only to fold the array — a full Exchange
  * plus two aggregation passes for something each row can compute alone.
  * This expression deletes all of it: the plan is Scan → Project, and it
  * participates in whole-stage codegen (the loop body is one static call;
  * the per-element work — nPerms XXH64 rounds — dwarfs the call overhead).
  *
  * Bit-identical to [[MinHashSketchAgg]] over the exploded elements (same
  * `Random(seed)` salts, same XXH64-seed-42 per-perm hash, min per
  * register — parity asserted in the sbt suite). NULL for a NULL input, an
  * empty array, or an all-NULL array — the cases where the exploded
  * aggregate emits no row / a NULL signature; callers drop those rows
  * explicitly to preserve the explode shape.
  */
case class MinHashSignature(child: Expression, nPerms: Int = 64, seed: Long = 7L)
    extends UnaryExpression {

  private lazy val salts: Array[Long] = {
    val r = new scala.util.Random(seed)
    Array.fill(nPerms)(r.nextLong())
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (shingle hashes), got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData], salts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltsRef = ctx.addReferenceObj("minhashSalts", salts, "long[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinHashKernel.compute($a, $saltsRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Static kernel shared by [[MinHashSignature]]'s interpreted and
  * generated paths (a standalone object so the codegen call resolves
  * through the Java static forwarder). */
object MinHashKernel {
  def compute(hashes: ArrayData, salts: Array[Long]): GenericArrayData = {
    val m = hashes.numElements()
    val out = Array.fill(salts.length)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < m) {
      // A NULL element mirrors the aggregate's null-input skip (unreachable
      // from the engine's pipelines — element hashes come from xxhash64).
      if (!hashes.isNullAt(j)) {
        any = true
        val h = hashes.getLong(j)
        var i = 0
        while (i < salts.length) {
          val p = XXH64.hashLong(h ^ salts(i), 42L)
          if (p < out(i)) out(i) = p
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(out)
  }
}
