package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All sign-LSH band keys of an `array<double>` vector in one codegen'd
  * pass — the hot row-local stage of [[graft.operators.SignLshNearDup]].
  *
  * The composable form — `transform(planesLit, p -> dot(v, p) > 0)` over a
  * literal plane matrix — pays one interpreted lambda invocation per
  * (plane, element): ~19k per row at 48×3 bands × 64 dims, which made the
  * banding stage cost more than the scan (measured 2.2 s for 2 000 rows).
  * This expression holds the plane matrix as a flat codegen reference
  * object and emits a tight two-level loop, participating in whole-stage
  * codegen like [[CosineSimilarity]].
  *
  * Output: `array<int>` of length `bands`; band b's key packs the sign
  * bits (dot(v, plane) > 0) of its `rowsPerBand` planes little-endian.
  * NULL input or any NULL element → NULL. Vectors shorter than the plane
  * dimension dot over the common prefix (same contract as the cosine).
  */
case class SignBandKeys(
    child: Expression,
    planes: Array[Double],
    dim: Int,
    bands: Int,
    rowsPerBand: Int)
    extends UnaryExpression {

  require(planes.length == bands * rowsPerBand * dim,
    s"plane matrix must be bands*rowsPerBand*dim = ${bands * rowsPerBand * dim} " +
      s"doubles, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sign_band_keys"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val keys = new Array[Int](bands)
    var p = 0
    while (p < bands * rowsPerBand) {
      var dot = 0.0
      val off = p * dim
      var j = 0
      while (j < n) {
        dot += v.getDouble(j) * planes(off + j)
        j += 1
      }
      if (dot > 0.0) keys(p / rowsPerBand) |= 1 << (p % rowsPerBand)
      p += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("signPlanes", planes, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val keys = ctx.freshName("keys")
      val gad = classOf[GenericArrayData].getName
      s"""
        int $n = java.lang.Math.min($dim, $a.numElements());
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        }
        if (!${ev.isNull}) {
          int[] $keys = new int[$bands];
          for (int $p = 0; $p < ${bands * rowsPerBand}; $p++) {
            double $dot = 0.0;
            int $off = $p * $dim;
            for (int $j = 0; $j < $n; $j++) {
              $dot += $a.getDouble($j) * $planesRef[$off + $j];
            }
            if ($dot > 0.0) $keys[$p / $rowsPerBand] |= 1 << ($p % $rowsPerBand);
          }
          ${ev.value} = new $gad($keys);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)
}
