package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `FunctionCatalog` — the catalog-resolved route for custom
  * SQL functions, complementing the session-extension route in
  * [[graft.functions.GraftFunctions]]: functions live under a catalog
  * namespace (`graftfns.ops.dot(...)`) instead of the global registry, so
  * different catalogs can ship different function sets and the analyzer
  * resolves them like any other catalog object.
  *
  * Wire-up: `spark.sql.catalog.graftfns=graft.catalog.GraftFunctionCatalog`
  * (config or runtime `spark.conf.set`; catalogs instantiate lazily on
  * first reference).
  */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val ns = Array("ops")
  private val fns: Map[String, UnboundFunction] = Map(
    "dot" -> new UnboundDot)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(ns) || namespace.isEmpty)
      fns.keys.map(Identifier.of(ns, _)).toArray
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(ns))
      fns.getOrElse(ident.name, throw new NoSuchFunctionException(ident))
    else throw new NoSuchFunctionException(ident)
}

/** `dot(array<double>, array<double>)` — unbound shell doing type checks. */
final class UnboundDot extends UnboundFunction {
  override def name(): String = "dot"
  override def description(): String =
    "dot(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) -> DOUBLE: left-to-right dot-product fold"
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.fields.length == 2 && inputType.fields.forall(
      _.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (!ok) throw new UnsupportedOperationException(
      s"dot expects (array<double>, array<double>), got ${inputType.simpleString}")
    new BoundDot
  }
}

/** Bound scalar: same left-to-right fold as
  * [[graft.functions.VectorOps.dot]], so results are bit-comparable with
  * the expression route. */
final class BoundDot extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(DoubleType), ArrayType(DoubleType))
  override def resultType(): DataType = DoubleType
  override def name(): String = "dot"
  override def canonicalName(): String = "graft.dot"
  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): java.lang.Double = {
    if (input.isNullAt(0) || input.isNullAt(1)) return null
    val a = input.getArray(0)
    val b = input.getArray(1)
    // NULL semantics mirror the expression route exactly: VectorOps.dot's
    // zip_with pads a length mismatch with null and a null element poisons
    // the fold — so both cases are NULL here, never an error or a silent
    // 0.0 read from the null slot.
    if (a.numElements() != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
