package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating expression (the §2.11 Generator rung):
  * `graft_shingles(text, n)` emits one row per DISTINCT word n-gram of the
  * lowercased, whitespace-split text — the row-generating twin of
  * [[graft.operators.MinHashLsh.shingles]] (identical tokenization and
  * first-occurrence distinct order, cross-checked in the sbt suite).
  *
  * A Generator beats exploding a materialized array when the fan-out is
  * large: rows stream out of `eval` one at a time through `GenerateExec`,
  * so a 100 k-token document never allocates its n-gram array as a single
  * value. `CodegenFallback` is standard for generators — `GenerateExec`
  * drives codegen around the generator, with per-row `eval` inside.
  */
final case class ShingleExplode(child: Expression, n: Int)
    extends Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleExplode =
    copy(child = newChildren.head)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects a STRING input, got ${child.dataType.sql}")
  }

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Iterator.empty
    else {
      val toks = raw.asInstanceOf[UTF8String].toString
        .trim.toLowerCase.split("""\s+""")
      if (toks.length < n) Iterator.empty
      else {
        // First-occurrence distinct, matching array_distinct semantics.
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + n <= toks.length) {
          seen.add(toks.slice(i, i + n).mkString(" "))
          i += 1
        }
        seen.iterator().asInstanceOf[java.util.Iterator[String]].asScala
          .map(g => InternalRow(UTF8String.fromString(g)))
      }
    }
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      override def hasNext: Boolean = it.hasNext
      override def next(): A = it.next()
    }
  }
}

object ShingleExplode {
  /** SQL builder: second argument must be a foldable INT literal. */
  def fromExpressions(children: Seq[Expression]): Expression = {
    require(children.length == 2, s"graft_shingles expects 2 arguments, got ${children.length}")
    val nExpr = children(1)
    require(nExpr.foldable && nExpr.dataType == IntegerType,
      "graft_shingles: n must be an INT literal")
    val n = nExpr.eval(null).asInstanceOf[Int]
    ShingleExplode(children.head, n)
  }
}
