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
  * first-occurrence distinct order for every n, cross-checked in the sbt
  * suite).
  *
  * A Generator beats exploding a materialized array when the fan-out is
  * large: rows stream out of `eval` lazily through `GenerateExec` as the
  * window slides, so a 100 k-token document never materializes its n-gram
  * list as one array value — the only buffered state is the string set
  * distinctness requires. `CodegenFallback` is standard for generators —
  * `GenerateExec` drives codegen around the generator, with per-row `eval`
  * inside.
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
      // Tokenization MUST mirror the SQL route exactly (the d12 oracle and
      // the parity suite compare them): SQL trim() strips SPACES only (not
      // \t/\n, unlike java.lang.String.trim) and SQL lower() is
      // locale-independent (UTF8String.toLowerCase), never the JVM default
      // locale (tr-TR 'I' → 'ı' would silently diverge).
      // limit = -1: SQL split() KEEPS trailing empty tokens; Java's
      // default limit 0 silently drops them.
      val toks = raw.asInstanceOf[UTF8String].trim().toLowerCase.toString
        .split("""\s+""", -1)
      if (toks.length < n) Iterator.empty
      else {
        // Lazily emitted, first-occurrence distinct: the only buffered
        // state is the seen-set needed for distinctness — rows stream out
        // as the window slides, never as one materialized array.
        val seen = new java.util.HashSet[String]()
        Iterator.range(0, toks.length - n + 1)
          .map(i => toks.slice(i, i + n).mkString(" "))
          .filter(seen.add)
          .map(g => InternalRow(UTF8String.fromString(g)))
      }
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
