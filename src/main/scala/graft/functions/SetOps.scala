package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Codegen'd |A ∩ B| for two SORTED ascending long arrays (set semantics:
  * inputs must be distinct + sorted, e.g. via `array_sort(array_distinct(..))`
  * once per row upstream).
  *
  * `size(array_intersect(a, b))` builds a hash set and materializes the
  * intersection array per row only to take its length; pair-verify loops
  * (MinHash / n-gram Jaccard dedup) call this millions of times on ~50-element
  * arrays, where the sorted two-pointer merge is allocation-free and O(n+m).
  * With |A ∪ B| = |A| + |B| − |A ∩ B|, one merge prices the whole Jaccard.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetOps {
  val FunctionName = "sorted_intersect_size"

  /** Register for SQL + Column use (idempotent per session); delegates to
    * the shared `GraftExtensions` builder, so this temp function — which
    * shadows the extension-injected one once any Column-API call registers
    * it — carries the identical long-array Cast and arity guard by
    * construction (without the Cast an int-backed array would hit
    * `ArrayData.getLong` on int storage).
    */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `sortedIntersectSize($"a", $"b")` — both arrays must
    * be distinct and sorted ascending.
    */
  def sortedIntersectSize(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FunctionName, a, b)
  }
}
