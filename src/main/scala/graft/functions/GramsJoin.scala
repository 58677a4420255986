package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL space-joined `width`-grams of a token array in position order
  * (non-distinct), fused into one codegen'd expression — the occurrence-
  * level n-gram pass behind frequency work (q_text_ngrams's vocab counts,
  * q_text_novelty's reference-familiarity statistics), where every
  * occurrence matters and [[Grams5]]/[[GramsDistinctCount]]'s dedup would
  * be wrong.
  *
  * Drop-in ELEMENT-IDENTICAL to the HOF form
  * `transform(sequence(0, size(tok)-width), i ->
  * concat_ws(' ', tok[i], .., tok[i+width-1]))`:
  *  - grams in position order, one per window, duplicates kept;
  *  - `concat_ws` null semantics — null tokens are skipped, never a null
  *    gram ([[UTF8String.concatWs]] implements exactly this), so elements
  *    are never null;
  *  - fewer than `width` tokens yields an EMPTY array (callers pre-filter;
  *    the HOF's `sequence(0, negative)` would throw instead, so the guard
  *    is strictly more defensive).
  */
case class GramsJoin(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, s"grams_join width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "grams_join"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"grams_join expects array<string>, got ${other.sql}")
    }

  /** Called from eval/codegen once per row. */
  def grams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n - width + 1)
    val parts = new Array[UTF8String](width)
    var i = 0
    while (i <= n - width) {
      var j = 0
      while (j < width) {
        // concat_ws skips nulls — concatWs treats null inputs as absent
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Grams5.space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("gramsJoin", this, classOf[GramsJoin].getName)
      s"${ev.value} = $self.grams($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramsJoin {
  val FunctionName = "grams_join"

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `gramsJoin($"tok", 2)`. */
  def gramsJoin(spark: SparkSession, tok: Column, width: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      FunctionName, tok, org.apache.spark.sql.functions.lit(width))
  }
}
