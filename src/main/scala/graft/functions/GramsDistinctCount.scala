package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of DISTINCT space-joined `width`-grams of a token array, fused into
  * one codegen'd expression — the repetition-scoring kernel
  * (q_text_repetition's `n_unique` bigram count).
  *
  * Drop-in VALUE-IDENTICAL to the HOF form
  * `size(array_distinct(transform(sequence(0, size(tok)-width), i ->
  * concat_ws(' ', tok[i], .., tok[i+width-1]))))`:
  *  - `concat_ws` null semantics — null tokens are SKIPPED (never a null
  *    gram; `concat_ws(' ', null, 'b') = 'b'`), unlike [[Grams5]]'s
  *    `concat`, which nulls the gram. [[UTF8String.concatWs]] implements
  *    exactly this.
  *  - string-distinct (UTF8String equality = byte equality, same as
  *    array_distinct's).
  *  - fewer than `width` tokens counts 0 (callers pre-filter; this is the
  *    slice-length guard).
  *
  * Why fused: the HOF chain walks three interpreted lambda levels and
  * materializes the gram array just to measure it; this assembles each gram
  * once in compiled code and counts in a hash set, returning a scalar —
  * no output array at all.
  */
case class GramsDistinctCount(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, s"grams_distinct_count width must be >= 1, got $width")

  override def dataType: DataType = LongType
  override def prettyName: String = "grams_distinct_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"grams_distinct_count expects array<string>, got ${other.sql}")
    }

  /** Called from eval/codegen once per row. */
  def countDistinct(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < width) return 0L
    val seen = new java.util.HashSet[UTF8String](Math.max(16, (n - width + 1) * 2))
    val parts = new Array[UTF8String](width)
    var i = 0
    while (i <= n - width) {
      var j = 0
      while (j < width) {
        // concat_ws skips nulls — concatWs treats null inputs as absent
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Grams5.space, parts: _*))
      i += 1
    }
    seen.size.toLong
  }

  override def nullSafeEval(input: Any): Any =
    countDistinct(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("gramsDistinctCount", this,
        classOf[GramsDistinctCount].getName)
      s"${ev.value} = $self.countDistinct($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramsDistinctCount {
  val FunctionName = "grams_distinct_count"

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `gramsDistinctCount($"tok", 2)`. */
  def gramsDistinctCount(spark: SparkSession, tok: Column, width: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      FunctionName, tok, org.apache.spark.sql.functions.lit(width))
  }
}
