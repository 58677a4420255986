package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** DISTINCT 64-bit fingerprints of every `width`-token window, fused into
  * one codegen'd expression — the substring-dedup window pass
  * (q_dedup_substring's 20-token Lee-et-al shape).
  *
  * The HOF form (`array_distinct(transform(sequence(0, n-20), w ->
  * xxhash64(slice(tok, w+1, 20))))`) hashes every token ~20 times — once
  * per covering window — through a fresh slice allocation per window.
  * This kernel hashes each token ONCE (xxhash64 over its bytes, the same
  * primitive Spark's hash uses) and combines the window's 20 token hashes
  * with a 64-bit polynomial fold: O(n) string hashing instead of
  * O(n·width), no slices.
  *
  * Contract: equal windows (same token sequence) always collide; distinct
  * windows collide with ~2⁻⁶⁴ pairwise probability — the same class of
  * guarantee the previous array-hash carried, and the cross-engine
  * contract is COUNTS (the DuckDB oracle uses md5 strings), so the
  * fingerprint value itself never rides the output. Fewer than `width`
  * tokens yields an empty array (callers pre-filter). Null tokens hash as
  * a fixed marker (split() never emits nulls; edge armor).
  */
case class WindowHash64(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, s"window_hash64 width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_hash64 expects array<string>, got ${other.sql}")
    }

  /** Called from eval/codegen once per row. */
  def hashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) WindowHash64.NullMarker
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val nw = n - width + 1
    val seen = new java.util.HashSet[java.lang.Long](nw * 2)
    val out = new Array[Long](nw)
    var m = 0
    var w = 0
    while (w < nw) {
      var h = WindowHash64.Seed
      var j = 0
      while (j < width) { h = h * WindowHash64.Prime + th(w + j); j += 1 }
      if (seen.add(java.lang.Long.valueOf(h))) { out(m) = h; m += 1 }
      w += 1
    }
    new GenericArrayData(if (m == nw) out else java.util.Arrays.copyOf(out, m))
  }

  override def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("windowHash64", this, classOf[WindowHash64].getName)
      s"${ev.value} = $self.hashes($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHash64 {
  val FunctionName = "window_hash64"

  /** FNV-64 offset-basis / prime for the polynomial combine. */
  private[functions] val Seed = 0xcbf29ce484222325L
  private[functions] val Prime = 0x100000001b3L
  private[functions] val NullMarker = 0x9e3779b97f4a7c15L

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `windowHashes($"tok", 20)`. */
  def windowHashes(spark: SparkSession, tok: Column, width: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      FunctionName, tok, org.apache.spark.sql.functions.lit(width))
  }
}
