package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Strided token-window chunk texts, fused into one codegen'd expression —
  * the context-window packing pass (q_doc_chunks' 32/24 overlapping
  * windows, q_doc_fingerprint's 16/16 tiling).
  *
  * Drop-in ELEMENT-IDENTICAL to the HOF form
  * `transform(sequence(0, max(ceil((size(tok)-width)/stride), 0)), w ->
  * concat_ws(' ', slice(tok, w*stride+1, width)))`:
  *  - chunk c covers tokens [c·stride, c·stride+width); the last chunk
  *    may be shorter;
  *  - chunk count = 1 for n ≤ width, else 1 + ⌈(n-width)/stride⌉ — for
  *    width = stride this equals the tiling count ⌈n/width⌉ at every
  *    n ≥ 1, so both call shapes share the kernel (callers guarantee
  *    n ≥ 1: split() output is never empty);
  *  - `concat_ws` null-skip semantics per chunk.
  * Moving md5 OUT of the per-chunk lambda (q_doc_fingerprint) is part of
  * the win: applied post-explode it is a codegen'd built-in instead of an
  * interpreted call per lambda iteration.
  */
case class ChunkTexts(child: Expression, width: Int, stride: Int)
    extends UnaryExpression {

  require(width >= 1 && stride >= 1,
    s"chunk_texts needs width/stride >= 1, got $width/$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_texts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chunk_texts expects array<string>, got ${other.sql}")
    }

  /** Called from eval/codegen once per row. */
  def chunks(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef]) // defensive; callers guarantee n >= 1
    val nc = if (n <= width) 1 else 1 + (n - width + stride - 1) / stride
    val out = new Array[AnyRef](nc)
    val parts = new Array[UTF8String](width)
    var c = 0
    while (c < nc) {
      val start = c * stride
      val end = math.min(start + width, n)
      var j = 0
      while (j < end - start) {
        // concat_ws skips nulls; trailing nulls in the reused buffer are
        // skipped the same way a short final slice would be
        parts(j) = if (arr.isNullAt(start + j)) null else arr.getUTF8String(start + j)
        j += 1
      }
      while (j < width) { parts(j) = null; j += 1 }
      out(c) = UTF8String.concatWs(Grams5.space, parts: _*)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    chunks(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("chunkTexts", this, classOf[ChunkTexts].getName)
      s"${ev.value} = $self.chunks($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkTexts {
  val FunctionName = "chunk_texts"

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `chunkTexts($"tok", 32, 24)`. */
  def chunkTexts(spark: SparkSession, tok: Column, width: Int, stride: Int): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function(FunctionName, tok, lit(width), lit(stride))
  }
}
