package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 16-bit md5-derived SimHash over a token array, fused into one codegen'd
  * expression — the near-dup fingerprint kernel of q_dedup_simhash.
  *
  * Value-identical to the HOF formulation the query first shipped
  * (`aggregate(sequence(0,15), ..., aggregate(tok, ...))`) and to the DuckDB
  * oracle: per token t, h(t) = the first 8 md5 hex digits as an unsigned
  * 32-bit integer (exactly `conv(substring(md5(t),1,8),16,10)`); bit b of
  * the fingerprint is set iff the +1/−1 votes of `(h(t) >> b) & 1` sum
  * positive. A null token votes −1 on every bit (the HOF's CASE falls to
  * ELSE on a null condition); an empty array yields fingerprint 0.
  *
  * Why fused: the HOF form re-evaluates the inner aggregate — including the
  * md5 — once PER BIT, i.e. 16 md5 computations per token, all through
  * interpreted lambdas (rows-forced bench: 4.46 s at sf0.1, the suite's
  * single largest query). Here each token is hashed ONCE and the 16 vote
  * counters update in a compiled loop; the md5 dominates, so the expected
  * win is ~16× on hashing plus the lambda-interpreter overhead. Map-only,
  * WholeStageCodegen participation via one virtual call per row (the
  * [[NeedleArgmaxPacked]] / [[BloomProbe]] pattern).
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects array<string>, got ${other.sql}")
    }

  /** Called from eval/codegen once per row. */
  def simhash(arr: ArrayData): Long = {
    val md = SimHash16.digest.get()
    val counts = new Array[Int](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 hex digits = first 4 digest bytes, big-endian unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 16) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    // vote_b = counts_b − (n − counts_b) > 0  ⟺  2·counts_b > n
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (2 * counts(b) > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("simhash16", this, classOf[SimHash16].getName)
      s"${ev.value} = $self.simhash($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  val FunctionName = "simhash16"

  // MessageDigest is not thread-safe; one instance per executor thread.
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `simhash16($"tok")`. */
  def simhash16(spark: SparkSession, tok: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FunctionName, tok)
  }
}
