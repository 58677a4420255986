package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The two Bloom probe positions of a gram — `[h1, h2]` — computed from
  * the md5 digest BYTES, fused into one codegen'd expression.
  *
  * Value-identical to the SQL pair the batch Bloom engine used
  * (`conv(substring(md5(g), 1, 8), 16, 10) % mBits` /
  * `conv(substring(md5(g), 9, 8), 16, 10) % mBits`): the first/second
  * big-endian 32-bit words of the digest ARE the values those 8-hex-char
  * substrings parse to — the same identity [[BloomBcAnyHit]] relies on —
  * so the cross-engine bitmap contract (the DuckDB oracle parses md5 hex)
  * is untouched while the engine skips the 32-char hex string, two
  * substrings and two conv parses per gram.
  */
case class BloomPair(child: Expression, mBits: Long)
    extends UnaryExpression {

  require(mBits >= 1, s"bloom_pair mBits must be >= 1, got $mBits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_pair"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_pair expects string, got ${other.sql}")
    }

  // MessageDigest is stateful and not thread-safe; one per executor thread.
  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Called from eval/codegen once per row. */
  def pair(g: UTF8String): GenericArrayData = {
    val dg = digest.get()
    dg.reset()
    val md = dg.digest(g.getBytes)
    val h1 = (((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)) % mBits
    val h2 = (((md(4) & 0xffL) << 24) | ((md(5) & 0xffL) << 16) |
      ((md(6) & 0xffL) << 8) | (md(7) & 0xffL)) % mBits
    new GenericArrayData(Array(h1, h2))
  }

  override def nullSafeEval(input: Any): Any =
    pair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("bloomPair", this, classOf[BloomPair].getName)
      s"${ev.value} = $self.pair($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomPair {
  val FunctionName = "bloom_pair"

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `bloomPair($"g", mBits)`. */
  def bloomPair(spark: SparkSession, g: Column, mBits: Long): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function(FunctionName, g, lit(mBits))
  }
}
