package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Codegen'd integer code dot-product over two long arrays — the exact
  * compiled twin of `aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
  * (acc, x) -> acc + x)`, which walked TWO interpreter lambdas per element
  * per pair on the quantized tier's hot candidate path (the round-11
  * fused-kernel lesson applied to the int8 ranking loop: at sf16 the index
  * serve ranks ~4M candidate pairs per query batch through it).
  *
  * Null semantics mirror the HOF chain exactly: null array → null;
  * RAGGED lengths → null (zip_with pads the shorter side with null, the
  * product nulls, and the aggregate's `acc + null` nulls the fold);
  * a null ELEMENT on either side → null (same propagation). Overflow
  * cannot occur for int8 code vectors (|q| ≤ 127, dim 64 ⇒ |dot| ≤
  * 64·127² ≈ 10⁶), so the plain long sum is the same value the HOF's
  * non-overflowing adds produce.
  */
case class CodeDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "code_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  long $acc = 0L;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CodeDot {
  val FunctionName = "code_dot"

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `codeDot($"a", $"b")`. */
  def codeDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FunctionName, a, b)
  }
}
