package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Native codegen'd cosine similarity over two double arrays.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) walks
  * interpreter lambdas per element; this compiles to a tight fused loop inside
  * whole-stage codegen — the hot inner kernel of brute-force and LSH ANN
  * search. Semantics are bit-identical to the sequential fold the oracle uses:
  * dot, |a|², |b|² accumulated left-to-right in doubles, result
  * dot / (√|a|²·√|b|²).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  val FunctionName = "cosine_sim"

  /** Build with input normalization: float arrays (and anything castable)
    * go through an explicit Cast to array<double> — a no-op for already-
    * double inputs that the optimizer elides.
    */
  def normalized(a: Expression, b: Expression): Expression =
    CosineSimilarity(
      Cast(a, ArrayType(DoubleType)),
      Cast(b, ArrayType(DoubleType)))

  /** Register for SQL + Column use (idempotent per session); delegates to
    * the shared `GraftExtensions` builder so the temp-function path carries
    * the same arity guard and coercion as extension injection.
    */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `cosineSim($"a", $"b")`. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FunctionName, a, b)
  }
}
