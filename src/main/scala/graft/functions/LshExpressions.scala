package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Shared fixed LSH coefficients (identical literals appear in the DuckDB
  * oracle SQL — signatures must reproduce bit-for-bit across engines).
  */
object LshConstants {
  val A: Array[Long] = graft.queries.PipelineQueries.lshA.toArray
  val B: Array[Long] = graft.queries.PipelineQueries.lshB.toArray
  val MinHashMod = 2147483647L
  val PlaneMod = 1009L
  val PlaneShift = 504L
}

/** 16 random-hyperplane sign bits of a double vector, packed into a long.
  *
  * Plane weights are a deterministic integer lattice
  * `(A(p)·(i+1) + B(p)) mod 1009 − 504` so any engine rebuilds identical
  * planes; the dot product is a sequential double fold — bitwise equal to the
  * oracle's `list_sum`. The nested higher-order-function formulation runs
  * interpreted lambdas per element (~planes × dims per row); this compiles to
  * two tight loops inside whole-stage codegen.
  */
case class HyperplaneSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < 16) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val w = (LshConstants.A(p) * (i + 1) + LshConstants.B(p)) % LshConstants.PlaneMod - LshConstants.PlaneShift
        dot += v.getDouble(i) * w.toDouble
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val a = ctx.addReferenceObj("lshA", LshConstants.A, "long[]")
      val b = ctx.addReferenceObj("lshB", LshConstants.B, "long[]")
      val n = ctx.freshName("n"); val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val w = ctx.freshName("w"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < 16; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $w = ($a[$p] * ($i + 1) + $b[$p]) % 1009L - 504L;
         |    $dot += $v.getDouble($i) * (double) $w;
         |  }
         |  if ($dot > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 16 affine-universal minhashes `min_h (A(s)·h + B(s)) mod 2^31−1` over an
  * array of pre-hashed shingle values — array<long> in, array<long>(16) out.
  * Replaces a 16×|shingles| interpreted lambda walk per document.
  */
case class AffineMinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](16)
    var s = 0
    while (s < 16) {
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (LshConstants.A(s) * hs.getLong(i) + LshConstants.B(s)) % LshConstants.MinHashMod
        if (v < mn) mn = v
        i += 1
      }
      out(s) = mn
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val a = ctx.addReferenceObj("lshA", LshConstants.A, "long[]")
      val b = ctx.addReferenceObj("lshB", LshConstants.B, "long[]")
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val mn = ctx.freshName("mn"); val v = ctx.freshName("v"); val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[16];
         |for (int $s = 0; $s < 16; $s++) {
         |  long $mn = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($a[$s] * $hs.getLong($i) + $b[$s]) % 2147483647L;
         |    if ($v < $mn) $mn = $v;
         |  }
         |  $out[$s] = $mn;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshFunctions {
  /** Delegates to the shared `GraftExtensions` builders (same arity guard
    * and coercion as extension injection).
    */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, "hyperplane_sig", "minhash_sig")

  def hyperplaneSig(spark: SparkSession, v: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("hyperplane_sig", v)
  }

  def minhashSig(spark: SparkSession, hs: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_sig", hs)
  }
}
