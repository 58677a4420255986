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
  // 64-plane families for the multi-word signature: planes 0–15 are the
  // original A/B (word 0 stays bit-identical to HyperplaneSig), 16–63 the
  // round-19 extension constants
  val AW: Array[Long] = A ++ graft.queries.PipelineQueries.lshAExt
  val BW: Array[Long] = B ++ graft.queries.PipelineQueries.lshBExt
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

/** MULTI-WORD hyperplane signature: `words` longs, each packing 16 sign-LSH
  * bits — word w's bit j is plane p = 16·w + j of the 64-plane family
  * [[LshConstants.AW]]/[[LshConstants.BW]]. Word 0 is bit-identical to
  * [[HyperplaneSig]] (same planes 0–15), so every consumer of the
  * single-long signature is a strict prefix of this one. The multi-word
  * form is the 100 TB extension path the round-18 VERDICT names: 32/64
  * planes allow 24/32-bit band keys, keeping expected bucket occupancy
  * bounded past the ~10⁶-vector point where the 16-plane signature's
  * widest (16-bit) banding saturates. Same two-tight-loop codegen shape
  * as HyperplaneSig; the word packing (≤16 bits used per long) keeps
  * every oracle-side shift far below DuckDB's 63-bit overflow check.
  */
case class HyperplaneSigWords(child: Expression, words: Int)
    extends UnaryExpression {
  require(words >= 1 && words <= 4,
    s"words must be in [1, 4] (the 64-plane family packs 16 planes/word); got $words")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sig_words"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var sig = 0L
      var j = 0
      while (j < 16) {
        val p = 16 * w + j
        var dot = 0.0
        var i = 0
        while (i < n) {
          val wt = (LshConstants.AW(p) * (i + 1) + LshConstants.BW(p)) % LshConstants.PlaneMod - LshConstants.PlaneShift
          dot += v.getDouble(i) * wt.toDouble
          i += 1
        }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      out(w) = sig
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val a = ctx.addReferenceObj("lshAW", LshConstants.AW, "long[]")
      val b = ctx.addReferenceObj("lshBW", LshConstants.BW, "long[]")
      val n = ctx.freshName("n"); val w = ctx.freshName("w"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val wt = ctx.freshName("wt")
      val sig = ctx.freshName("sig"); val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[$words];
         |for (int $w = 0; $w < $words; $w++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < 16; $j++) {
         |    int $p = 16 * $w + $j;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $wt = ($a[$p] * ($i + 1) + $b[$p]) % 1009L - 504L;
         |      $dot += $v.getDouble($i) * (double) $wt;
         |    }
         |    if ($dot > 0) $sig |= (1L << $j);
         |  }
         |  $out[$w] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
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

  /** Multi-word signature Column. Built via the expression bridge, not the
    * temp-function registry: `words` is structural (it shapes the compiled
    * kernel), and the bridge needs no per-call registration.
    */
  def hyperplaneSigWords(v: Column, words: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(HyperplaneSigWords(
      Cast(org.apache.spark.sql.GraftColumnBridge.expression(v),
        ArrayType(DoubleType)), words))

  def minhashSig(spark: SparkSession, hs: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_sig", hs)
  }
}
