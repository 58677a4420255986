package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Broadcast-needle argmax-cosine probe — the semantic-decontamination hot
  * kernel fused into ONE expression: for a corpus vector, the best
  * benchmark ("needle") embedding by 4-dp-rounded cosine with ties broken
  * to the SMALLEST needle id, returned as the family's packed long
  * (s = round(sim·10⁴)+10⁴ in the high bits, 2⁴¹−1−n_id in the low 41).
  *
  * This replaces a corpus × needles BroadcastNestedLoopJoin + packed-long
  * HashAggregate with a MAP-ONLY projection: the pair stream never
  * materializes as rows, no aggregate runs, and the only exchange left in
  * the query is the output sort. The needle matrix rides a TorrentBroadcast
  * exactly like [[BloomBcAnyHit]]'s words array (shipped once per executor,
  * plan carries only the handle), with the same boundedness argument: the
  * needle set is the BENCHMARK SUITE's embedding matrix, small by nature —
  * 64 doubles per benchmark item, ~5 MB at the sf16 composed point.
  *
  * Value parity with the join+aggregate formulation (and the DuckDB
  * oracle's window argmax) is exact, not approximate:
  *  - per-pair arithmetic is [[CosineSimilarity]]'s verbatim — dot, |a|²,
  *    |b|² accumulated left-to-right, sim = dot/(√|a|²·√|b|²);
  *  - rounding is monotone, so max(round(sim)) = round(max raw sim) — the
  *    exact HALF_UP decimal round (Spark's `round(x, 4)` semantics via
  *    BigDecimal.valueOf) runs ONCE on the raw max, not per pair;
  *  - the min-id tie rule re-rounds only candidates within 2·10⁻⁴ of the
  *    raw max (a proven superset: round(x) = K requires x ≥ K − 5·10⁻⁵
  *    and K ≥ rawMax − 5·10⁻⁵), so ties resolve on the same rounded
  *    values the join form compares. `Round11OpsSpec` pins fused-vs-naive
  *    value identity on a crafted tie/anti-correlated fixture.
  *
  * All-NaN inputs (zero-norm vectors; none exist in the driver corpora)
  * return null, matching the join form where a null packed value never
  * survives the max aggregate.
  */
case class NeedleArgmaxPacked(
    child: Expression,
    bcIds: Broadcast[Array[Long]],
    bcVecs: Broadcast[Array[Array[Double]]]
) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "needle_argmax_packed"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"needle_argmax_packed expects array<double>, got ${other.sql}")
    }

  // per-thread raw-sim scratch (needle count is fixed per instance);
  // avoids a per-row allocation in the hot loop
  @transient private lazy val scratch: ThreadLocal[Array[Double]] =
    ThreadLocal.withInitial(() => new Array[Double](bcVecs.value.length))

  // FULL-length |needle|² folds, computed once per executor (round 21):
  // per-pair nb was a second multiply-add per element of every pair. The
  // per-pair fold covers min(len) elements — at m == nv.length (the
  // universal fixed-dim case) the full fold is the identical IEEE double;
  // ragged pairs recompute the prefix below (bit-parity contract).
  @transient private lazy val needleNorm2: Array[Double] = {
    val vecs = bcVecs.value
    val out = new Array[Double](vecs.length)
    var j = 0
    while (j < vecs.length) {
      val nv = vecs(j)
      var s = 0.0; var i = 0
      while (i < nv.length) { val y = nv(i); s += y * y; i += 1 }
      out(j) = s; j += 1
    }
    out
  }

  private def roundedScaled(x: Double): Long = NeedleProbe.roundedScaled(x)

  /** Called once per row from eval/codegen; returns the packed long or
    * null (boxed) when every needle sim is NaN. */
  def packedBest(v: ArrayData): Any = {
    val ids = bcIds.value
    val vecs = bcVecs.value
    val norms2 = needleNorm2
    val sims = scratch.get()
    // one primitive copy + one full-length |v|² fold per ROW (round 21):
    // both were per-pair work — 2 of the 3 multiply-adds per element
    val va = v.toDoubleArray()
    val n = va.length
    var naFull = 0.0
    locally {
      var i = 0
      while (i < n) { val x = va(i); naFull += x * x; i += 1 }
    }
    var rawMax = Double.NegativeInfinity
    var any = false
    var j = 0
    while (j < vecs.length) {
      val nv = vecs(j)
      val m = math.min(n, nv.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        dot += va(i) * nv(i)
        i += 1
      }
      val na =
        if (m == n) naFull
        else { var s = 0.0; var q = 0; while (q < m) { val x = va(q); s += x * x; q += 1 }; s }
      val nb =
        if (m == nv.length) norms2(j)
        else { var s = 0.0; var q = 0; while (q < m) { val y = nv(q); s += y * y; q += 1 }; s }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      sims(j) = sim
      if (sim == sim) { // not NaN
        any = true
        if (sim > rawMax) rawMax = sim
      }
      j += 1
    }
    if (!any) return null
    val kMax = roundedScaled(rawMax)
    var best = Long.MaxValue
    j = 0
    while (j < vecs.length) {
      val sim = sims(j)
      if (sim == sim && sim >= rawMax - 2e-4 && ids(j) < best &&
        roundedScaled(sim) == kMax) best = ids(j)
      j += 1
    }
    ((kMax + 10000L) << 41) | ((1L << 41) - 1L - best)
  }

  override def nullSafeEval(input: Any): Any =
    packedBest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // the instance (carrying both broadcast handles) rides the codegen
      // reference array; the needle loop is compiled JVM code in packedBest
      // — one virtual call per row keeps WholeStageCodegen intact
      val self = ctx.addReferenceObj("needleProbe", this, classOf[NeedleArgmaxPacked].getName)
      val boxed = ctx.freshName("packed")
      s"""
         |Object $boxed = $self.packedBest($v);
         |if ($boxed == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((java.lang.Long) $boxed).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-needle twin of [[NeedleArgmaxPacked]] for the IVF (past-
  * broadcast) tier: the candidate needle set arrives from the CELL JOIN as
  * an `array<struct<n_id bigint, nv array<double>>>` column (one row per
  * corpus-vector × probed-cell, carrying that cell's needle list), and the
  * kernel emits the same packed (round4-sim, min-n_id) long in ONE call —
  * raw cosine loop over the cell's needles, exact HALF_UP rounding run
  * once on the raw max with the tie-window re-round, identical to the
  * broadcast kernel's discipline and to the row-per-pair formulation it
  * replaces. The row-per-pair form paid TWO BigDecimal roundings per
  * joined pair (`round(cos, 4)` then `round(sim4·10⁴)`) — ~320M BigDecimal
  * ops at the sf16 point, which measured as ~70% of the query (31.2 s vs
  * the ~3 s the join/probe shape itself costs); this kernel pays ~1 per
  * corpus-row-per-cell. All-NaN cells return null (max skips it), as
  * before.
  */
case class NeedleArgmaxPackedCells(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "needle_argmax_packed_cells"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
        ArrayType(StructType(Array(
          StructField(_, LongType, _, _), StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"needle_argmax_packed_cells expects (array<double>, array<struct<bigint, array<double>>>), got $other")
    }

  /** Called once per row from eval/codegen. */
  def packedBest(v: ArrayData, nds: ArrayData): Any = {
    val kk = nds.numElements()
    if (kk == 0) return null
    // one primitive copy + one full-length |v|² fold per ROW (round 21) —
    // both were per-pair; at m == n the full fold is the identical IEEE
    // double, ragged pairs recompute the prefix (bit-parity contract). The
    // needle-side fold stays per pair: the posting list is a per-row column.
    val va = v.toDoubleArray()
    val n = va.length
    var naFull = 0.0
    locally {
      var i = 0
      while (i < n) { val x = va(i); naFull += x * x; i += 1 }
    }
    val sims = new Array[Double](kk)
    var rawMax = Double.NegativeInfinity
    var any = false
    var j = 0
    while (j < kk) {
      val row = nds.getStruct(j, 2)
      val nv = row.getArray(1).toDoubleArray()
      val m = math.min(n, nv.length)
      var dot = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val y = nv(i)
        dot += va(i) * y; nb += y * y
        i += 1
      }
      val na =
        if (m == n) naFull
        else { var s = 0.0; var q = 0; while (q < m) { val x = va(q); s += x * x; q += 1 }; s }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      sims(j) = sim
      if (sim == sim) { // not NaN
        any = true
        if (sim > rawMax) rawMax = sim
      }
      j += 1
    }
    if (!any) return null
    val kMax = NeedleProbe.roundedScaled(rawMax)
    var best = Long.MaxValue
    j = 0
    while (j < kk) {
      val sim = sims(j)
      if (sim == sim && sim >= rawMax - 2e-4) {
        val id = nds.getStruct(j, 2).getLong(0)
        if (id < best && NeedleProbe.roundedScaled(sim) == kMax) best = id
      }
      j += 1
    }
    ((kMax + 10000L) << 41) | ((1L << 41) - 1L - best)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    packedBest(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nds) => {
      val self = ctx.addReferenceObj("needleCellProbe", this, classOf[NeedleArgmaxPackedCells].getName)
      val boxed = ctx.freshName("packed")
      s"""
         |Object $boxed = $self.packedBest($v, $nds);
         |if ($boxed == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((java.lang.Long) $boxed).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NeedleProbe {

  /** Spark's `round(x·10⁴)` on an exact-4-dp double — the family packing's
    * scaled HALF_UP round, shared by the broadcast and column-needle
    * kernels (bit-parity contract). */
  private[functions] def roundedScaled(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .movePointRight(4).longValueExact()

  /** Column-API surface for [[NeedleArgmaxPackedCells]]. */
  def argmaxPackedCells(vec: Column, nds: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(NeedleArgmaxPackedCells(
      org.apache.spark.sql.GraftColumnBridge.expression(vec),
      org.apache.spark.sql.GraftColumnBridge.expression(nds)))

  /** Broadcast the needle matrix and return a vector-column => packed-long
    * closure. Built DIRECTLY via GraftColumnBridge (same route and same
    * rationale as [[BloomBcProbe.gate]]): a per-call temp-function entry
    * would pin the needle broadcasts in the function registry for the
    * session lifetime; with the plan as the only reference, the
    * ContextCleaner reclaims them once the caller's DataFrame is dropped.
    */
  def gate(
      spark: SparkSession,
      ids: Array[Long],
      vecs: Array[Array[Double]]
  ): Column => Column = {
    require(ids.length == vecs.length,
      s"needle ids/vectors must align (${ids.length} vs ${vecs.length})")
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcVecs = spark.sparkContext.broadcast(vecs)
    v => org.apache.spark.sql.GraftColumnBridge.column(
      NeedleArgmaxPacked(org.apache.spark.sql.GraftColumnBridge.expression(v), bcIds, bcVecs))
  }
}
