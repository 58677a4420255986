package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd (k-means) refinement for IVF coarse quantizers.
  *
  * Each iteration is one distributed pass: nearest-centroid assignment is
  * map-side codegen (the K centroids ride in the plan as array literals — the
  * property that keeps IVF viable at 100 TB), and the new centroids are
  * element-wise means via posexplode + partial-aggregating groupBy on
  * (cell, position) — the shuffle carries K×dim×partitions partial sums, not
  * data. Only the K×dim mean table is collected per iteration.
  *
  * Everything is pinned so an external engine can replay it bit-for-bit:
  * a FIXED iteration count (no convergence test), cosine rounded to 6 dp with
  * lowest-cid tiebreak for assignment, and means computed as exact
  * decimal(38,12) sums (order-independent) divided as doubles and rounded to
  * 6 dp. `q_similarity_ann_ivf`'s DuckDB oracle mirrors the same iterations
  * in SQL.
  */
object IvfKMeans {

  /** Per-centroid `(-cos6, cid)` structs for `vcol` against the centroid
    * literals: `array_min(...)` of these is argmax-cosine with the
    * lowest-cid tiebreak (matches `ORDER BY cos6 DESC, cid` in SQL).
    */
  def simStructs(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column
  ): Column = array(cents.map { case (cid, cv) =>
    struct(
      (-round(graft.functions.CosineSimilarity.cosineSim(spark, vcol, typedlit(cv)), 6)).as("negs"),
      lit(cid).as("cid"))
  }: _*)

  /** Nearest-centroid cell id for `vcol` — pure map-side codegen, as ONE
    * fused expression over the baked centroid matrix
    * ([[graft.functions.IvfNearestCell]]) rather than K composed cosine
    * trees: same bit-exact result as
    * `array_min(simStructs(...)).getField("cid")`, but each consuming plan
    * carries a single expression node, so Lloyd-iteration plans
    * analyze + codegen in O(1) instead of O(K·dim).
    */
  def assignCell(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column
  ): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cids = cents.map(_._1).toArray
    val mat = cents.map(_._2.toArray).toArray
    // same left-to-right fold as CosineSimilarity's |b|² accumulation →
    // identical IEEE double
    val cnorms = mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    // Build the Column DIRECTLY from the expression — a session-global temp
    // function would bind whichever centroids were registered LAST at
    // analysis time, silently mis-assigning any deferred or concurrent use
    // in the same session.
    GraftColumnBridge.column(graft.functions.IvfNearestCell(
      Cast(GraftColumnBridge.expression(vcol), ArrayType(DoubleType)),
      cids, mat, cnorms))
  }

  /** Run `iters` Lloyd iterations over `e` (columns `vec_id: Long`,
    * `v: Array[Double]`) starting from `seeds`. Cell ids stay the seed ids
    * (stable tiebreak ordering across iterations). Cells keep at least their
    * seed vector assigned (cos(seed, seed) = 1 is the strict max), so no
    * empty-cell repair is needed when seeds are drawn from the data.
    */
  def train(
      spark: SparkSession,
      e: DataFrame,
      seeds: Seq[(Long, Seq[Double])],
      iters: Int
  ): Seq[(Long, Seq[Double])] = {
    import spark.implicits._
    var cents = seeds
    for (_ <- 0 until iters) {
      cents = meanUpdate(spark,
        e.withColumn("cell", assignCell(spark, cents, $"v")))
    }
    cents
  }

  /** One Lloyd mean update over an assigned frame (`cell`, `v`): exact
    * decimal(38,12) per-dimension sums (order-independent) divided as
    * doubles, rounded to 6 dp, collected as the new centroid Seq. The
    * per-(cell, dim) means are collected FLAT and the K centroid arrays
    * assemble on the driver (round 20): the former
    * coalesce(1) + groupBy(cell) + collect_list tail was a second shuffle
    * stage per iteration whose only job was array assembly — the collect
    * moves the SAME K×dim doubles either way, and i is unique per cell, so
    * sorting by dimension here is value-identical to the old
    * array_sort(collect_list(struct(i, mx))).
    */
  private def meanUpdate(
      spark: SparkSession, assigned: DataFrame
  ): Seq[(Long, Seq[Double])] = {
    import spark.implicits._
    assigned
      .select($"cell", posexplode($"v").as(Seq("i", "x")))
      .groupBy($"cell", $"i")
      .agg(round(sum($"x".cast("decimal(38,12)")).cast("double") / count(lit(1)), 6).as("mx"))
      .collect()
      .groupBy(_.getLong(0)).view
      .map { case (cell, rs) =>
        (cell, rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq) }
      .toSeq
      .sortBy(_._1)
  }

  /** Production probe-width policy, prescribed by the measured recall-vs-
    * cost curve (BENCH_SCALING round 13): recall is governed by the probed
    * FRACTION nprobe/K, so a constant nprobe collapses as the quantizer
    * grows — measured 53.8% contamination-flag agreement at nprobe=2 with
    * K=323 cells (0.6% probed), the count-driven seed policy's worst case.
    * Probing a fixed eighth of the cells (floor 2) holds the fraction — and
    * therefore recall — flat across scales. Measured at the forced scales
    * (BENCH_SCALING round 14, isotropic worst-case corpus): flag agreement
    * 94.0% at sf1 (K=81), 90.9% at sf4 (the old worst case, up from 53.8%),
    * 88.7% at sf16 (K=40) — at 0.30× the exact arm's cost where the tier's
    * past-broadcast regime actually holds (sf16) and cost parity at sf4.
    * Cost scales linearly with the fraction, so the eighth is the knee the
    * curve recommends — callers with a different recall budget pass their
    * own policy.
    */
  def adaptiveNprobe(k: Int): Int = math.max(2, (k + 7) / 8)

  /** [[probeCells]] with the probe width derived from the quantizer size by
    * `policy` (e.g. [[adaptiveNprobe]]) instead of a pinned constant.
    */
  def probeCells(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column,
      policy: Int => Int
  ): Column = probeCells(spark, cents, vcol, policy(cents.size))

  /** Policy twin of [[probeCellsBc]] — same contract as the policy
    * [[probeCells]] overload. */
  def probeCellsBc(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column,
      policy: Int => Int
  ): Column = probeCellsBc(spark, cents, vcol, policy(cents.size))

  /** Top-`nprobe` probe cells for `vcol` — the fused, compiled twin of
    * `transform(slice(array_sort(simStructs(...)), 1, nprobe), p -> p.cid)`
    * ([[graft.functions.IvfNearestCells]]): one expression node instead of
    * K cosine trees + a per-row struct sort, bit-identical ordering
    * (round-6 HALF_UP, lowest-cid ties, NaN cells last by cid). This is
    * the CORPUS-side probe of the IVF decontamination tier, where every
    * corpus vector runs it.
    */
  def probeCells(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column,
      nprobe: Int
  ): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val (cids, mat, cnorms) = centArrays(cents)
    GraftColumnBridge.column(graft.functions.IvfNearestCells(
      Cast(GraftColumnBridge.expression(vcol), ArrayType(DoubleType)),
      cids, mat, cnorms, nprobe))
  }

  /** Broadcast-variable twin of [[probeCells]] for quantizers past the
    * plan-literal cap (same static kernel — bit-parity by construction).
    */
  def probeCellsBc(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column,
      nprobe: Int
  ): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val bc = spark.sparkContext.broadcast(centArrays(cents))
    GraftColumnBridge.column(graft.functions.IvfNearestCellsBc(
      Cast(GraftColumnBridge.expression(vcol), ArrayType(DoubleType)), bc, nprobe))
  }

  /** (cids, matrix, norms) triple from a centroid Seq — the norm fold is
    * CosineSimilarity's left-to-right |b|² accumulation (identical IEEE
    * double, the kernels' bit-parity contract). */
  private def centArrays(
      cents: Seq[(Long, Seq[Double])]
  ): (Array[Long], Array[Array[Double]], Array[Double]) = {
    val cids = cents.map(_._1).toArray
    val mat = cents.map(_._2.toArray).toArray
    val cnorms = mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    (cids, mat, cnorms)
  }

  /** Broadcast-variable twin of [[assignCell]] for centroid counts past the
    * plan-literal cap: the SAME static [[graft.functions.IvfNearestCell]]
    * kernel — bit-parity with the literal path by construction — with the
    * (cids, matrix, norms) triple riding a TorrentBroadcast instead of the
    * plan, so every assignment is pure map-side codegen with ONE small
    * expression node regardless of K. This replaces the former broadcast-
    * JOIN mechanism (crossJoin + packed-long argmin HashAggregate + vector
    * re-attach join — three exchanges per assignment; the packed-argmin
    * HashAggregate story lives on in [[assignSubCells]], where a keyed join
    * IS still the right shape). Scale ceiling: K × dim doubles must fit
    * executor memory — ~0.5 GB at K = 10⁶, dim 64 — the same bound the
    * join's broadcast build side had; the SemDeDup n/256 policy crosses it
    * near 5×10⁸ vectors, where [[trainAssignHierarchical]] takes over.
    */
  def assignCellBc(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column
  ): Column = assignCellBcHandle(spark, cents, vcol)._1

  private def assignCellBcHandle(
      spark: SparkSession,
      cents: Seq[(Long, Seq[Double])],
      vcol: Column
  ): (Column, org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Array[Double]], Array[Double])]) = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cids = cents.map(_._1).toArray
    val mat = cents.map(_._2.toArray).toArray
    // same left-to-right fold as CosineSimilarity's |b|² accumulation →
    // identical IEEE double (the bit-parity contract of the kernel)
    val cnorms = mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((cids, mat, cnorms))
    (GraftColumnBridge.column(graft.functions.IvfNearestCellBc(
      Cast(GraftColumnBridge.expression(vcol), ArrayType(DoubleType)), bc)), bc)
  }

  /** Broadcast-tier twin of [[train]]: identical Lloyd discipline (same
    * [[meanUpdate]], same kernel assignment — bit-parity with [[train]] on
    * the same seeds is BY CONSTRUCTION, both paths run the same static
    * kernel), with each iteration's centroid triple broadcast as a
    * variable and destroyed once the iteration's eager mean collect has
    * consumed it, so peak executor footprint stays one centroid table.
    */
  def trainBc(
      spark: SparkSession,
      e: DataFrame,
      seeds: Seq[(Long, Seq[Double])],
      iters: Int
  ): Seq[(Long, Seq[Double])] = {
    import spark.implicits._
    var cents = seeds
    for (_ <- 0 until iters) {
      val (cellCol, bc) = assignCellBcHandle(spark, cents, $"v")
      cents = meanUpdate(spark, e.withColumn("cell", cellCol))
      bc.destroy() // consumed by meanUpdate's collect; next iter re-broadcasts
    }
    cents
  }

  /** Largest cid in a centroid table — one tiny aggregate job. The
    * hierarchical sub-cell loop hoists this: cell ids are the seed ids and
    * never change across iterations, so the bound is computed ONCE per
    * train/assign sequence instead of once per call.
    */
  private def maxCidOf(cents: DataFrame): Long = {
    import cents.sparkSession.implicits._
    cents.agg(max($"cid")).head.getLong(0)
  }

  /** Within-coarse-cell assignment for the hierarchical quantizer: `ev`
    * carries `(vec_id, v, ccell)`, `subCents` carries `(ccell, cid, cv)` —
    * the join is an EQUI join on the coarse cell, so each vector meets only
    * its own cell's sub-centroids (per-vector comparisons = the cell's
    * sub-centroid count, ~√K under the n/256 policy, never K). Neither side
    * needs to broadcast: both partition by `ccell`, which is what makes this
    * the path PAST [[assignCellBc]]'s executor-memory ceiling.
    *
    * The argmin packs its ordering into ONE long: the natural
    * `min(struct(-cos6, cid))` has a struct agg buffer, which HashAggregate
    * cannot hold — the planner falls back to SortAggregate and SORTS the
    * pair stream (measured: 76 GB of spill at n=312k, K=1219). cos6 is
    * exactly a 6-dp decimal, so `round(-cos6·10⁶)` quantizes it EXACTLY
    * (distinct cos6 ⇒ distinct longs, equal ⇒ equal), and
    * `key = negs·2⁴¹ + cid` is lexicographic (negs, cid) for
    * 0 ≤ cid < 2⁴¹ — `min(long)` partial-aggregates map-side and the pair
    * stream is consumed in-stage. NaN cosines (zero-norm vectors) map to
    * negs = 2·10⁶, strictly worse than any real cosine, so an all-NaN row
    * degenerates to the lowest cid, exactly like the kernel. (Sole
    * theoretical gap vs the kernel: the packing quantizes ±0.0 cosines to
    * the same key where `Double.compare` orders -0.0 < 0.0 — reachable
    * only when a best cosine rounds to exactly ±0.0 AND ties another
    * centroid across the zero sign, which float data never exercises; the
    * q_semdedup_hier oracle replay would catch it.)
    * `cid`s are globally unique (seed vec_ids), so the per-vec_id min key
    * alone identifies the sub-cell.
    */
  def assignSubCells(spark: SparkSession, ev: DataFrame, subCents: DataFrame): DataFrame =
    assignSubCells(spark, ev, subCents, maxCidOf(subCents))

  private def assignSubCells(
      spark: SparkSession, ev: DataFrame, subCents: DataFrame, maxCid: Long): DataFrame = {
    import spark.implicits._
    require(maxCid >= 0 && maxCid < (1L << 41),
      s"assignSubCells packs cid into 41 bits (max cid $maxCid out of range)")
    val cos6 = round(graft.functions.CosineSimilarity.cosineSim(spark, $"v", $"cv"), 6)
    val negs = when(isnan(cos6), lit(2000000L))
      .otherwise(round(-cos6 * 1e6).cast("long"))
    val cells = ev.select($"vec_id", $"v", $"ccell")
      .join(subCents, Seq("ccell"))
      .groupBy($"vec_id")
      .agg(min(negs * (1L << 41) + $"cid").as("k"))
      .select($"vec_id", pmod($"k", lit(1L << 41)).as("cid"))
    ev.join(cells, Seq("vec_id"))
      .select($"vec_id", $"v", $"ccell", $"cid")
  }

  /** Hierarchical coarse quantizer for K past [[assignCellBc]]'s
    * executor-memory ceiling: stage 1 trains `coarseK` cells through the
    * broadcast-variable kernel path and assigns every vector once (pure
    * map-side); stage 2 trains per-coarse-cell sub-centroids
    * (count-adaptive: ⌈n_c/256⌉ per cell, seeds = the cell's lowest-vec_id
    * vectors) with the SAME pinned Lloyd discipline (fixed iterations,
    * cos6 + lowest-cid assignment, exact decimal(38,12) means rounded to
    * 6 dp), assignment via [[assignSubCells]]'s ccell equi-join.
    * Returns `(vec_id, v, ccell, cid)`; `cid` (a globally-unique seed
    * vec_id) IS the final cell id.
    *
    * Scale shape: stage 1's broadcast is coarseK ≈ √K vectors (fits the
    * executor ceiling up to K ≈ 4×10¹²); stage 2 shuffles vectors by
    * `ccell` once per iteration and the sub-centroid table is an ordinary
    * shuffled join side — nothing is ever broadcast-bounded by total K. The
    * sub-seed selection pays one window over the ccell partitioning it
    * already has. Empty sub-cells cannot occur: every seed is a cell member
    * and cos(seed, seed) = 1 is the strict per-vector max.
    */
  def trainAssignHierarchical(
      spark: SparkSession, e: DataFrame, coarseK: Int, iters: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cSeeds: Seq[(Long, Seq[Double])] =
      e.filter($"vec_id" % 97 === 0).orderBy($"vec_id").limit(coarseK)
        .select($"vec_id", $"v")
        // bounded: coarseK ≈ √K rows through the driver — the same rows
        // any broadcast build would ship through it
        .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cCents = trainBc(spark, e, cSeeds, iters)
    val ev = e
      .withColumn("ccell", assignCellBc(spark, cCents, $"v"))
      // one materialization: coarse assignment feeds every sub-iteration
      .localCheckpoint()
    val byCell = Window.partitionBy($"ccell")
    var sc = ev
      .withColumn("rn", row_number().over(byCell.orderBy($"vec_id")))
      .withColumn("n_c", count(lit(1)).over(byCell))
      .filter($"rn" <= ceil($"n_c" / lit(256.0)))
      .select($"ccell", $"vec_id".as("cid"), $"v".as("cv"))
      .localCheckpoint()
    // sub-cell ids are the sub-SEED vec_ids and every seed keeps its cell
    // non-empty, so this bound too is iteration-invariant
    val scMax = maxCidOf(sc)
    for (_ <- 0 until iters) {
      sc = assignSubCells(spark, ev, sc, scMax)
        .select($"ccell", $"cid", posexplode($"v").as(Seq("i", "x")))
        .groupBy($"ccell", $"cid", $"i")
        .agg(round(sum($"x".cast("decimal(38,12)")).cast("double") / count(lit(1)), 6).as("mx"))
        .groupBy($"ccell", $"cid")
        .agg(expr("transform(array_sort(collect_list(struct(i, mx))), s -> s.mx)").as("cv"))
        .localCheckpoint()
    }
    assignSubCells(spark, ev, sc, scMax)
  }
}
