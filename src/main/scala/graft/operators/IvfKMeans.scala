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
      cents = e
        .withColumn("cell", assignCell(spark, cents, $"v"))
        .select($"cell", posexplode($"v").as(Seq("i", "x")))
        .groupBy($"cell", $"i")
        .agg(round(sum($"x".cast("decimal(38,12)")).cast("double") / count(lit(1)), 6).as("mx"))
        // ≤ K×dim rows remain — collapse to one task instead of paying a
        // full shuffle-partition fan-out for the second tiny groupBy
        .coalesce(1)
        .groupBy($"cell")
        .agg(expr("transform(array_sort(collect_list(struct(i, mx))), s -> s.mx)").as("cv"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1)
    }
    cents
  }

  /** Join twin of [[assignCell]] for centroid counts past the plan-literal
    * cap: `cents` is a DataFrame `(cid: Long, cv: Array[Double])` instead of
    * a collected Seq, and assignment is a broadcast nested-loop join —
    * every vector meets every centroid map-side (no shuffle of `e`), with
    * the argmax folded into a partial-aggregating `min(struct(-cos6, cid))`
    * per vector, so the n×K pair stream is consumed in-stage and never
    * materialized. The plan carries ONE `cosine_sim` node regardless of K
    * (the property [[graft.functions.IvfNearestCell]] buys the literal
    * path).
    *
    * Bit-parity with the literal path: `cosine_sim` accumulates dot/|v|²/|c|²
    * left-to-right in doubles exactly like `IvfNearestCell`'s kernel (which
    * precomputes |c| with the same fold), `round(_, 6)` is the same
    * BigDecimal HALF_UP, and the packed-long argmax (see the body) is the
    * same (-cos6, lowest-cid) tiebreak with NaN ordered greatest — an
    * all-NaN row degenerates to the lowest cid in both forms. (Sole
    * theoretical gap: the packing quantizes ±0.0 cosines to the same key
    * where the kernel's `Double.compare` orders -0.0 < 0.0 — reachable only
    * when a best cosine rounds to exactly ±0.0 AND ties another centroid
    * across the zero sign, which float data never exercises; the
    * q_semdedup/q_semdedup_table parity spec would catch it.)
    *
    * Scale ceiling: the centroid table is BROADCAST, so K is bounded by
    * executor memory (~520 B/centroid at dim 64 → K = 10⁶ is ~0.5 GB).
    * With the SemDeDup K = ⌈n/256⌉ policy that covers corpora to ~5×10⁸
    * vectors; past that the production shape is hierarchical — assign to
    * √K coarse cells via the literal path, then per-coarse-cell sub-tables.
    */
  def assignCellsJoin(spark: SparkSession, e: DataFrame, cents: DataFrame): DataFrame =
    assignCellsJoin(spark, e, cents, maxCidOf(cents))

  /** Largest cid in a centroid table — one tiny aggregate job. Lloyd loops
    * hoist this: cell ids are the seed ids and never change across
    * iterations, so the bound is computed ONCE per train/assign sequence
    * instead of once per call (each probe is a full, if small, Spark job).
    */
  private def maxCidOf(cents: DataFrame): Long = {
    import cents.sparkSession.implicits._
    cents.agg(max($"cid")).head.getLong(0)
  }

  private def assignCellsJoin(
      spark: SparkSession, e: DataFrame, cents: DataFrame, maxCid: Long): DataFrame = {
    import spark.implicits._
    // The natural argmax — min(struct(-cos6, cid)) — has a struct agg
    // buffer, which HashAggregate can't hold: the planner falls back to
    // SortAggregate and SORTS the n×K pair stream (measured: 76 GB of
    // spill at n=312k, K=1219). Instead pack the ordering into ONE long:
    // cos6 is exactly a 6-dp decimal, so round(-cos6·10⁶) quantizes it
    // EXACTLY (distinct cos6 ⇒ distinct longs, equal ⇒ equal), and
    // key = negs·2⁴¹ + cid is lexicographic (negs, cid) for 0 ≤ cid < 2⁴¹.
    // min(long) partial-aggregates map-side — the pair stream is consumed
    // in-stage, nothing is sorted or materialized. NaN cosines (zero-norm
    // vectors) map to negs = 2·10⁶ — strictly worse than any real cosine,
    // so an all-NaN row degenerates to the lowest cid, as in the kernel.
    require(maxCid >= 0 && maxCid < (1L << 41),
      s"assignCellsJoin packs cid into 41 bits (max cid $maxCid out of range)")
    val cos6 = round(graft.functions.CosineSimilarity.cosineSim(spark, $"v", $"cv"), 6)
    val negs = when(isnan(cos6), lit(2000000L))
      .otherwise(round(-cos6 * 1e6).cast("long"))
    val cells = e.crossJoin(broadcast(cents))
      .groupBy($"vec_id")
      .agg(min(negs * (1L << 41) + $"cid").as("k"))
      .select($"vec_id", pmod($"k", lit(1L << 41)).as("cell"))
    // re-attach the vector payload by the skinny (vec_id, cell) frame —
    // AQE broadcasts it while it fits (16 B/row), shuffle-joins beyond
    e.join(cells, Seq("vec_id"))
      .select($"vec_id", $"v", $"cell")
  }

  /** Within-coarse-cell assignment for the hierarchical quantizer: `ev`
    * carries `(vec_id, v, ccell)`, `subCents` carries `(ccell, cid, cv)` —
    * the join is an EQUI join on the coarse cell, so each vector meets only
    * its own cell's sub-centroids (per-vector comparisons = the cell's
    * sub-centroid count, ~√K under the n/256 policy, never K). Neither side
    * needs to broadcast: both partition by `ccell`, which is what makes this
    * the path PAST the [[assignCellsJoin]] broadcast ceiling. The argmin is
    * the same packed-long `min()` (see [[assignCellsJoin]] for the packing
    * proof), so the pair stream is consumed in-stage by a HashAggregate.
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

  /** Hierarchical coarse quantizer for K past [[assignCellsJoin]]'s
    * broadcast ceiling: stage 1 trains `coarseK` cells through the table
    * path and assigns every vector once; stage 2 trains per-coarse-cell
    * sub-centroids (count-adaptive: ⌈n_c/256⌉ per cell, seeds = the cell's
    * lowest-vec_id vectors) with the SAME pinned Lloyd discipline (fixed
    * iterations, cos6 + lowest-cid assignment, exact decimal(38,12) means
    * rounded to 6 dp), assignment via [[assignSubCells]]'s ccell equi-join.
    * Returns `(vec_id, v, ccell, cid)`; `cid` (a globally-unique seed
    * vec_id) IS the final cell id.
    *
    * Scale shape: stage 1 is the proven table path (coarseK ≈ √K fits the
    * broadcast ceiling up to K ≈ 4×10¹²); stage 2 shuffles vectors by
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
    val cSeeds = e.filter($"vec_id" % 97 === 0).orderBy($"vec_id").limit(coarseK)
      .select($"vec_id".as("cid"), $"v".as("cv"))
    val cCents = trainTable(spark, e, cSeeds, iters)
    // cell ids are the (invariant) seed ids — probe the bound once here
    // and reuse it across the final coarse assign and every sub-iteration
    val cMax = maxCidOf(cCents)
    val ev = assignCellsJoin(spark, e, cCents, cMax)
      .withColumnRenamed("cell", "ccell")
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

  /** Table twin of [[train]]: Lloyd refinement with the centroids held as a
    * DataFrame end-to-end — assignment via [[assignCellsJoin]], mean update
    * identical to [[train]]'s (exact decimal(38,12) sums, order-independent,
    * rounded to 6 dp), but never collected to the driver, so K is bounded by
    * the broadcast ceiling instead of the plan-literal cap. Each iteration
    * is localCheckpoint'd: K×dim rows materialize once and the lineage
    * (which otherwise doubles per iteration) is truncated.
    *
    * Bit-parity with [[train]]: when both run on the same seeds, every
    * iteration's assignment matches (see [[assignCellsJoin]]) and the
    * decimal-sum mean is order-independent, so the trained centroid SETS are
    * identical — `q_semdedup_table`'s oracle is byte-for-byte `q_semdedup`'s.
    */
  def trainTable(spark: SparkSession, e: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    import spark.implicits._
    var cents = seeds.select($"cid", $"cv").localCheckpoint()
    // cell ids are the (invariant) seed ids — one bound probe for all iters
    val maxCid = maxCidOf(cents)
    for (_ <- 0 until iters) {
      cents = assignCellsJoin(spark, e, cents, maxCid)
        .select($"cell", posexplode($"v").as(Seq("i", "x")))
        .groupBy($"cell", $"i")
        .agg(round(sum($"x".cast("decimal(38,12)")).cast("double") / count(lit(1)), 6).as("mx"))
        .groupBy($"cell")
        .agg(expr("transform(array_sort(collect_list(struct(i, mx))), s -> s.mx)").as("cv"))
        .select($"cell".as("cid"), $"cv")
        .localCheckpoint()
    }
    cents
  }
}
