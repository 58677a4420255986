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
}
