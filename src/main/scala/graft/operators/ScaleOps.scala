package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the join shapes that keep 100 TB runs healthy when
  * AQE alone isn't enough.
  */
object ScaleOps {

  /** Skew-safe equi-join that salts ONLY the hot keys. A frequency pre-pass
    * over the large side (map-side partial count — shuffles one row per
    * distinct key, not per input row) finds keys with ≥ `hotKeyThreshold`
    * rows; that set is small by construction (≤ |large| / threshold) and is
    * broadcast. Hot large-side rows scatter across `saltFactor` salts (a
    * deterministic whole-row hash, so reruns partition identically); cold
    * rows keep salt 0. The small side replicates `saltFactor`× for hot keys
    * only and 1× for cold keys, so cold keys pay nothing — blanket salting
    * multiplies the whole small-side shuffle by `saltFactor` for no benefit
    * on unskewed keys (measured 8× wall-clock on unskewed sf0.1 lineitem).
    * One shuffle join on (key, salt); no union of separate hot/cold plans.
    *
    * At 100 TB the exact pre-pass costs one column-pruned pass over the
    * large side; swap in `large.sample(fraction, seed)` with a scaled
    * threshold when even that pass is too dear.
    *
    * Two probe modes:
    *  - `eagerProbe = true` (default): the pre-pass runs ONCE at
    *    construction and the hot set is collected (≤ |scanned| / threshold
    *    keys BY CONSTRUCTION — the same small-set bound that justified
    *    broadcasting it) and baked into the plan as a codegen'd `InSet`
    *    predicate; with no hot keys the result IS the plain join, so
    *    healthy data pays only the (sampled) pre-pass job and none of the
    *    salt machinery — measured ~4× cheaper than probing every row
    *    through a broadcast-null check + explode on unskewed sf0.1
    *    lineitem. Should the bound still yield an implausibly large set
    *    (beyond `MaxCollectedHotKeys`), the probes degrade to the deferred
    *    broadcast-join form instead of collecting.
    *  - `eagerProbe = false`: the pre-pass is PART OF the returned plan —
    *    the hot table feeds both sides through broadcast left-joins, so
    *    construction runs no job at all (explain dumps and plan tests are
    *    free, and the whole join is ONE execution with no driver sync
    *    point). The mode for plan-only consumers or when a construction-
    *    time job is unacceptable.
    *
    * Result is row-identical to `large.join(small, key)` in BOTH modes and
    * under BOTH degraded paths (overflow fallback, sample-missed hot key) —
    * the hot set only picks which keys scatter, never which rows match.
    * Verified by spec, including property tests of the degraded paths.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      hotKeyThreshold: Long = 100000L,
      sampleFraction: Double = 1.0,
      eagerProbe: Boolean = true,
      maxCollectedHotKeys: Int = MaxCollectedHotKeys
  ): DataFrame = {
    require(saltFactor > 0 && hotKeyThreshold > 0)
    require(sampleFraction > 0.0 && sampleFraction <= 1.0)
    require(maxCollectedHotKeys > 0)
    // sampleFraction < 1 swaps the exact frequency pre-pass for a seeded
    // sample with a proportionally scaled threshold: hot-key DETECTION gets
    // 1/fraction cheaper while join correctness is unaffected (the hot set
    // only picks which keys scatter — any set yields identical rows).
    val (src, thr) =
      if (sampleFraction < 1.0)
        (large.sample(withReplacement = false, sampleFraction, seed = 42L),
          math.max(1L, math.ceil(hotKeyThreshold * sampleFraction).toLong))
      else (large, hotKeyThreshold)
    val hotDf = src.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= thr)
      .select(col(key))
    if (!eagerProbe)
      return saltedViaJoin(large, small, key, saltFactor,
        hotDf.withColumn("__hot", lit(true)))
    // ONE execution of the pre-pass decides all three outcomes: the
    // limit(max+1) caps what can reach the driver while still detecting
    // overflow by length.
    val probe = hotDf.limit(maxCollectedHotKeys + 1).collect()
    // No hot keys (the common case on healthy data): skip the salt machinery
    // entirely — the plain join is strictly cheaper than salting with an
    // empty hot set (which still costs a per-row probe, a hash and an
    // explode).
    if (probe.isEmpty) return large.join(small, Seq(key))
    if (probe.length > maxCollectedHotKeys) {
      // Pathological hot-set size: probe via broadcast joins against the
      // distributed hot table (marker column) instead of collecting.
      return saltedViaJoin(large, small, key, saltFactor,
        hotDf.withColumn("__hot", lit(true)))
    }
    // Bake the hot set into the plan: both probes become map-side
    // codegen'd InSet lookups; the executed plan re-scans nothing.
    val isHot = col(key).isInCollection(probe.map(_.get(0)).toSeq)
    val salted = large.withColumn("__salt",
      when(isHot,
        pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
        .otherwise(lit(0)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0),
        when(isHot, lit(saltFactor - 1)).otherwise(lit(0)))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Default hot-set cap, beyond which the probe falls back to the
    * distributed form: 2^20 keys ≈ 8–24 MB collected — comfortably a
    * broadcast-sized object, and reachable only when |scanned| ≥
    * threshold · 2^20. Overridable per-call to budget driver memory (and to
    * exercise the fallback at test scale).
    */
  val MaxCollectedHotKeys: Int = 1 << 20

  /** Deferred probe: left-join the hot-marker table into both sides
    * (broadcast-gated by AQE statistics). The two probes compile to one
    * reused broadcast exchange, so the pre-pass executes exactly once —
    * inside the join's own execution.
    */
  private def saltedViaJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      hot: DataFrame
  ): DataFrame = {
    val salted = large
      .join(broadcast(hot), Seq(key), "left_outer")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
          .otherwise(lit(0)))
      .drop("__hot")
    val replicated = small
      .join(broadcast(hot), Seq(key), "left_outer")
      .withColumn("__salt",
        explode(sequence(lit(0),
          when(col("__hot"), lit(saltFactor - 1)).otherwise(lit(0)))))
      .drop("__hot")
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Distributed global ranking — the scale-correct replacement for an
    * unpartitioned `row_number()` window (which moves EVERY row to one
    * partition): range-repartition on the sort key so each partition owns a
    * contiguous key range, rank locally with a partition-local window, and
    * add broadcast per-partition offsets. Both shuffles are distributed;
    * the only driver traffic is one count per partition. `order` must be a
    * total (tie-free) order for the rank to be deterministic.
    *
    * The ranged data is materialized ONCE (eager localCheckpoint) and both
    * the offset pre-pass and the returned plan read those blocks — range
    * boundary sampling is NOT stable across separate executions (measured:
    * re-executing the shuffle moved a boundary by ~60 rows and corrupted
    * ranks), so consistency must come from materialization, not
    * determinism. Callers should drop the blocks when done (the bench and
    * verify harnesses evict persistent RDDs between queries).
    */
  def withGlobalRank(
      df: DataFrame,
      rankCol: String,
      order: org.apache.spark.sql.Column*
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // explicit partition count: a user-specified repartition is exempt from
    // AQE coalescing, so the pre-pass and the final execution cannot end up
    // with different partition ids
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
    val withPid = ranged.withColumn("__pid", spark_partition_id()).localCheckpoint()
    val counts = withPid.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offEntries = counts.map(_._1).zip(offsets)
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    withPid
      .withColumn(rankCol,
        row_number().over(w).cast("long") +
          element_at(map(offEntries.toIndexedSeq: _*), col("__pid")))
      .drop("__pid")
  }

  /** Standard SQL NTILE bucket from an exact global rank: the first
    * n % k buckets carry ceil(n/k) rows, the rest floor(n/k) — identical
    * semantics to `ntile(k)` over a global window, in exact integer math.
    * Combined with [[withGlobalRank]] this is the distributed form of a
    * global ntile (no single-partition window at any size). Always returns
    * a LONG column regardless of branch.
    */
  def ntileFromRank(rank: org.apache.spark.sql.Column, n: Long, k: Long)
      : org.apache.spark.sql.Column = {
    require(n >= 0 && k > 0)
    val small = n / k; val big = n % k; val cut = big * (small + 1)
    if (small == 0) rank.cast("long") // n < k: one row per leading bucket
    else when(rank <= cut, exactDiv(rank + small, small + 1))
      .otherwise(lit(big) + exactDiv(rank - cut + small - 1, small))
  }

  /** Exact long integer division x div d for 0 ≤ x < 2^53: subtracting
    * `pmod` makes the numerator exactly divisible, so the IEEE quotient IS
    * the true integer (an exactly-representable double) — no truncation
    * hazard at any rank a LongType can realistically hold. Column `/` alone
    * is Divide (double) and would drift near 2^52.
    */
  private def exactDiv(x: org.apache.spark.sql.Column, d: Long)
      : org.apache.spark.sql.Column =
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")

  /** Persist a DataFrame as a bucketed+sorted table: equal-bucketed tables
    * joined on the bucket key need no Exchange at all — the join is
    * co-located by layout, the 100 TB answer to repeated fact⋈fact joins on
    * the same key.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int,
      path: Option[String] = None
  ): Unit = {
    // Overwrite alone leaves a stale catalog entry pointing at the old
    // layout when an external path is supplied — drop first for idempotency.
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $tableName")
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }
}
