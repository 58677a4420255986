package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The multi-word LSH path at its NATIVE scale (round-19 VERDICT #6): the
  * adaptive band policy in `embeddingDupPairs` only selects 24-bit bands
  * past n = 2^24 vectors, and the committed corpora top out at sf16
  * (320k) — so through round 19 the w24/w32 branch was exercised only via
  * pinned-width keys at small n, and the occupancy bound the policy
  * promises (expected bucket occupancy ≤ ~256) was DERIVED, not measured.
  *
  * This tool stages a >2^24-vector corpus with the sf-corpus's own
  * within-shard similarity structure — the ScaleUp embeddings transform
  * (per-shard deterministic sign flips: within-shard cosines exactly
  * preserved, cross-shard decorrelated to ~0) applied in one pass at
  * factor 840 over the sf1 embeddings (840 × 20k = 16.8M > 2^24) — then:
  *
  *   1. measures BOTH widths' banding occupancy on the full corpus:
  *      per-(band, bkey) counts → max / p99.9 / mean occupancy and the
  *      candidate-pair mass Σ c·(c−1)/2 the verify stage would pay. At
  *      n = 16.8M the 16-bit band's 2^16 buckets hold ~256 vectors EACH
  *      (the policy's switch-point arithmetic made measurable: candidate
  *      mass ~2×10^9 pairs), while the 24-bit bands hold ~1 — the
  *      occupancy curve the policy promises, measured on real volume;
  *   2. drives the ADAPTIVE `embeddingDupPairs` end-to-end on the staged
  *      corpus (no pinned width): the policy must CHOOSE w24 from the
  *      corpus count alone, and the full bucket-join + cosine-verify
  *      chain must complete at a wall-clock that the 16-bit branch's
  *      measured candidate mass shows it could not.
  *
  * Emits one JSON line per arm for BENCH_SCALING.md. The staged corpus
  * lands under `.localdata/` (gitignored) and is reused if present.
  *
  * Usage: `runMain graft.tools.LshVolumeArm [srcSf1Dir] [stageDir] [factor]`
  */
object LshVolumeArm {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/repo/.localdata/sf1")
    val stage = args.lift(1).getOrElse("/root/repo/.localdata/emb2e24")
    val factor = args.lift(2).map(_.toInt).getOrElse(840)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dst = s"$stage/embeddings.parquet"
    if (!new java.io.File(dst).exists()) {
      // ScaleUp's embeddings decorrelation, single pass, seed fixed to 7:
      // within-shard cosine structure (the dup pairs the operator hunts)
      // is preserved exactly; cross-shard cosines decorrelate to ~0. The
      // 10^9 stride clears sf1's composed id span (< 10^8).
      val base = spark.read.parquet(s"$src/embeddings.parquet")
      val t0 = System.nanoTime()
      base.crossJoin(broadcast(spark.range(factor.toLong).select($"id".as("__shard"))))
        .withColumn("vec_id", $"vec_id" + $"__shard" * 1000000000L)
        .withColumn("embedding",
          when($"__shard" === 0, $"embedding").otherwise(
            zip_with($"embedding",
              sequence(lit(0), size($"embedding") - 1),
              (x, i) => when(pmod(hash(i, $"__shard", lit(7)), lit(2)) === 0, x)
                .otherwise(-x))))
        .drop("__shard")
        .repartition(64)
        .write.mode("overwrite").parquet(dst)
      println(f"""{"arm":"stage","factor":$factor,"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    val n = spark.read.parquet(dst).count()
    require(n > 16777216L, s"corpus must exceed 2^24 to force the w24 branch (got $n)")
    println(s"""{"arm":"corpus","n_vectors":$n}""")

    // ---- occupancy + candidate mass per width, from ONE signature pass ----
    val sigs = spark.read.parquet(dst)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("sigw", graft.functions.LshFunctions.hyperplaneSigWords($"v", 4))
      .select($"vec_id", $"sigw")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def occupancy(label: String, bands: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val occ = bands.groupBy($"band", $"bkey").agg(count(lit(1)).as("c"))
        .agg(
          max($"c").as("max_occ"),
          expr("percentile_approx(c, 0.999)").as("p999_occ"),
          avg($"c").as("mean_occ"),
          count(lit(1)).as("n_buckets"),
          sum(expr("c * (c - 1) DIV 2")).as("cand_pairs"))
        .head()
      println(f"""{"arm":"$label%s","max_occ":${occ.getLong(0)},"p999_occ":${occ.get(1)},"mean_occ":${occ.getDouble(2)}%.2f,"n_buckets":${occ.getLong(3)},"cand_pairs":${occ.getLong(4)},"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    // 16-bit: the single-word branch's one 16-bit band (word 0 is
    // bit-identical to the legacy signature)
    occupancy("occ_w16", sigs.select($"vec_id",
      lit(0).as("band"), ($"sigw" (0)).as("bkey")))
    // 24-bit: the multi-word layout — 2 bands over disjoint 32-plane blocks
    occupancy("occ_w24", sigs.select($"vec_id",
      explode(expr(
        "transform(sequence(0, 1), b -> struct(b AS band, sigw[2*b] + (sigw[2*b+1] % 256) * 65536 AS bkey))")).as("bb"))
      .select($"vec_id", $"bb.band".as("band"), $"bb.bkey".as("bkey")))
    sigs.unpersist(blocking = true)

    // ---- the adaptive operator end-to-end: the policy must CHOOSE w24 ----
    val t0 = System.nanoTime()
    val pairs = graft.queries.PipelineQueries.embeddingDupPairs(spark, stage, bandBits = None)
    val nPairs = pairs.count()
    println(f"""{"arm":"adaptive_e2e","n_vectors":$n,"n_pairs":$nPairs,"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    spark.stop()
  }
}
