package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end proof that SemDeDup runs PAST the 262k-vector plan-literal
  * cap (K = ⌈n/256⌉ > 1024) through the centroid-table broadcast-join
  * branch — the scale the operator was built for (Abbas et al. 2023 ran
  * 1.3B docs; rounds 8-9 fail-fasted here).
  *
  * Builds a composed embeddings corpus via the sanctioned two-pass ScaleUp
  * pattern (sf0.1 × 26 → ×6 with a pass-distinct mask seed ⇒ 312k vectors,
  * within-shard cosine structure exactly preserved, cross-shard
  * decorrelated), then runs the REAL `q_semdedup` entry — which must take
  * the K > 1024 table branch — and checks the structural invariants the
  * oracle certifies at gated scales: every vector lands in exactly one
  * cell (Σ n_vecs = n), dropped ≤ pairs per cell, and the planted
  * within-shard near-dup mass is found (dup pairs ≥ the sf0.1 corpus's
  * pair count × 156 shards would over-ask since cells re-mix; we assert
  * pairs > 0 and report the count for BENCH_SCALING.md).
  *
  * Usage: `sbt "runMain graft.tools.SemDedupScaleProof [src] [dir] [key]"`
  * (writes the composed corpus under .localdata/semdedup_xl once; requires
  * the sf0.1 driver corpus). `key` defaults to q_semdedup (the auto policy
  * takes the table branch at 312k); pass q_semdedup_hier to force the
  * two-level quantizer through the same corpus — the K1=35-coarse /
  * ~35-sub-centroids-per-cell shape the K > 2e6 production path uses.
  */
object SemDedupScaleProof {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dir = args.lift(1).getOrElse("/root/repo/.localdata/semdedup_xl")
    val key = args.lift(2).getOrElse("q_semdedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-semdedup-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = java.nio.file.Paths.get(dir, "embeddings.parquet")
    if (!java.nio.file.Files.exists(table)) {
      java.nio.file.Files.createDirectories(table.getParent)
      val base = spark.read.parquet(s"$src/embeddings.parquet")
      val pass1 = ScaleUp.scaleTable(spark, base, "embeddings", 26)
      // second pass: stride must clear pass1's id span (26 shards), and the
      // mask seed must be pass-distinct (see ScaleUp's embeddings scaladoc)
      val pass2 = ScaleUp.scaleTable(spark, pass1, "embeddings", 6,
        maskSeed = 10, stride = 26L * ScaleUp.ShardOffset)
      pass2.repartition(32).write.mode("overwrite").parquet(table.toString)
      println(s"[semdedup-xl] composed corpus written: $table")
    }

    val n = spark.read.parquet(table.toString).count()
    val k = math.ceil(n / 256.0).toLong
    require(k > 1024L, s"corpus too small to prove the table branch (n=$n, K=$k)")
    println(s"[semdedup-xl] n=$n K=$k (plan-literal cap is 1024 -> table branch)")

    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries(key)(spark, dir)
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val cells = out.length.toLong
    val sumVecs = out.map(_.getLong(1)).sum
    val dupPairs = out.map(_.getLong(2)).sum
    val dropped = out.map(_.getLong(3)).sum
    require(sumVecs == n, s"partition invariant broken: sum(n_vecs)=$sumVecs != n=$n")
    require(out.forall(r => r.getLong(3) <= r.getLong(2)),
      "per-cell n_dropped must be <= n_dup_pairs")
    require(dupPairs > 0, "planted near-dup mass not found")
    println(f"[semdedup-xl] key=$key cells=$cells sum_vecs=$sumVecs dup_pairs=$dupPairs dropped=$dropped")
    println(f"""{"metric":"semdedup_xl_sec","key":"$key","value":$sec%.2f,"unit":"sec","n":$n,"k":$k,"cells":$cells,"dup_pairs":$dupPairs}""")
    spark.stop()
  }
}
