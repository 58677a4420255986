package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVF decontamination tier's recall-vs-cost curve — the round-12
  * verdict's measurement-completion item: the tier is FORCED at every sf
  * (`q_decontaminate_semantic_ivf`) and its sf16 crossover vs the exact arm
  * is published, but only the sf0.01 recall point was. This tool sweeps
  * nprobe ∈ {1, 2, 4} at each given scale and prints, per (sf, nprobe), the
  * integer recall audit (`q_decontaminate_semantic_recall`'s row: argmax@1
  * matches and contamination-flag agreement against the exact broadcast
  * arm) together with the IVF arm's wall-clock — the numbers that justify
  * the shipped nprobe=2 default as a measured point on the curve rather
  * than a guess.
  *
  * Timing discipline: the exact arm is computed ONCE per sf (it is the
  * shared truth for every nprobe; at sf16 it is also 5× the cost of any
  * IVF run) and localCheckpointed; each IVF arm is rows-forced and timed
  * alone; results ride the bench calibration probe ([[graft.Bench
  * .calibrateOnce]], median of 5) so figures are comparable across host
  * windows in the same unit as the official bench JSONs.
  *
  * Usage: sbt "runMain graft.tools.IvfRecallCurve [sfDir ...]"
  *   (default: .localdata/sf1 sf4 sf16; emits one JSON line per point and
  *   a final markdown table for BENCH_SCALING.md)
  */
object IvfRecallCurve {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/.localdata/sf1", "/root/repo/.localdata/sf4",
        "/root/repo/.localdata/sf16")
    // integer nprobe values, plus the token "adaptive" for the production
    // policy (nprobe = max(2, ⌈K/8⌉), IvfKMeans.adaptiveNprobe) — resolved
    // per sf against that corpus's trained K below
    val nprobes = sys.env.get("SPARK_GRAFT_NPROBES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq("1", "2", "4"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def force(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // warm JIT/codegen on the smallest corpus so sf1-point figures aren't
    // carrying compile cost (same discipline as Bench's warmup)
    force(graft.queries.PipelineQueries.semanticDecontamExact(spark, "/root/testdata/sf0.001"))
    force(graft.queries.PipelineQueries.semanticDecontamIvf(spark, "/root/testdata/sf0.001", 2))
    deepClean()
    graft.Bench.calibrateOnce(spark, "/root/testdata/sf0.001") // untimed codegen draw
    val calibSamples =
      Seq.fill(5)(graft.Bench.calibrateOnce(spark, "/root/testdata/sf0.001")).sorted
    val calib = calibSamples(calibSamples.length / 2)
    println(f"""{"calib_sec":$calib%.4f,"calib_min":${calibSamples.head}%.4f,"calib_max":${calibSamples.last}%.4f}""")

    val rows = for (d <- dirs) yield {
      val sf = d.split('/').last
      val tE0 = System.nanoTime()
      // temp parquet, not localCheckpoint: the per-nprobe deepClean()
      // unpersists every persistent RDD, which would destroy a checkpoint's
      // blocks irrecoverably (lineage is truncated)
      val exPath = s"/tmp/ivf_recall_exact_$sf"
      graft.queries.PipelineQueries.semanticDecontamExact(spark, d)
        .select($"vec_id", $"n_id".as("n_ex"), $"contam".as("c_ex"))
        .write.mode("overwrite").parquet(exPath)
      val exactSec = (System.nanoTime() - tE0) / 1e9
      val ex = spark.read.parquet(exPath)
      // resolve "adaptive" to this corpus's K-derived width (K = the seed
      // count of the count-driven policy — identical to cents.size since
      // Lloyd preserves cell ids), so the report carries the number probed
      val en = spark.read.parquet(s"$d/embeddings.parquet")
      val nNeedles = en.filter($"vec_id" % 31 === 0).count()
      val stride = if (nNeedles <= 4096L) 8L else 256L
      val k = en.filter($"vec_id" % (31L * stride) === 0).count().toInt
      val perNprobe = for (npTok <- nprobes) yield {
        val np = if (npTok == "adaptive")
          graft.operators.IvfKMeans.adaptiveNprobe(k) else npTok.toInt
        deepClean()
        val tI0 = System.nanoTime()
        val iv = graft.queries.PipelineQueries.semanticDecontamIvf(spark, d, np)
          .select($"vec_id", $"n_id".as("n_iv"), $"contam".as("c_iv"))
          .localCheckpoint()
        val ivfSec = (System.nanoTime() - tI0) / 1e9
        val r = ex.join(iv, Seq("vec_id"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when($"n_ex" === $"n_iv", 1L).otherwise(0L)).as("n_argmax_match"),
            sum(when($"c_ex", 1L).otherwise(0L)).as("n_contam_exact"),
            sum(when($"c_iv", 1L).otherwise(0L)).as("n_contam_ivf"),
            sum(when($"c_ex" === $"c_iv", 1L).otherwise(0L)).as("n_flag_agree"))
          .head()
        val (nv, nam, nce, nci, nfa) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        val pol = if (npTok == "adaptive") "adaptive" else "const"
        println(f"""{"sf":"$sf","nprobe":$np,"policy":"$pol","k":$k,"n_vecs":$nv,"n_argmax_match":$nam,"argmax_recall":${nam.toDouble / nv}%.4f,"n_contam_exact":$nce,"n_contam_ivf":$nci,"n_flag_agree":$nfa,"flag_agree":${nfa.toDouble / nv}%.4f,"ivf_sec":$ivfSec%.2f,"exact_sec":$exactSec%.2f}""")
        (s"$np ($pol)", nv, nam, nce, nci, nfa, ivfSec)
      }
      deepClean()
      (sf, exactSec, perNprobe)
    }

    println("\n| sf | nprobe | argmax recall@1 | flag agreement | contam ivf/exact | ivf (s) | exact arm (s) |")
    println("|---|---|---|---|---|---|---|")
    for ((sf, exactSec, per) <- rows; (np, nv, nam, nce, nci, nfa, ivfSec) <- per)
      println(f"| $sf | $np | $nam/$nv (${100.0 * nam / nv}%.2f%%) | $nfa/$nv (${100.0 * nfa / nv}%.2f%%) | $nci/$nce | $ivfSec%.2f | $exactSec%.2f |")
    println(f"%ncalib_sec=$calib%.4f (median of 5; min=${calibSamples.head}%.4f max=${calibSamples.last}%.4f)")
    spark.stop()
  }
}
