package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement tool for the batched BPE trainer (round-16, r14 verdict
  * item #4): times the trainer LOOP (bpeTrainLoop) at batchM=1 (the
  * sequential protocol — spec-proven identical to q_bpe_train,
  * Round16OpsSpec) against batchM=M for the same nMerges, both starting
  * from the SAME materialized vocabulary, trials interleaved so both arms
  * see the same window conditions. The shared corpus→vocabulary pass is
  * timed separately — in a production-size training run (32k merges) it
  * amortizes to nothing, so the loop is the quantity that scales.
  * Not shipped behavior — evidence for BENCH_SCALING.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_MERGES=256 SPARK_GRAFT_BATCH=64
  *        sbt "runMain graft.tools.BpeTrainBench"
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_MERGES", "256").toInt
    val batchM = sys.env.getOrElse("SPARK_GRAFT_BATCH", "64").toInt
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.CorpusOpsQueries._

    // untimed warm draw: JIT for BOTH the kernel and the replace paths
    bpeTrainLoop(spark, bpeVocab(spark, sfDir), 8, 4, 64).count()
    bpeTrainLoop(spark, bpeVocab(spark, sfDir), 8, 1, 64).count()

    // the shared one-time corpus→vocabulary pass
    val vts = Seq.fill(trials) {
      val t0 = System.nanoTime()
      bpeVocab(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[bpebench] vocab pass (shared, untrained arm cost) " +
      f"median=${vts(vts.length / 2)}%.2f s (min=${vts.head}%.2f max=${vts.last}%.2f)")

    // one materialized vocabulary both arms train from, every trial
    val w0 = bpeVocab(spark, sfDir)
    w0.count()

    def run(m: Int): Double = {
      val t0 = System.nanoTime()
      val n = bpeTrainLoop(spark, w0, nMerges, m, poolK = math.max(64, m)).count()
      require(n == nMerges, s"expected $nMerges merges, got $n")
      (System.nanoTime() - t0) / 1e9
    }

    // interleave arms so window drift hits both equally
    val (bs, ss) = (Array.fill(trials)(0.0), Array.fill(trials)(0.0))
    for (t <- 0 until trials) { bs(t) = run(batchM); ss(t) = run(1) }
    def report(label: String, ts: Array[Double]): Double = {
      val s = ts.sorted; val med = s(s.length / 2)
      println(f"[bpebench] $label%-22s nMerges=$nMerges median=$med%.2f s " +
        f"(min=${s.head}%.2f max=${s.last}%.2f) merges/sec=${nMerges / med}%.1f")
      med
    }
    val bMed = report(s"loop batched (M=$batchM)", bs)
    val sMed = report("loop sequential (M=1)", ss)
    println(f"[bpebench] trainer-loop speedup: ${sMed / bMed}%.1fx " +
      f"(min-based ${ss.min / bs.min}%.1fx)")
    spark.stop()
  }
}
