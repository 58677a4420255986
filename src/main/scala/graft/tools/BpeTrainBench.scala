package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement tool for the batched BPE trainer (round-16, r14 verdict
  * item #4; extended round 17 for production merge counts): times the
  * trainer LOOP (bpeTrainLoop) at batchM=1 (the sequential protocol —
  * spec-proven identical to q_bpe_train, Round16OpsSpec) against
  * batchM=M for the same nMerges, both starting from the SAME
  * materialized vocabulary, trials interleaved so both arms see the same
  * window conditions. The shared corpus→vocabulary pass is timed
  * separately — in a production-size training run (32k merges) it
  * amortizes to nothing, so the loop is the quantity that scales.
  * Not shipped behavior — evidence for BENCH_SCALING.md.
  *
  * Round 17: `SPARK_GRAFT_SYNTH=<nWords>` swaps the corpus vocabulary
  * for a character-richer SYNTHETIC one (deterministic syllable
  * composition — 75 CV syllables, 2–5 per word, zipf-ish counts), the
  * morphology shape that sustains ≥1k merges where the sf4 corpus's
  * 403-word vocabulary exhausts at ~260; `SPARK_GRAFT_BATCHES=64,256`
  * sweeps batch widths (sequential arm via batch 1 in the list);
  * `SPARK_GRAFT_MINCOUNT` exercises the natural stop rule.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_MERGES=256 SPARK_GRAFT_BATCH=64
  *        sbt "runMain graft.tools.BpeTrainBench"
  *   or:  SPARK_GRAFT_SYNTH=200000 SPARK_GRAFT_MERGES=1024 \
  *        SPARK_GRAFT_BATCHES=256,64 SPARK_GRAFT_TRIALS=3 \
  *        sbt "runMain graft.tools.BpeTrainBench"
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_MERGES", "256").toInt
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "5").toInt
    val synthN = sys.env.getOrElse("SPARK_GRAFT_SYNTH", "0").toInt
    val minCount = sys.env.getOrElse("SPARK_GRAFT_MINCOUNT", "1").toLong
    val batches: Seq[Int] = sys.env.get("SPARK_GRAFT_BATCHES")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(sys.env.getOrElse("SPARK_GRAFT_BATCH", "64").toInt, 1))
      .distinct
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.CorpusOpsQueries._

    /** Character-richer synthetic vocabulary in bpeVocab's wrapped-symbol
      * shape — deterministic syllable morphology (the structure real
      * language has and uniform-random strings lack): 15 consonants × 5
      * vowels = 75 CV syllables, words of 2–5 syllables composed by an
      * LCG walk, counts zipf-ish by word index. High-count pairs exist at
      * every composition level (within-syllable, cross-syllable, merged-
      * symbol), so merge supply survives into the thousands.
      */
    def synthVocab(nWords: Int) = {
      import spark.implicits._
      val syll = for { c <- "bcdfgklmnprstvz"; v <- "aeiou" } yield s"$c$v"
      (0 until nWords).map { i =>
        var x = (i * 2654435761L) & 0x7fffffffffffffffL
        def nx(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffffffffffL; x }
        val k = 2 + (nx() % 4).toInt
        val w = (0 until k).map(_ => syll((nx() % 75).toInt)).mkString
        (w.map(c => s"|$c|").mkString, 1L + 9999L / (1L + i % 1000))
      }.toDF("symstr", "wcnt")
        .groupBy("symstr").agg(org.apache.spark.sql.functions.sum("wcnt").as("wcnt"))
        .repartition(cpus.toInt)
    }

    // untimed warm draw: JIT for BOTH the kernel and the replace paths
    bpeTrainLoop(spark, bpeVocab(spark, "/root/testdata/sf0.01"), 8, 4, 64).count()
    bpeTrainLoop(spark, bpeVocab(spark, "/root/testdata/sf0.01"), 8, 1, 64).count()

    // one materialized vocabulary all arms train from, every trial
    val w0 = (if (synthN > 0) synthVocab(synthN) else bpeVocab(spark, sfDir))
      .localCheckpoint()
    val nVocab = w0.count()
    println(s"[bpebench] vocabulary: ${if (synthN > 0) s"synthetic($synthN draws)" else sfDir} " +
      s"-> $nVocab distinct words")

    // real driver-heap peak across a run (JMX pool peaks, reset per run) —
    // the pool collect is the only driver-side state that grows with the
    // vocabulary's symbol alphabet, so the 32k-merge run prices it here
    def heapPools = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
    }
    def run(m: Int): (Double, Long) = {
      heapPools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      val n = bpeTrainLoop(spark, w0, nMerges, m, poolK = -1, minPairCount = minCount).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val peakMb = heapPools.map(p => Option(p.getPeakUsage).map(_.getUsed)
        .getOrElse(0L)).sum / (1024 * 1024)
      println(f"[bpebench] run M=$m merges=$n wall=$dt%.2f s driver_heap_peak=${peakMb} MB")
      (dt, n)
    }

    // interleave arms so window drift hits all equally
    val times = scala.collection.mutable.Map.empty[Int, Vector[(Double, Long)]]
      .withDefaultValue(Vector.empty)
    for (_ <- 0 until trials; m <- batches) times(m) = times(m) :+ run(m)
    val meds = batches.map { m =>
      val ts = times(m).map(_._1).sorted
      val got = times(m).map(_._2).distinct
      require(got.size == 1, s"merge count varied across trials for M=$m: $got")
      val med = ts(ts.length / 2)
      println(f"[bpebench] loop M=$m%-5d merges=${got.head} median=$med%.2f s " +
        f"(min=${ts.head}%.2f max=${ts.last}%.2f) merges/sec=${got.head / med}%.1f " +
        f"poolK=${adaptivePoolK(m)}")
      m -> med
    }.toMap
    for (m <- batches.filter(_ > 1); if meds.contains(1))
      println(f"[bpebench] trainer-loop speedup M=$m vs sequential: ${meds(1) / meds(m)}%.1fx")
    spark.stop()
  }
}
