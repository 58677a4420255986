package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-micro-batch latency/throughput evidence for the production ingest
  * path (round 17 — the r16 verdict's item #7): the stream surface is
  * correctness-complete (AvailableNow replays, soak spec), but the
  * publishable number a firehose consumer plans around is the BATCH
  * DURATION DISTRIBUTION under maxFilesPerTrigger pacing. Runs the two
  * shipped pipelines — plain ingest-dedup and the full curation gate
  * chain (quality → Bloom decontamination → fingerprint dedup) — at a
  * configurable shard count over a corpus dir, captures every
  * micro-batch's durationMs/numInputRows from the query's progress
  * history, and prints the distribution. Also the evidence that the
  * in-suite q_stream_curate official number carries micro-batch timing
  * variance (the r16 official-vs-closing-sweep gap).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SHARDS=8 SPARK_GRAFT_TRIALS=3 \
  *        sbt "runMain graft.tools.StreamLatencyBench"
  */
object StreamLatencyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nShards = sys.env.getOrElse("SPARK_GRAFT_SHARDS", "8").toInt
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.IngestDedup

    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    final case class Batch(durMs: Long, rows: Long)
    def runArm(label: String, curate: Boolean, dir: String, nTrials: Int): Unit = {
      val all = scala.collection.mutable.ArrayBuffer.empty[Vector[Batch]]
      for (_ <- 0 until nTrials) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val (corpusMod, streamPred) =
          if (curate) (7L, pmod($"doc_id", lit(7)) =!= 0 && pmod($"doc_id", lit(31)) =!= 0)
          else (31L, pmod($"doc_id", lit(31)) =!= 0)
        val corpusFps = docs.filter(pmod($"doc_id", lit(corpusMod)) === 0)
          .select(IngestDedup.fpCol($"text").as("fp")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        corpusFps.count()
        val newDocs = docs.filter(streamPred).select($"doc_id", $"text")
        val prep: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          if (curate) {
            val (_, bloomHit) = graft.queries.PipelineQueries.streamBloomGate(spark, dir)
            graft.queries.StreamShapeQueries.curateGates(spark, bloomHit)
          } else identity
        var batches = Vector.empty[Batch]
        val run = IngestDedup.runIngest(spark, newDocs, corpusFps, nShards, prep,
          onProgress = ps => batches = ps.map(p =>
            Batch(p.durationMs.getOrDefault("triggerExecution", -1L), p.numInputRows)).toVector)
        IngestDedup.cleanup(spark, run)
        corpusFps.unpersist(blocking = false)
        all += batches.filter(_.rows > 0)
        deepClean()
      }
      val ds = all.flatMap(_.map(_.durMs.toDouble / 1000)).sorted
      val rows = all.head.map(_.rows).sum
      def pct(p: Double): Double = ds((p * (ds.size - 1)).round.toInt)
      println(f"[streamlat] $label%-14s shards=$nShards trials=$nTrials " +
        f"data_batches=${ds.size} rows/replay=$rows " +
        f"batch_sec min=${ds.head}%.2f med=${pct(0.5)}%.2f p90=${pct(0.9)}%.2f " +
        f"max=${ds.last}%.2f total_med=${all.map(_.map(_.durMs).sum.toDouble / 1000).sorted.apply(nTrials / 2)}%.2f " +
        f"rows/sec=${rows / all.map(_.map(_.durMs).sum.toDouble / 1000).min}%.0f")
    }

    // JIT warm on the tiny corpus, both arms
    runArm("warm_ingest", curate = false, "/root/testdata/sf0.01", 1)
    runArm("warm_curate", curate = true, "/root/testdata/sf0.01", 1)
    runArm("ingest_dedup", curate = false, sfDir, trials)
    runArm("curate", curate = true, sfDir, trials)
    spark.stop()
  }
}
