package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.streaming.IngestDedup

/** Depth soak for the COMPOSED curation funnel (VERDICT r11 item 6):
  * q_stream_curate runs the full gate chain (quality kernels → Bloom
  * decontamination → durable-fingerprint ingest-dedup) at 2 micro-batches
  * against the DuckDB oracle; this spec replays the SAME machinery at 8
  * ordered micro-batches and asserts the properties a shallow replay can't
  * prove:
  *   1. depth-8 output equals a batch-side recompute through the SAME gate
  *      transform (stateless gates ⇒ stream/batch equivalence) with
  *      min-batch-wins dedup and corpus suppression;
  *   2. the per-batch store anti-join scan stays PREFIX-PRUNED at every
  *      depth (file-level scan metrics: batch b reads exactly the files of
  *      partitions 0..b-1, never the whole store);
  *   3. store growth stays flat per batch: each batch appends at most its
  *      fixed bucket-file count (4), so files grow linearly in batches —
  *      no small-file explosion, no rewrite of earlier partitions.
  */
class StreamCurateSoakSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val nShards = 8

  private def prunedStoreScanFiles(storeTable: String, batchLt: Long): Long = {
    val df = spark.table(storeTable)
      .where(col("batch") < lit(batchLt)).select(col("fp"))
    df.collect() // no shuffle -> no AQE wrapper; the scan is in executedPlan
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
  }

  private def filesInPartition(location: String, b: Long): Long = {
    val dir = java.nio.file.Paths.get(location.stripPrefix("file:"), s"batch=$b")
    if (!java.nio.file.Files.isDirectory(dir)) return 0L
    val listing = java.nio.file.Files.list(dir)
    try listing.filter { p =>
      val n = p.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".")
    }.count()
    finally listing.close()
  }

  test("8-batch curated ingest: gate-chain equivalence at depth, prefix-pruned store reads, flat per-batch growth") {
    import spark.implicits._
    val (_, bloomHit) = graft.queries.PipelineQueries.streamBloomGate(spark, sfDir)
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val corpusFps = docs.filter(pmod($"doc_id", lit(7)) === 0)
      .select(IngestDedup.fpCol($"text").as("fp")).distinct().localCheckpoint()
    val newDocs = docs
      .filter(pmod($"doc_id", lit(7)) =!= 0 && pmod($"doc_id", lit(31)) =!= 0)
      .select($"doc_id", $"text")
    val gates = graft.queries.StreamShapeQueries.curateGates(spark, bloomHit)
    val run = IngestDedup.runIngest(spark, newDocs, corpusFps, nShards, prep = gates)
    try {
      // --- 1. depth-8 output == batch-side recompute through the SAME gates
      val gated = gates(newDocs)
        .select($"doc_id", IngestDedup.fpCol($"text").as("fp"),
          pmod($"doc_id", lit(nShards)).as("b"))
      // the gates must BITE at this sf, or the soak is vacuous
      val nGated = gated.count()
      assert(nGated > 0 && nGated < newDocs.count(),
        s"gate chain vacuous: $nGated of ${newDocs.count()} pass")
      val perShard = gated.groupBy($"fp", $"b")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dup_in_shard"))
      val minB = perShard.groupBy($"fp").agg(min($"b").as("b"))
      val want = perShard.join(minB, Seq("fp", "b"))
        .join(corpusFps, Seq("fp"), "left_anti")
        .select($"doc_id", $"fp", $"n_dup_in_shard")
        .as[(Long, String, Long)].collect().toSet
      val got = spark.read.parquet(run.outDir)
        .select($"doc_id", $"fp", $"n_dup_in_shard")
        .as[(Long, String, Long)].collect().toSet
      assert(got == want,
        s"stream-at-depth diverged from the batch recompute: " +
          s"only-stream=${got -- want} only-batch=${want -- got}")
      // depth non-vacuous: survivors span several distinct micro-batches
      val batchesHit = got.map(_._1 % nShards).size
      assert(batchesHit >= 4, s"survivors span only $batchesHit batches")

      // --- 2. prefix-pruned store reads at every depth -------------------
      val location = spark.sql(s"DESC FORMATTED ${run.storeTable}")
        .filter($"col_name" === "Location").head.getString(1)
      val perPartition = (0L until nShards.toLong).map(b => filesInPartition(location, b))
      (1L to nShards.toLong).foreach { b =>
        val scanned = prunedStoreScanFiles(run.storeTable, b)
        val expected = perPartition.take(b.toInt).sum
        assert(scanned == expected,
          s"batch<$b must scan exactly the prefix partitions' files " +
            s"($expected), saw $scanned — pruning regressed at depth")
      }

      // --- 3. flat per-batch store growth ---------------------------------
      // every batch appends at most its bucket-file count (bucketBy(4));
      // a partition rewriting history or exploding into small files fails
      assert(perPartition.forall(_ <= 4),
        s"per-batch store files must stay at the bucket count: $perPartition")
      assert(perPartition.count(_ > 0) >= 4,
        s"expected appends across >= 4 of $nShards batches: $perPartition")
    } finally IngestDedup.cleanup(spark, run)
  }
}
