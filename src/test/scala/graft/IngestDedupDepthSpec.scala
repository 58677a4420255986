package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.streaming.IngestDedup

/** Depth proof for the ingest-dedup loop (q_stream_ingest_dedup runs it at
  * 2 batches against the DuckDB oracle; this spec runs the SAME machinery
  * at 4 ordered micro-batches) covering the three claims the operator's
  * contract makes but a 2-batch replay can't prove:
  *   1. cross-batch suppression at depth — a fingerprint admitted in batch
  *      0 stays suppressed in batches 1, 2 AND 3;
  *   2. store-scan partition pruning — the `batch < batchId` anti-join
  *      reads EXACTLY the prefix partitions at every depth (file-level scan
  *      metrics), even when later partitions exist — which is also why a
  *      RETRIED batch never reads its own half-written partition;
  *   3. overwrite idempotency — re-applying a completed batch (foreachBatch
  *      is at-least-once) reproduces byte-identical survivors and output.
  */
class IngestDedupDepthSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // shard = doc_id % 4; fingerprints are over SORTED DISTINCT words, so
  // "words common corpus corpus" == "corpus common words"
  private val corpusText = "corpus common words"
  private val docs = Seq(
    4L  -> "alpha beta",                  // fpA shard 0 — survivor
    5L  -> "beta alpha",                  // fpA shard 1 — cross-batch dup
    6L  -> "alpha beta alpha",            // fpA shard 2 — cross-batch dup
    7L  -> "beta beta alpha",             // fpA shard 3 — cross-batch dup
    8L  -> corpusText,                    // corpus fp shard 0 — suppressed
    13L -> "words common corpus corpus",  // corpus fp shard 1 — suppressed
    16L -> corpusText,                    // corpus fp shard 0 — suppressed
    9L  -> "bravo charlie",               // fpB shard 1 — survivor (min id)
    21L -> "charlie bravo",               // fpB shard 1 — in-shard dup
    10L -> "bravo charlie bravo",         // fpB shard 2 — cross-batch dup
    14L -> "foxtrot golf",                // fpF shard 2 — survivor
    11L -> "delta echo",                  // fpD shard 3 — survivor
    12L -> "epsilon zeta")                // fpE shard 0 — survivor

  private def fixture() = {
    import spark.implicits._
    val newDocs = docs.toDF("doc_id", "text")
    val corpusFps = Seq(corpusText).toDF("text")
      .select(IngestDedup.fpCol($"text").as("fp"))
    (newDocs, corpusFps)
  }

  private def prunedStoreScanFiles(storeTable: String, batchLt: Long): Long = {
    val df = spark.table(storeTable)
      .where(col("batch") < lit(batchLt)).select(col("fp"))
    df.collect() // no shuffle -> no AQE wrapper; the scan is in executedPlan
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
  }

  private def filesInPartition(location: String, b: Long): Long = {
    val dir = java.nio.file.Paths.get(location.stripPrefix("file:"), s"batch=$b")
    val listing = java.nio.file.Files.list(dir)
    try listing.filter { p =>
      val n = p.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".") // _SUCCESS and .crc sidecars
    }.count()
    finally listing.close()
  }

  test("4-batch replay: cross-batch suppression at depth, pruned store reads, idempotent retry") {
    import spark.implicits._
    val (newDocs, corpusFps) = fixture()
    val run = IngestDedup.runIngest(spark, newDocs, corpusFps, nShards = 4)
    try {
      // --- 1. cross-batch suppression at depth -------------------------
      val out = spark.read.parquet(run.outDir)
        .select($"doc_id", $"n_dup_in_shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((4L, 1L), (9L, 2L), (14L, 1L), (11L, 1L), (12L, 1L)),
        s"expected one survivor per fingerprint from its FIRST batch: $out")

      // --- 2. store-scan partition pruning at every depth --------------
      val location = spark.sql(s"DESC FORMATTED ${run.storeTable}")
        .filter($"col_name" === "Location").head.getString(1)
      val perPartition = (0L to 3L).map(b => filesInPartition(location, b))
      assert(perPartition.forall(_ > 0), s"every batch must have appended: $perPartition")
      (1L to 4L).foreach { b =>
        val scanned = prunedStoreScanFiles(run.storeTable, b)
        val expected = perPartition.take(b.toInt).sum
        assert(scanned == expected,
          s"batch<$b must scan exactly the prefix partitions' files " +
            s"($expected), saw $scanned — pruning regressed")
      }
      // the retry-pruning property in particular: with all 4 partitions on
      // disk, a retried batch 1 (filter batch < 1) touches ONLY partition 0
      assert(prunedStoreScanFiles(run.storeTable, 1L) == perPartition.head)

      // --- 3. overwrite idempotency under at-least-once retry ----------
      val before = spark.read.parquet(s"${run.outDir}/batch=1")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val shard1 = newDocs.filter(pmod($"doc_id", lit(4)) === 1)
      IngestDedup.applyBatch(spark, shard1, 1L, corpusFps,
        run.storeTable, run.outDir)
      val after = spark.read.parquet(s"${run.outDir}/batch=1")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(after == before,
        s"retried batch must overwrite its partition with identical survivors: $before vs $after")
      // the retry double-appended batch=1 fps to the store — harmless by
      // design (the store is a SET probed by anti-join): a later batch
      // still suppresses exactly the same fingerprints
      val wouldBe = shard1.select($"doc_id", IngestDedup.fpCol($"text").as("fp"))
        .join(spark.table(run.storeTable).where($"batch" < 2).select($"fp"),
          Seq("fp"), "left_semi")
        .select($"doc_id").as[Long].collect().toSet
      assert(wouldBe == Set(5L, 9L, 21L),
        s"store set semantics changed under duplicate fps: $wouldBe")
      // and the full output across batches is unchanged
      val outAfter = spark.read.parquet(run.outDir)
        .select($"doc_id", $"n_dup_in_shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(outAfter == out)
    } finally IngestDedup.cleanup(spark, run)
  }

  test("store compaction: per-bucket coalesce preserves the set, the retry filter, and the zero-Exchange anti-join") {
    import spark.implicits._
    val (newDocs, corpusFps) = fixture()
    val run = IngestDedup.runIngest(spark, newDocs, corpusFps, nShards = 4)
    val conf = spark.conf
    val bcKeys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val savedBc = bcKeys.map(k => k -> conf.getAll.get(k)).toMap
    try {
      // simulate an in-flight half-written batch 4 (at-least-once): its
      // fps sit ABOVE upTo and must survive compaction verbatim so the
      // batch-4 retry's `batch < 4` filter still excludes them
      Seq("inflight doc").toDF("text")
        .select(IngestDedup.fpCol($"text").as("fp"), lit(4L).as("batch"))
        .write.partitionBy("batch").bucketBy(4, "fp").sortBy("fp")
        .mode("append").format("parquet").saveAsTable(run.storeTable)
      val beforeSet = spark.table(run.storeTable).where($"batch" < 4)
        .select($"fp").as[String].collect().toSet
      val beforeFiles = {
        val loc = spark.sql(s"DESC FORMATTED ${run.storeTable}")
          .filter($"col_name" === "Location").head.getString(1)
        (0L to 3L).map(b => filesInPartition(loc, b)).sum
      }
      // crash-safety: a garbage table from a "crashed prior attempt" must
      // be cleared by the retry's initial DROP, not break the rewrite
      spark.sql(s"CREATE TABLE ${run.storeTable}_c3 (junk INT) USING parquet")
      val compacted = IngestDedup.compactStore(spark, run.storeTable, upTo = 3L)
      assert(compacted == s"${run.storeTable}_c3")

      // the probe set under the NEXT batch's retry filter is unchanged
      val afterSet = spark.table(compacted).where($"batch" < 4)
        .select($"fp").as[String].collect().toSet
      assert(afterSet == beforeSet, "compaction changed the fingerprint set")
      // prefix collapsed to ONE partition (batch = upTo); in-flight kept
      val batches = spark.table(compacted).select($"batch").distinct()
        .as[Long].collect().toSet
      assert(batches == Set(3L, 4L), s"expected {3 (compacted), 4 (in-flight)}: $batches")
      assert(spark.table(compacted).where($"batch" === 4L).count() == 1L,
        "the in-flight partition must be copied verbatim")
      // per-bucket coalesce: the whole compacted prefix is <= 4 bucket files
      // (the source layout paid 4 partitions x buckets)
      val cLoc = spark.sql(s"DESC FORMATTED $compacted")
        .filter($"col_name" === "Location").head.getString(1)
      val cFiles = filesInPartition(cLoc, 3L)
      assert(cFiles <= 4, s"compacted prefix must be one file per bucket: $cFiles")
      assert(cFiles < beforeFiles,
        s"compaction must shrink the file count ($beforeFiles -> $cFiles)")

      // the zero-store-side-Exchange anti-join plan SURVIVES compaction:
      // same gate as PlanQualitySpec's store test, against the new table
      bcKeys.foreach(conf.set(_, "-1"))
      val probe = spark.range(0, 200)
        .select(md5((col("id") * 3).cast("string")).as("fp"))
      val fresh = probe.join(
        spark.table(compacted).where($"batch" < 5L).select($"fp"),
        Seq("fp"), "left_anti")
      fresh.collect()
      // AQE's toString prints Final AND Initial sections — gate the final
      val plan = fresh.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("LeftAnti"), plan)
      val exchanges = "Exchange".r.findAllIn(plan.replace("ReusedExchange", "")).size
      assert(exchanges == 1,
        s"expected exactly the probe-side exchange after compaction:\n$plan")

      // idempotent: a re-run (e.g. the swap crashed before the drop)
      // converges to the same table
      val again = IngestDedup.compactStore(spark, run.storeTable, upTo = 3L)
      assert(again == compacted)
      assert(spark.table(again).where($"batch" < 4)
        .select($"fp").as[String].collect().toSet == beforeSet)
      // the swap completes the pass: the superseded store is dropped
      IngestDedup.swapCompacted(spark, run.storeTable)
      assert(!spark.catalog.tableExists(run.storeTable))
    } finally {
      savedBc.foreach { case (k, Some(v)) => conf.set(k, v)
                        case (k, None)    => conf.unset(k) }
      spark.sql(s"DROP TABLE IF EXISTS ${run.storeTable}_c3")
      IngestDedup.cleanup(spark, run)
    }
  }

  test("store retention: age-based expiry keeps the set and retry filter over the horizon, the plan gate survives, and pass naming stays bounded") {
    import spark.implicits._
    // pass names derive from the STRIPPED base, so chained maintenance
    // passes never accrete suffixes (store_c3_c7_c12… — the unbounded-
    // identity defect) and each retry's DROP guard clears the right table
    assert(IngestDedup.storeBaseName("graft_fp_store_ab12") == "graft_fp_store_ab12")
    assert(IngestDedup.storeBaseName("graft_fp_store_ab12_c3") == "graft_fp_store_ab12")
    assert(IngestDedup.storeBaseName("graft_fp_store_ab12_c3_r7") == "graft_fp_store_ab12")
    // and stripping is SOUND because lineage starts suffix-free: a NEW
    // store whose name already matches the maintenance-suffix pattern is
    // rejected before any write (otherwise a later pass would retarget —
    // and its DROP guard could delete — an unrelated table)
    val badName = intercept[IllegalArgumentException] {
      IngestDedup.applyBatch(spark, Seq((1L, "a b")).toDF("doc_id", "text"),
        0L, Seq.empty[String].toDF("fp"), "graft_user_store_c3", "/tmp/unused")
    }
    assert(badName.getMessage.contains("maintenance-suffix"))

    val (newDocs, corpusFps) = fixture()
    val run = IngestDedup.runIngest(spark, newDocs, corpusFps, nShards = 4)
    val conf = spark.conf
    val bcKeys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val savedBc = bcKeys.map(k => k -> conf.getAll.get(k)).toMap
    try {
      // crash-safety: a garbage table from a crashed prior attempt is
      // cleared by the retry's initial DROP
      spark.sql(s"CREATE TABLE ${run.storeTable}_r2 (junk INT) USING parquet")
      val keptBefore = spark.table(run.storeTable).where($"batch" >= 2L)
        .select($"fp", $"batch").as[(String, Long)].collect().toSet
      assert(keptBefore.nonEmpty)
      val expired = IngestDedup.expireStore(spark, run.storeTable, dropBelow = 2L)
      assert(expired == s"${run.storeTable}_r2")

      // fingerprints AND their batch ids (the retry filter's input)
      // survive verbatim above the horizon; everything below is gone
      val after = spark.table(expired)
        .select($"fp", $"batch").as[(String, Long)].collect().toSet
      assert(after == keptBefore,
        "expiry must preserve (fp, batch) exactly over the horizon")
      assert(spark.table(expired).select($"batch").distinct()
        .as[Long].collect().toSet == Set(2L, 3L))

      // the zero-store-side-Exchange anti-join plan survives expiry: the
      // rewritten table keeps the bucketBy(4, fp) contract
      bcKeys.foreach(conf.set(_, "-1"))
      val probe = spark.range(0, 200)
        .select(md5((col("id") * 3).cast("string")).as("fp"))
      val fresh = probe.join(
        spark.table(expired).where($"batch" < 4L).select($"fp"),
        Seq("fp"), "left_anti")
      fresh.collect()
      val plan = fresh.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("LeftAnti"), plan)
      val exchanges = "Exchange".r.findAllIn(plan.replace("ReusedExchange", "")).size
      assert(exchanges == 1,
        s"expected exactly the probe-side exchange after expiry:\n$plan")

      // idempotent retry converges to the same table
      val again = IngestDedup.expireStore(spark, run.storeTable, dropBelow = 2L)
      assert(again == expired)
      assert(spark.table(again).select($"fp", $"batch")
        .as[(String, Long)].collect().toSet == keptBefore)

      // chained maintenance on a pass OUTPUT still derives from the base:
      // compacting the expired table names <base>_c3, never <base>_r2_c3
      val compacted = IngestDedup.compactStore(spark, expired, upTo = 3L)
      assert(compacted == s"${run.storeTable}_c3",
        s"chained pass accreted a suffix: $compacted")
      // and a pass that would overwrite its own source refuses loudly
      intercept[IllegalArgumentException] {
        IngestDedup.expireStore(spark, expired, dropBelow = 2L)
      }
    } finally {
      savedBc.foreach { case (k, Some(v)) => conf.set(k, v)
                        case (k, None)    => conf.unset(k) }
      Seq(s"${run.storeTable}_r2", s"${run.storeTable}_c3")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      IngestDedup.cleanup(spark, run)
    }
  }
}
