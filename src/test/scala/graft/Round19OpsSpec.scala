package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-19 closures on the vector-index store lifecycle:
  *
  *  - same-watermark RE-compaction (round-18 ADVICE): a second
  *    `compact(upTo=N)` after new tombstones must physically drop them
  *    under an epoch-bumped generation, while a pure retry with no
  *    remaining work still converges as a no-op;
  *  - the append×compaction in-flight fence under REAL interleaving
  *    (round-18 VERDICT #4): a compaction pointer-flip injected between
  *    the append's pointer resolution and its write, proving the
  *    post-write fence re-lands the shard against the new generation;
  *  - the local-filesystem store-path guard (round-18 ADVICE).
  */
class Round19OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val P = graft.queries.PipelineQueries
  private val sfDir = "/root/testdata/sf0.001"

  private def rm(p: String): Unit = graft.util.Fs.deleteRecursively(p)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def doomedIds() = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id").filter($"vec_id" % 10 === 3)
  }

  private def serve(store: String): Seq[(Long, Long, Long, Long, Double)] = {
    import spark.implicits._
    P.ivfIndexServeOnly(spark, sfDir, store)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
  }

  test("a second compact at the same watermark drops tombstones added after the first") {
    import spark.implicits._
    val a = tmp("ivf_recompact")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a)
      val g1 = P.ivfIndexCompact(spark, a, upTo = 1L)
      assert(g1 == "index_c1" && P.ivfIndexLiveName(a) == g1)
      // takedown arrives AFTER the watermark-1 compaction already ran
      P.ivfIndexDelete(spark, a, delId = 1L, doomedIds())
      val masked = serve(a)
      assert(spark.read.parquet(P.ivfIndexLiveDir(a))
          .filter($"vec_id" % 10 === 3).count() > 0,
        "the doomed rows must still be physically present before the re-compact")
      // the round-18 bug: this call no-op'd on bare name equality and the
      // tombstones were never physically dropped
      val g2 = P.ivfIndexCompact(spark, a, upTo = 1L)
      assert(g2 == "index_c1e2" && P.ivfIndexLiveName(a) == g2,
        s"a new pass at the same watermark must run under an epoch-bumped name, got $g2")
      assert(spark.read.parquet(P.ivfIndexLiveDir(a))
          .filter($"vec_id" % 10 === 3).count() == 0L,
        "the same-watermark re-compaction must physically drop the new tombstones")
      assert(serve(a) == masked,
        "physical removal must not change served results (the mask already hid them)")
      // and a THIRD call with nothing left to do is a pure retry: no-op,
      // same generation, directory untouched
      val dirBefore = new java.io.File(s"$a/$g2").list().sorted.toSeq
      val g3 = P.ivfIndexCompact(spark, a, upTo = 1L)
      assert(g3 == g2, "a retry with no remaining work must converge as a no-op")
      assert(new java.io.File(s"$a/$g2").list().sorted.toSeq == dirBefore,
        "the no-op retry must not rewrite the live generation")
    } finally rm(a)
  }

  test("same-watermark recompact also merges a shard whose first delivery raced the earlier pass") {
    import spark.implicits._
    val a = tmp("ivf_recompact_raced"); val ref = tmp("ivf_recompact_ref")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a, shard = 1L, slice = (2L, 0L))
      P.ivfIndexCompact(spark, a, upTo = 5L)
      // first delivery of shard 3 lands AFTER compact(upTo=5) — under its
      // own id (manifest says it was never absorbed)
      P.ivfIndexAppend(spark, sfDir, a, shard = 3L, slice = (2L, 1L))
      val g2 = P.ivfIndexCompact(spark, a, upTo = 5L)
      assert(g2 == "index_c5e2")
      val live = spark.read.parquet(P.ivfIndexLiveDir(a))
      assert(live.filter($"shard" =!= P.CompactedShard).count() == 0L,
        "after the re-compact every row at/below the watermark is merged")
      assert(P.ivfIndexAbsorbed(a, g2) == Set(0L, 1L, 3L),
        "the epoch generation's manifest must accumulate the newly merged shard")
      // a redelivery of the now-absorbed shard must no-op against the manifest
      val nBefore = live.count()
      P.ivfIndexAppend(spark, sfDir, a, shard = 3L, slice = (2L, 1L))
      assert(spark.read.parquet(P.ivfIndexLiveDir(a)).count() == nBefore,
        "redelivery of an absorbed shard after the epoch compact must no-op")
      // end state serves identically to the never-raced sequential store
      P.ivfIndexBuild(spark, sfDir, ref)
      P.ivfIndexAppend(spark, sfDir, ref, shard = 1L, slice = (2L, 0L))
      P.ivfIndexAppend(spark, sfDir, ref, shard = 3L, slice = (2L, 1L))
      P.ivfIndexCompact(spark, ref, upTo = 5L)
      assert(serve(a) == serve(ref))
    } finally { rm(a); rm(ref) }
  }

  test("in-flight append survives a compaction flip injected between resolve and write") {
    import spark.implicits._
    val a = tmp("ivf_inflight"); val ref = tmp("ivf_inflight_ref")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a, shard = 1L, slice = (2L, 0L))
      // the r17 in-flight hole, driven deterministically: shard 3's append
      // resolves the pre-flip generation ("index"), then a compaction runs
      // TO COMPLETION (flip + old-generation delete) before the write —
      // the write lands in a retired directory and only the post-write
      // fence can save the shard
      val resolved = scala.collection.mutable.ArrayBuffer.empty[String]
      var flipped = false
      P.ivfIndexAppend(spark, sfDir, a, shard = 3L, slice = (2L, 1L),
        preWrite = { gen =>
          resolved += gen
          if (!flipped) { flipped = true; P.ivfIndexCompact(spark, a, upTo = 2L) }
        })
      assert(resolved.toSeq == Seq("index", "index_c2"),
        s"the fence must retry exactly once, against the flipped generation; saw $resolved")
      val live = spark.read.parquet(P.ivfIndexLiveDir(a))
      // shard 3 landed exactly once, in the live generation, no duplicates
      assert(live.filter($"shard" === 3L).count() > 0)
      assert(live.groupBy($"vec_id").count().filter($"count" > 1).count() == 0L,
        "the aborted pre-flip write must not double-serve any vector")
      P.ivfIndexBuild(spark, sfDir, ref)
      P.ivfIndexAppend(spark, sfDir, ref, shard = 1L, slice = (2L, 0L))
      P.ivfIndexCompact(spark, ref, upTo = 2L)
      P.ivfIndexAppend(spark, sfDir, ref, shard = 3L, slice = (2L, 1L))
      assert(serve(a) == serve(ref),
        "the interleaved store must serve identically to the sequential one")
    } finally { rm(a); rm(ref) }
  }

  test("bench flags a UNIFORMLY slow calibration window the spread check misses") {
    // the r18 official artifact's exact shape: all 5 draws ~17× hot, spread
    // 1.48× (< 2×) — isSuspectWindow misses it, isUniformlySlow must not
    val r18Window = Seq(29.56, 30.1, 32.19, 35.0, 43.85)
    assert(!Bench.isSuspectWindow(r18Window),
      "precondition: the spread-only detector is blind to this window " +
        "(otherwise this test certifies nothing new)")
    assert(Bench.isUniformlySlow(r18Window(2)),
      "a 20x-inflated median must trip the absolute cross-round norm")
    // clean windows (the measured 1.2–1.9 s band) must NOT flag
    assert(!Bench.isUniformlySlow(1.2))
    assert(!Bench.isUniformlySlow(1.89))
    // the boundary: flag strictly above 3x the norm
    assert(!Bench.isUniformlySlow(3.0 * Bench.CalibNormSec))
    assert(Bench.isUniformlySlow(3.0 * Bench.CalibNormSec + 0.01))
    // a custom norm (slower host / fewer cpus) shifts the band with it
    assert(!Bench.isUniformlySlow(10.0, norm = 6.2))
    assert(Bench.isUniformlySlow(19.0, norm = 6.2))
    // degenerate norms never flag (a bad override must not poison the run)
    assert(!Bench.isUniformlySlow(100.0, norm = 0.0))
  }

  test("store entry points fail fast on scheme-qualified (non-local) paths") {
    import spark.implicits._
    val remote = "s3a://bucket/vecstore"
    val e1 = intercept[IllegalArgumentException](P.ivfIndexLiveName(remote))
    assert(e1.getMessage.contains("local-filesystem"))
    intercept[IllegalArgumentException](P.ivfIndexTombstones(spark, remote))
    intercept[IllegalArgumentException](
      P.ivfIndexDelete(spark, remote, 1L, Seq(1L).toDF("vec_id")))
  }
}
