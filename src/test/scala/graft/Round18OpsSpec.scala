package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-18 closures: index DELETION — the missing lifecycle verb
  * (tombstone writes, the serve-side anti-join mask, physical removal at
  * compaction) — plus the compaction/append redelivery fence (reserved
  * compacted shard id + the `_ABSORBED` manifest) and the store-backed
  * health audit with its planted-deletion flag proofs.
  */
class Round18OpsSpec extends AnyFunSuite {
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

  test("serve after delete equals serving an index physically rebuilt without the deleted") {
    import spark.implicits._
    val a = tmp("ivf_del_a"); val b = tmp("ivf_del_b")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a)
      val before = serve(a)
      // clone A's artifacts into B MINUS the doomed rows — the
      // ground-truth "rebuild without the deleted" store
      spark.read.parquet(s"$a/meta").coalesce(1)
        .write.mode("overwrite").parquet(s"$b/meta")
      spark.read.parquet(s"$a/index")
        .filter($"vec_id" % 10 =!= 3)
        .write.partitionBy("cell", "shard").mode("overwrite").parquet(s"$b/index")
      P.ivfIndexDelete(spark, a, delId = 1L, doomedIds())
      val masked = serve(a)
      assert(masked == serve(b),
        "tombstone-masked serve must be row-identical to a rebuilt-without-deleted index")
      assert(masked != before,
        "the takedown set must actually intersect the served neighborhoods " +
          "(otherwise this test certifies nothing)")
      assert(masked.forall { case (_, _, cId, _, _) => cId % 10 != 3 },
        "no tombstoned vector may be served")
    } finally { rm(a); rm(b) }
  }

  test("re-delete is idempotent: same batch redelivered and an overlapping later batch change nothing") {
    import spark.implicits._
    val a = tmp("ivf_del_idem")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a)
      // an EMPTY delete batch (a takedown feed with no new ids) must not
      // poison the store: no partitions land, serve sees no tombstones
      P.ivfIndexDelete(spark, a, delId = 0L, doomedIds().limit(0))
      val unmasked = serve(a)
      assert(P.ivfIndexTombstones(spark, a).isEmpty,
        "an empty batch leaves no readable tombstone set")
      P.ivfIndexDelete(spark, a, delId = 1L, doomedIds())
      val masked = serve(a)
      assert(masked != unmasked)
      P.ivfIndexDelete(spark, a, delId = 1L, doomedIds()) // at-least-once redelivery
      assert(serve(a) == masked, "same-batch redelivery must be a no-op")
      // a LATER delete batch that re-lists already-deleted ids (takedown
      // feeds overlap in practice) — readers consume the distinct union
      P.ivfIndexDelete(spark, a, delId = 2L, doomedIds().limit(3))
      assert(serve(a) == masked, "an overlapping later batch must add nothing")
    } finally rm(a)
  }

  test("compaction physically drops tombstoned rows from merged partitions and serve is unchanged") {
    import spark.implicits._
    val a = tmp("ivf_del_compact")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a)
      P.ivfIndexDelete(spark, a, delId = 1L, doomedIds())
      val masked = serve(a)
      val nDoomedBefore = spark.read.parquet(P.ivfIndexLiveDir(a))
        .filter($"vec_id" % 10 === 3).count()
      assert(nDoomedBefore > 0, "pre-compaction the tombstoned rows are still on disk")
      P.ivfIndexCompact(spark, a, upTo = 1L) // all shards merged: full physical drop
      assert(spark.read.parquet(P.ivfIndexLiveDir(a))
          .filter($"vec_id" % 10 === 3).count() == 0L,
        "full compaction must physically remove every tombstoned row")
      assert(serve(a) == masked,
        "physical removal must not change served results (the mask already hid them)")
      // the tombstone set is retained (a redelivered carried shard could
      // resurrect rows; serve must keep masking) — and health now reports
      // zero tombstoned rows physically present
      assert(new java.io.File(s"$a/tombstones").exists())
      val h = P.ivfIndexHealthOf(spark, a)
      assert(h.agg(org.apache.spark.sql.functions.sum($"n_tombstoned")).head.getLong(0) == 0L)
    } finally rm(a)
  }

  test("store-backed health equals the oracle-gated key row-for-row on the delete-rule store") {
    import spark.implicits._
    val a = tmp("ivf_health_store")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a)
      P.ivfIndexDelete(spark, a, delId = 1L, doomedIds())
      val fromStore = P.ivfIndexHealthOf(spark, a)
        .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
      val fromKey = SparkEntry.queries("q_similarity_index_health")(spark, sfDir)
        .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
      assert(fromStore.nonEmpty && fromStore == fromKey,
        s"store-backed health diverged from the key: first diff " +
          fromKey.zip(fromStore).find { case (k, st) => k != st })
    } finally rm(a)
  }

  test("health WASTED flag branches on planted deletions: a half-tombstoned cell flags, others do not") {
    import spark.implicits._
    val a = tmp("ivf_health_wasted")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a)
      // plant: tombstone HALF of one specific cell's members — >20% of the
      // cell, 0% of every other cell
      val live = spark.read.parquet(P.ivfIndexLiveDir(a))
        .select($"vec_id", $"cell".cast("long").as("cell"))
      val targetCell = live.groupBy($"cell").count()
        .orderBy($"count".desc, $"cell").head.getLong(0)
      val members = live.filter($"cell" === targetCell)
        .orderBy($"vec_id").select($"vec_id").as[Long].collect()
      val planted = members.take(members.length / 2)
      assert(planted.length * 5 > members.length, "the plant must cross the 20% threshold")
      P.ivfIndexDelete(spark, a, delId = 7L, planted.toSeq.toDF("vec_id"))
      val h = P.ivfIndexHealthOf(spark, a)
        .select($"cell", $"n_tombstoned", $"wasted")
        .as[(Long, Long, Boolean)].collect().toSeq
      val (flagged, clean) = h.partition(_._3)
      assert(flagged.map(_._1) == Seq(targetCell),
        s"exactly the planted cell must flag wasted: $h")
      assert(flagged.head._2 == planted.length.toLong)
      assert(clean.nonEmpty && clean.forall(_._2 == 0L))
    } finally rm(a)
  }

  test("a low-shard-id FIRST delivery after compaction still lands (manifest, not numeric watermark)") {
    import spark.implicits._
    val a = tmp("ivf_inflight"); val ref = tmp("ivf_inflight_ref")
    try {
      // store A: shard 1 carries half of today's data; compaction to
      // upTo=5 runs while shard 3 (the other half) is still in flight
      P.ivfIndexBuild(spark, sfDir, a)
      P.ivfIndexAppend(spark, sfDir, a, shard = 1L, slice = (2L, 0L))
      P.ivfIndexCompact(spark, a, upTo = 5L)
      assert(P.ivfIndexAbsorbed(a, "index_c5") == Set(0L, 1L))
      // shard 3 <= upTo numerically, but NOT absorbed: compaction never
      // saw its rows — the delivery must land under its own shard id
      P.ivfIndexAppend(spark, sfDir, a, shard = 3L, slice = (2L, 1L))
      val liveShards = spark.read.parquet(P.ivfIndexLiveDir(a))
        .select($"shard".cast("long")).distinct().as[Long].collect().toSet
      assert(liveShards == Set(-1L, 3L), s"shard 3 must land: $liveShards")
      // ...and a redelivery of shard 3 now overwrites itself (not absorbed)
      P.ivfIndexAppend(spark, sfDir, a, shard = 3L, slice = (2L, 1L))
      // reference store: both halves appended normally, no compaction —
      // the same vector set, so serves must be row-identical
      P.ivfIndexBuild(spark, sfDir, ref)
      P.ivfIndexAppend(spark, sfDir, ref, shard = 1L, slice = (2L, 0L))
      P.ivfIndexAppend(spark, sfDir, ref, shard = 3L, slice = (2L, 1L))
      assert(serve(a) == serve(ref),
        "the raced store must serve exactly the un-raced store's results")
    } finally { rm(a); rm(ref) }
  }

  test("append slices are dense over the odd half for any day count (even moduli included)") {
    import spark.implicits._
    // the r17 bench sliced pmod(vec_id, days) over odd-only ids, leaving
    // half of an even day-count's slices EMPTY — the fix keys the slice on
    // the dense odd index (vec_id-1)/2; every slice must carry rows and
    // the slices must partition the odd half exactly
    val a = tmp("ivf_slice")
    try {
      P.ivfIndexBuild(spark, sfDir, a)
      val days = 4
      (1 to days).foreach(i =>
        P.ivfIndexAppend(spark, sfDir, a, shard = i.toLong,
          slice = (days.toLong, (i - 1).toLong)))
      val byShard = spark.read.parquet(P.ivfIndexLiveDir(a))
        .filter($"shard" > 0).groupBy($"shard".cast("long").as("shard"))
        .count().as[(Long, Long)].collect().toMap
      assert(byShard.keySet == (1 to days).map(_.toLong).toSet,
        s"every daily slice must carry rows: $byShard")
      val odd = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter($"vec_id" % 2 =!= 0).count()
      assert(byShard.values.sum == odd, "the slices must partition the odd half")
      assert(byShard.values.max <= byShard.values.min + 1,
        s"dense slicing balances the shards: $byShard")
    } finally rm(a)
  }

  // ------------------------------------------------------------------
  // planted audio fixtures — the image tier's d=7/d=8 pigeonhole proofs
  // get their audio twin (round-17 verdict #3): energy profiles that
  // differ in EXACTLY the planted bins, independent of corpus content.
  // ------------------------------------------------------------------

  /** Texts ARE the sample bytes (the WAV synth maps UTF-8 byte x to
    * sample (x−128)·256, so ASCII-only texts keep char = byte): bin b of
    * the 64-bin energy profile is `binChars` consecutive chars — loud
    * \u0001 (s² ≈ 1.06e9) or quiet \u007f (s² = 65536, 16129× less)
    * — so bit_b = (64·E_b ≥ ΣE) is EXACTLY the planted loud mask for any
    * 1 ≤ |loud| ≤ 63. Band j of the 8×8 banding is bits 8j..8j+7.
    */
  private def clip(loudBins: Set[Int], binChars: Int = 4): String =
    (0 until 64).flatMap(b =>
      Seq.fill(binChars)(if (loudBins(b)) '\u0001' else '\u007f')).mkString

  private def writeClips(docs: Seq[(Long, Set[Int])]): String = {
    import spark.implicits._
    val dir = tmp("audio_planted")
    docs.map { case (id, bins) =>
      require(id % 2 == 1, "audioFps fingerprints odd doc_ids")
      val t = clip(bins); (id, t, "en", "fixture", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("audio near tier: planted d=7 energy profiles recalled, both d=8 exclusion paths hold") {
    import spark.implicits._
    val base = (0 until 32).toSet
    val dir = writeClips(Seq(
      1L -> base,                                            // base
      3L -> (base -- (0 to 6)),                              // d=7, all flips in band 0
      5L -> (base -- Set(0, 8, 16, 24) ++ Set(32, 40, 48)),  // d=7, flips across bands 0..6
      7L -> (base -- Set(0, 8, 16, 24) ++ Set(32, 40, 48, 56)), // d=8 spread, one flip
                                                             //   PER band: no shared band,
                                                             //   never a candidate — but
                                                             //   d=1 vs doc 5
      9L -> (base -- (0 to 7))                               // d=8 concentrated: candidate
                                                             //   via bands 1-7, cut by the
                                                             //   exact verify — d=1 vs doc 3
    ))
    try {
      val got = SparkEntry.queries("q_dedup_audio_fp_near")(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 3L, 7L), (1L, 5L, 7L), (3L, 9L, 1L), (5L, 7L, 1L)),
        s"planted audio ball must recall exactly the d<=7 pairs: $got")
      // the exact tier sees 5 distinct planted profiles, no collisions
      val fps = SparkEntry.queries("q_dedup_audio_fp")(spark, dir)
        .as[(Long, Long, Long, Long)].collect()
      assert(fps.length == 5 && fps.forall(_._4 == 1L))
    } finally rm(dir)
  }

  // ------------------------------------------------------------------
  // video perceptual tiers (round 18 — the triple's closing member)
  // ------------------------------------------------------------------

  test("video near tier: banding equals brute force at d<=7 on the real corpus") {
    import spark.implicits._
    val sf001 = "/root/testdata/sf0.01"
    val reps = SparkEntry.queries("q_dedup_video_fp")(spark, sf001)
      .select($"doc_id", $"h_hi", $"h_lo")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      i <- reps.indices; j <- (i + 1) until reps.length
      d = java.lang.Long.bitCount(reps(i)._2 ^ reps(j)._2) +
        java.lang.Long.bitCount(reps(i)._3 ^ reps(j)._3)
      if d <= 7
    } yield {
      val (a, b) = if (reps(i)._1 < reps(j)._1) (reps(i)._1, reps(j)._1)
                   else (reps(j)._1, reps(i)._1)
      (a, b, d.toLong)
    }).toSet
    val banded = SparkEntry.queries("q_dedup_video_fp_near")(spark, sf001)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"video banding must equal brute force: missed ${brute -- banded}, extra ${banded -- brute}")
    assert(brute.size >= 10, s"the corpus must exercise the video near tier (got ${brute.size})")
  }

  test("video fingerprints quarantine exactly the undecodable assets") {
    import spark.implicits._
    val sf001 = "/root/testdata/sf0.01"
    val clusters = SparkEntry.queries("q_dedup_video_fp")(spark, sf001)
      .as[(Long, Long, Long, Long)].collect()
    val nFps = clusters.map(_._4).sum
    val ids = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id").as[Long].collect()
    val decodable = ids.count(id => id % 89 != 0 && id % 97 != 0)
    assert(nFps == decodable.toLong,
      s"every decodable asset carries exactly one fingerprint: $nFps vs $decodable")
    assert(ids.exists(id => id % 89 == 0) && ids.exists(id => id % 97 == 0),
      "the corpus must contain both corruption lanes for this to certify anything")
  }

  test("deleteRecursively does not follow directory symlinks out of the tree") {
    val outside = tmp("fs_outside")
    val victim = java.nio.file.Paths.get(outside, "keep.txt")
    java.nio.file.Files.write(victim, "survives".getBytes)
    val tree = tmp("fs_tree")
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(tree, "link"), java.nio.file.Paths.get(outside))
    try {
      graft.util.Fs.deleteRecursively(tree)
      assert(!new java.io.File(tree).exists(), "the tree (and the link) are gone")
      assert(java.nio.file.Files.exists(victim),
        "content behind a symlink must never be deleted")
    } finally rm(outside)
  }
}
