package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 closures, centered on shipping the measurements round 16
  * published: the production 8×8-band image near-dup tier
  * (q_dedup_image_phash_near_b8 — the recall curve proved the 4×16
  * banding silently decays to 21.4% recall at d=10) with its planted
  * d=7 Hamming-ball pigeonhole proof and whole-corpus recall floor,
  * plus the cluster key's repoint onto the production pair graph.
  */
class Round17OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf001 = "/root/testdata/sf0.01"

  /** Texts ARE the pixel bytes (the Round14 fixture discipline): cell i
    * bright ('z'×3, lum 366) or dark (''×3, lum 3); bright counts
    * stay in [24, 40], so 64·366 ≫ ΣG ≫ 64·3 keeps every aHash bit
    * exactly the planted pattern. Band j of 8×8 banding is bits 8j..8j+7.
    */
  private def img(brightCells: Set[Int]): String =
    (0 until 64).map(i => (if (brightCells(i)) "z" else "") * 3).mkString

  private def writeImages(docs: Seq[(Long, Set[Int])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("phash_b8").toString
    docs.map { case (id, cells) =>
      val t = img(cells); (id, t, "en", "fixture", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rm(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root))
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("b8 near tier: planted d=7 Hamming-ball — pigeonhole recall at d<=7, both d=8 exclusion paths hold") {
    import spark.implicits._
    val base = (0 until 32).toSet
    val dir = writeImages(Seq(
      0L -> base,                                      // base
      2L -> (base -- (0 to 6)),                        // d=7, all flips in band 0
      4L -> (base -- Set(0, 8, 16, 24) ++ Set(32, 40, 48)), // d=7, one flip in
                                                       //   each of bands 0..6
      6L -> (base -- Set(0, 8, 16, 24) ++ Set(32, 40, 48, 56)), // d=8 vs base, one
                                                       //   flip PER band: never a
                                                       //   candidate (no shared
                                                       //   band) — but d=1 vs doc 4
      8L -> (base -- (0 to 7))                         // d=8 vs base, concentrated:
                                                       //   candidate via bands 1-7,
                                                       //   filtered by exact verify
                                                       //   — and d=1 vs doc 2
    ))
    try {
      val got = SparkEntry.queries("q_dedup_image_phash_near_b8")(spark, dir)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq((0L, 2L, 7L), (0L, 4L, 7L), (2L, 8L, 1L), (4L, 6L, 1L)),
        s"expected exactly the four planted d<=7 pairs, got $got")
      // the conservative d<=3 tier sees only the two d=1 pairs — the two
      // d=7 recompression-range pairs are exactly what it misses
      val b4 = SparkEntry.queries("q_dedup_image_phash_near")(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      assert(b4 == Set((2L, 8L, 1L), (4L, 6L, 1L)),
        s"the b=4 tier must recall only the d<=3 pairs, got $b4")
      // the cluster key rides the PRODUCTION graph: edges
      // (0,2),(0,4),(2,8),(4,6) connect everything into one component
      val clusters = SparkEntry.queries("q_dedup_image_clusters")(spark, dir)
        .as[(Long, Long)].collect().toMap
      assert(clusters == Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 6L -> 0L, 8L -> 0L),
        s"cluster labels must ride the d<=7 graph: $clusters")
    } finally rm(dir)
  }

  test("b8 near tier: banding equals brute force on the real corpus (recall floor at d<=7)") {
    import spark.implicits._
    // The pigeonhole claim verified wholesale at the PRODUCTION distance:
    // every distinct-hash pair within Hamming 7 at sf0.01 must come back
    // from the 8-band equi-join — zero missed, zero extra, distances equal.
    val reps = graft.queries.PipelineQueries
      .entries("q_dedup_image_ahash").fn(spark, sf001)
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
    val banded = SparkEntry.queries("q_dedup_image_phash_near_b8")(spark, sf001)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"b8 banding must equal brute force: missed ${brute -- banded}, extra ${banded -- brute}")
    // and the production tier genuinely widens the conservative one —
    // the d in (3, 7] stratum the recall curve measured must be non-empty
    val d4to7 = brute.count(_._3 > 3L)
    assert(d4to7 > 0, "the corpus must exercise the d=4..7 stratum the b8 tier exists for")
  }

  test("persisted index: serve-only off a prebuilt NAMED store equals the composed key — build once, serve many") {
    import spark.implicits._
    val P = graft.queries.PipelineQueries
    val sfDir = "/root/testdata/sf0.001"
    val store = java.nio.file.Files.createTempDirectory("ivf_named_store").toString
    try {
      // the lifecycle the r16 verdict said was "simulated": build+append
      // write a named store in one job; LATER jobs serve against it with
      // no training, no corpus pass, no write
      P.ivfIndexBuild(spark, sfDir, store)
      val ovKey = "spark.sql.sources.partitionOverwriteMode"
      val before = spark.conf.getAll.get(ovKey)
      P.ivfIndexAppend(spark, sfDir, store)
      // the dynamic-overwrite mode rides the WRITER, never the session
      // (the round-17 ADVICE leak): conf must be bit-identical after
      assert(spark.conf.getAll.get(ovKey) == before,
        "append must not touch the session's partitionOverwriteMode")
      val composed = P.ivfIndexServe(spark, sfDir)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      val serve1 = P.ivfIndexServeOnly(spark, sfDir, store)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      val serve2 = P.ivfIndexServeOnly(spark, sfDir, store)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(serve1.nonEmpty && serve1 == composed,
        s"serve-off-prebuilt-store diverged from the composed key: " +
          s"${composed.size} vs ${serve1.size} rows; first diff: " +
          composed.zip(serve1).find { case (a, b) => a != b })
      assert(serve2 == serve1, "repeated serves must be bit-identical")
    } finally rm(store)
  }

  test("q_multimodal_video_frames: exact decoded stats, frame-level and container-level corruption lanes both fire") {
    import spark.implicits._
    // ids planted to force all three lanes: 0 → container truncation
    // (%89), 194 → last-frame corruption (%97, not %89), 2 → clean decode
    val dir = java.nio.file.Files.createTempDirectory("mjpeg_fix").toString
    Seq(0L, 2L, 194L).map { id => (id, s"doc $id", "en", "fixture", 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val got = SparkEntry.queries("q_multimodal_video_frames")(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      // doc 0: cut before moov — one container-level -1 row
      assert(got.filter(_._1 == 0L) == Seq((0L, -1L, -1L, -1L, -1L, -1L)))
      // doc 2 (3 frames): hand-computed from pixel = 128 + 2t,
      // t_b(k) = ((2·7 + 13k + 29b) mod 128) − 64, two 8×8 blocks/frame
      assert(got.filter(_._1 == 2L) == Seq(
        (2L, 0L, 128L, 7296L, 28L, 86L),
        (2L, 1L, 128L, 10624L, 54L, 112L),
        (2L, 2L, 128L, 13952L, 80L, 138L)),
        s"clean-decode stats diverged: ${got.filter(_._1 == 2L)}")
      // doc 194 (6 frames): container parses, frames 0-4 decode, the cut
      // LAST frame routes to -1 WITHOUT discarding the container
      val d194 = got.filter(_._1 == 194L)
      assert(d194.map(_._2) == (0L to 5L),
        s"all six frame rows must surface: $d194")
      assert(d194.take(5).forall(r => r._3 == 128L && r._5 >= 0L && r._6 <= 254L),
        s"frames 0-4 must decode: $d194")
      assert(d194.last == ((194L, 5L, -1L, -1L, -1L, -1L)),
        s"the cut last frame must route to -1: ${d194.last}")
    } finally rm(dir)
  }

  test("BPE natural stop rule: training ends when no pair reaches minPairCount; poolK scales with the batch") {
    import spark.implicits._
    import graft.queries.CorpusOpsQueries
    // the ranked-pool policy the r16 verdict flagged as a fixed literal:
    // floor 64, then 4× the batch (bounded driver collect at any width)
    assert(Seq(1, 2, 16, 64, 256).map(CorpusOpsQueries.adaptivePoolK)
      == Seq(64, 64, 64, 256, 1024))
    // fixture: pair (a,a) occurs twice, (b,b) once — nothing else
    val text = "aa aa bb"
    val dir = java.nio.file.Files.createTempDirectory("bpe_stop").toString
    Seq((1L, text, "en", "fixture", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      // minPairCount=2: (a,a) merges, then the best remaining pair (b,b)
      // is a singleton — training STOPS at 1 merge, nMerges=10 is a cap
      val stopped = CorpusOpsQueries
        .bpeTrainBatched(spark, dir, nMerges = 10, batchM = 4, minPairCount = 2L)
        .as[(Long, String, String, Long)].collect().toSeq
      assert(stopped == Seq((1L, "a", "a", 2L)),
        s"stop rule must end training below the count threshold: $stopped")
      // default threshold 1: both merges happen, then the vocabulary is
      // genuinely dry (every word one symbol) — training stops at 2
      val dry = CorpusOpsQueries
        .bpeTrainBatched(spark, dir, nMerges = 10, batchM = 4)
        .as[(Long, String, String, Long)].collect().toSeq
      assert(dry == Seq((1L, "a", "a", 2L), (2L, "b", "b", 1L)),
        s"a dry vocabulary must end training cleanly: $dry")
    } finally rm(dir)
  }

  test("q_dedup_image_recall_sample: the 512-anchor md5 policy binds and the anchored curve equals brute force on a 600-rep fixture") {
    import spark.implicits._
    // 600 distinct aHash patterns (base 0..31 symmetric-difference a
    // distinct 2-subset of the 64 cells — bright count stays in [30,34]),
    // MORE reps than the 512-anchor cap, so the policy genuinely binds.
    // The test recomputes the md5 anchor order and the full anchored
    // curve brute-force, pinning policy AND slice arithmetic wholesale.
    val pairsEnum = (for { a <- 0 until 64; b <- (a + 1) until 64 } yield (a, b)).take(600)
    val base = (0 until 32).toSet
    val docs = pairsEnum.zipWithIndex.map { case ((a, b), i) =>
      (2L * i, (base -- Set(a, b)) ++ (Set(a, b) -- base))
    }
    val dir = writeImages(docs.map { case (id, cells) => (id, cells) })
    try {
      val got = SparkEntry.queries("q_dedup_image_recall_sample")(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      // expected, recomputed independently: hashes from the planted
      // patterns, anchors by (md5(doc_id), doc_id), ordered (anchor,
      // other) pairs, per-d truth + per-band-width xor-slice recall
      def hashOf(cells: Set[Int]): (Long, Long) = {
        var lo = 0L; var hi = 0L
        cells.foreach(i => if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32))
        (hi, lo)
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String =
        md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val reps = docs.map { case (id, cells) => (id, hashOf(cells)) }
      val anchors = reps.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(512)
      assert(reps.size == 600 && anchors.size == 512)
      val exp = (for {
        (ida, (ahi, alo)) <- anchors; (idb, (bhi, blo)) <- reps; if ida != idb
        xhi = ahi ^ bhi; xlo = alo ^ blo
        dd = java.lang.Long.bitCount(xhi) + java.lang.Long.bitCount(xlo)
        if dd >= 1 && dd <= 10
      } yield {
        val r2 = if (xlo == 0 || xhi == 0) 1L else 0L
        val r4 = if ((0 until 4).exists { j =>
          (if (j < 2) (xlo >>> (16 * j)) & 0xffffL else (xhi >>> (16 * (j - 2))) & 0xffffL) == 0L
        }) 1L else 0L
        val r8 = if ((0 until 8).exists { j =>
          (if (j < 4) (xlo >>> (8 * j)) & 0xffL else (xhi >>> (8 * (j - 4))) & 0xffL) == 0L
        }) 1L else 0L
        (dd.toLong, r2, r4, r8)
      }).groupBy(_._1).map { case (dd, rows) =>
        (dd, rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
      }.toSeq.sortBy(_._1)
      assert(got == exp,
        s"anchored curve diverged from the independent recomputation:\ngot $got\nexp $exp")
      assert(exp.map(_._2).sum > 0, "the fixture must exercise the d<=10 range")
    } finally rm(dir)
  }

  test("q_stream_similarity_serve equals the batch lifecycle key row-for-row") {
    import spark.implicits._
    // served results are batch-independent (each query served once,
    // whole), so the per-trigger stream must be bit-identical to the
    // composed batch key — the in-repo half of the shared-oracle claim
    val sfDir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q_similarity_index_serve")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val streamed = SparkEntry.queries("q_stream_similarity_serve")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(batch.nonEmpty && streamed == batch,
      s"stream serving diverged from the batch lifecycle: " +
        s"${batch.size} vs ${streamed.size} rows; first diff: " +
        batch.zip(streamed).find { case (a, b) => a != b })
  }

  test("index compaction: serve-identical, shard dirs collapse, pointer flip idempotent, in-flight shards carried, appends follow the live generation") {
    import spark.implicits._
    val P = graft.queries.PipelineQueries
    val sfDir = "/root/testdata/sf0.001"
    val store = java.nio.file.Files.createTempDirectory("ivf_compact_store").toString
    def shardDirs(): Map[String, Set[String]] = {
      val live = new java.io.File(P.ivfIndexLiveDir(store))
      Option(live.listFiles()).toSeq.flatten
        .filter(c => c.isDirectory && c.getName.startsWith("cell="))
        .map(c => c.getName -> Option(c.listFiles()).toSeq.flatten
          .filter(d => d.isDirectory && d.getName.startsWith("shard="))
          .map(_.getName).toSet).toMap
    }
    def serve(): Seq[(Long, Long, Long, Long, Double)] =
      P.ivfIndexServeOnly(spark, sfDir, store)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
    try {
      P.ivfIndexBuild(spark, sfDir, store) // shard 0
      P.ivfIndexAppend(spark, sfDir, store) // shard 1
      P.ivfIndexAppend(spark, sfDir, store, shard = 2L) // a second day
      val before = serve()
      assert(shardDirs().values.flatten.toSet ==
        Set("shard=0", "shard=1", "shard=2"))
      // compact shards <= 1; the in-flight shard 2 must be carried verbatim
      assert(P.ivfIndexCompact(spark, store, upTo = 1L) == "index_c1")
      assert(P.ivfIndexLiveDir(store).endsWith("/index_c1"))
      assert(serve() == before, "compaction must not change served results")
      val dirs1 = shardDirs()
      assert(dirs1.values.flatten.toSet == Set("shard=-1", "shard=2"),
        s"shards <=1 must collapse into the reserved compacted partition: $dirs1")
      assert(P.ivfIndexAbsorbed(store, "index_c1") == Set(0L, 1L))
      // at-least-once retry AFTER the flip converges as a no-op
      assert(P.ivfIndexCompact(spark, store, upTo = 1L) == "index_c1")
      assert(serve() == before)
      // chained compaction derives from the constant base — no suffix
      // accretion — and collapses everything into one partition per cell,
      // accumulating the absorbed-shard manifest across generations
      assert(P.ivfIndexCompact(spark, store, upTo = 2L) == "index_c2")
      assert(serve() == before)
      assert(P.ivfIndexAbsorbed(store, "index_c2") == Set(0L, 1L, 2L))
      val dirs2 = shardDirs()
      assert(dirs2.values.forall(_ == Set("shard=-1")),
        s"full compaction must leave one shard dir per cell: $dirs2")
      assert(dirs2.values.forall(_.size == 1))
      // the old generations are gone; only meta + the live gen + CURRENT
      val top = Option(new java.io.File(store).listFiles()).toSeq.flatten
        .map(_.getName).toSet
      assert(top == Set("meta", "index_c2", "CURRENT"), s"stale generations: $top")
      // a post-compaction append lands in the LIVE generation
      P.ivfIndexAppend(spark, sfDir, store, shard = 9L)
      assert(shardDirs().values.flatten.toSet == Set("shard=-1", "shard=9"))
      // a REDELIVERY of an absorbed shard converges as a no-op: the rows
      // already live in the compacted partition, and writing them under
      // shard=1 again would double-count every vector (round-18 ADVICE —
      // the r17 keying silently REPLACED the compacted data instead)
      val afterNine = serve()
      P.ivfIndexAppend(spark, sfDir, store) // shard 1 ∈ absorbed
      assert(shardDirs().values.flatten.toSet == Set("shard=-1", "shard=9"),
        "an absorbed shard's redelivery must not write any partition")
      assert(serve() == afterNine,
        "an absorbed shard's redelivery must not change served results")
    } finally rm(store)
  }

  test("audio near tier: the modality-agnostic banding equals brute force at d<=7 on the real corpus") {
    import spark.implicits._
    // the energy-profile fingerprints ride the SAME bandedHammingPairs as
    // the image tier — verify the pigeonhole floor wholesale on the audio
    // hash population too (distinct-fp reps, all pairs within Hamming 7)
    val reps = SparkEntry.queries("q_dedup_audio_fp")(spark, sf001)
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
    val banded = SparkEntry.queries("q_dedup_audio_fp_near")(spark, sf001)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"audio banding must equal brute force: missed ${brute -- banded}, extra ${banded -- brute}")
    assert(brute.nonEmpty, "the corpus must exercise the audio near tier")
  }

  test("bandedHammingPairs rejects parameterizations that break the pigeonhole floor") {
    import spark.implicits._
    val reps = Seq((0L, 0L, 0L)).toDF("doc_id", "h_hi", "h_lo")
    intercept[IllegalArgumentException] {
      graft.queries.PipelineQueries.bandedHammingPairs(spark, reps, 8, 8)
    }
    intercept[IllegalArgumentException] {
      graft.queries.PipelineQueries.bandedHammingPairs(spark, reps, 7, 3)
    }
  }
}
