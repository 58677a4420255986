package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusOpsQueries

/** Round-16 closures, centered on the batched BPE trainer
  * (q_bpe_train_batch): the two equivalence properties its soundness
  * argument rests on — batchM=1 IS the sequential trainer, and a
  * symbol-disjoint top applied as one batch reproduces the sequential
  * merge table — plus direct forcing of [[CorpusOpsQueries.bpeSelectBatch]]'s
  * two skip rules (shared symbol; concatenation of a selected pair), the
  * second of which closes the round-15 ADVICE's batch-soundness gap.
  */
class Round16OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf0001 = "/root/testdata/sf0.001"

  private def rmDir(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root))
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  private def writeFixture(words: Seq[String]): String = {
    import spark.implicits._
    val text = words.mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("bpe_batch").toString
    Seq((1L, text, "en", "fixture", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def seqTrainOn(dir: String): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    SparkEntry.queries("q_bpe_train")(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
  }

  private def batchTrainOn(dir: String, batchM: Int, nMerges: Int = 4): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    CorpusOpsQueries.bpeTrainBatched(spark, dir, nMerges, batchM)
      .as[(Long, String, String, Long)].collect().toSeq
  }

  test("batched BPE at batchM=1 reproduces q_bpe_train exactly at sf0.001") {
    assert(batchTrainOn(sf0001, batchM = 1) == seqTrainOn(sf0001))
  }

  test("batched BPE at batchM=1 reproduces q_bpe_train on both round-15 adversarial fixtures") {
    // the prefix-collision corpus and the a==b chain corpus — the two
    // cases that distinguish a correct greedy apply from a broken one
    // (Round15OpsSpec pins the sequential trainer's exact output on both)
    val fx1 = writeFixture(Seq.fill(10)("th") ++ Seq.fill(9)("et") ++ Seq("meth"))
    val fx2 = writeFixture(Seq.fill(4)("aaaaa") ++ Seq.fill(3)("xy"))
    assert(batchTrainOn(fx1, batchM = 1) == seqTrainOn(fx1))
    assert(batchTrainOn(fx2, batchM = 1) == seqTrainOn(fx2))
  }

  test("a symbol-disjoint top-4 applied as ONE batch (batchM=4) reproduces the sequential merge table") {
    // four pairwise-disjoint top pairs: each merge touches only its own
    // word, so one combined pass must equal four sequential iterations —
    // same picks, same counts, one ranked-pool collect instead of four
    val dir = writeFixture(
      Seq.fill(10)("ab") ++ Seq.fill(9)("cd") ++ Seq.fill(8)("ef") ++ Seq.fill(7)("gh"))
    val expected = Seq(
      (1L, "a", "b", 10L), (2L, "c", "d", 9L),
      (3L, "e", "f", 8L), (4L, "g", "h", 7L))
    assert(seqTrainOn(dir) == expected)
    assert(batchTrainOn(dir, batchM = 4) == expected)
  }

  test("q_bpe_train_batch (batchM=2) still yields the sequential table when each iteration's top-2 are disjoint") {
    // the registered key's exact configuration on a corpus where batching
    // provably cannot diverge: iteration 1 takes (a,b),(c,d); the recount
    // then surfaces (e,f),(g,h) — identical to the sequential trainer
    val dir = writeFixture(
      Seq.fill(10)("ab") ++ Seq.fill(9)("cd") ++ Seq.fill(8)("ef") ++ Seq.fill(7)("gh"))
    import spark.implicits._
    val got = SparkEntry.queries("q_bpe_train_batch")(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == seqTrainOn(dir))
  }

  test("bpeSelectBatch skips a pair sharing a symbol with an already-selected pair") {
    val pool = Seq(("a", "b", 10L), ("b", "c", 9L), ("c", "d", 8L))
    assert(CorpusOpsQueries.bpeSelectBatch(pool, batchM = 3, remaining = 10) ==
      Seq(("a", "b", 10L), ("c", "d", 8L)))
  }

  test("bpeSelectBatch skips a pair containing the CONCATENATION of an already-selected pair (the r15 ADVICE gap)") {
    // after selecting (x,y), applying it creates new 'xy' symbols — a
    // same-batch (w,'xy') replace would also merge those, so its recorded
    // count would differ from a sequential recount; the selection must
    // defer it. Both orientations (concat as right and as left symbol).
    val pool1 = Seq(("x", "y", 10L), ("w", "xy", 9L), ("u", "v", 8L))
    assert(CorpusOpsQueries.bpeSelectBatch(pool1, batchM = 3, remaining = 10) ==
      Seq(("x", "y", 10L), ("u", "v", 8L)))
    val pool2 = Seq(("x", "y", 10L), ("xy", "w", 9L), ("u", "v", 8L))
    assert(CorpusOpsQueries.bpeSelectBatch(pool2, batchM = 3, remaining = 10) ==
      Seq(("x", "y", 10L), ("u", "v", 8L)))
  }

  test("bpeSelectBatch honors the remaining-merges cap below batchM") {
    val pool = Seq(("a", "b", 10L), ("c", "d", 9L))
    assert(CorpusOpsQueries.bpeSelectBatch(pool, batchM = 4, remaining = 1) ==
      Seq(("a", "b", 10L)))
  }

  // ---- BpeBatchApply kernel: value-identity to the chained replace form.
  // Java's String.replace is the same literal left-to-right non-overlapping
  // all-occurrences replace as Spark's replace() and DuckDB's replace() —
  // the reference composition the kernel must reproduce.
  private def chainedReplace(symstr: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(symstr) { case (s, (a, b)) =>
      s.replace("|" + a + "||" + b + "|", "|" + a + b + "|")
    }

  private def kernel(symstr: String, merges: Seq[(String, String)]): String = {
    import org.apache.spark.unsafe.types.UTF8String
    graft.functions.BpeBatchApply(
      org.apache.spark.sql.catalyst.expressions.Literal(symstr),
      merges).applyMerges(UTF8String.fromString(symstr)).toString
  }

  private def wrap(word: String): String = word.map(c => s"|$c|").mkString

  test("BpeBatchApply equals the chained replace composition on adversarial merge lists") {
    val cases = Seq(
      // a==b chain: greedy wrapping must yield [aa,aa,a]
      (wrap("aaaaa"), Seq(("a", "a"))),
      // chain then merge ON the chain's output symbol
      (wrap("aaaaa"), Seq(("a", "a"), ("aa", "a"), ("aa", "aaa"))),
      // prefix collision: (e,t) must not touch 'th' inside [m,e,th]
      (wrap("meth"), Seq(("t", "h"), ("e", "t"), ("e", "th"), ("m", "eth"))),
      // a later merge consuming a symbol CREATED mid-batch — exercises the
      // presence-set update (without it, (e,th) would be wrongly skipped)
      (wrap("meth"), Seq(("t", "h"), ("e", "th"))),
      // absent symbols: merges that match nothing at all
      (wrap("xyz"), Seq(("a", "b"), ("q", "r"))),
      // single-symbol word, and a merge spanning the whole word
      (wrap("ab"), Seq(("a", "b"), ("ab", "ab"))),
      (wrap("abab"), Seq(("a", "b"), ("ab", "ab"))),
      // symbols present but never adjacent
      (wrap("axb"), Seq(("a", "b"))),
      // empty merge list
      (wrap("the"), Seq.empty[(String, String)]))
    for ((s, ms) <- cases)
      assert(kernel(s, ms) == chainedReplace(s, ms), s"input=$s merges=$ms")
  }

  test("BpeBatchApply equals the chained replace composition on the sf0.001 vocabulary under the real trained batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the actual first-iteration batch at sf0.001 (top-2 disjoint pairs),
    // replayed over every vocabulary word both ways
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val vocab = docs
      .select(explode(split($"text", " ")).as("tok"))
      .filter($"tok".rlike("^[!-{}-~]+$"))
      .select(regexp_replace($"tok", "(.)", "|$1|").as("symstr"))
      .distinct().as[String].collect()
    val merges = Seq(("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"))
    val diverged = vocab.filter(s => kernel(s, merges) != chainedReplace(s, merges))
    assert(diverged.isEmpty, s"${diverged.length} diverged, first: ${diverged.headOption}")
  }

  test("needle budget: the cap binds in md5 order, and a non-binding budget is a pass-through") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    // the first 64 mod-3 vec_ids in deterministic md5 order — the suite
    // the budgeted arm must train on and flag against
    val suite = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" % 3 === 0)
      .orderBy(md5($"vec_id".cast("string")), $"vec_id")
      .limit(64).select($"vec_id").as[Long].collect().toSet
    assert(suite.size == 64)
    val budgeted = graft.queries.PipelineQueries
      .semanticDecontamIvf(spark, sfDir, graft.operators.IvfKMeans.adaptiveNprobe, 3L, 64L)
      .select($"vec_id", $"n_id").as[(Long, Long)].collect()
    assert(budgeted.nonEmpty)
    // every reported nearest needle comes from the capped suite — the cap
    // ran BEFORE training, not as an output filter
    val outside = budgeted.filter(r => !suite.contains(r._2))
    assert(outside.isEmpty, s"argmax needles outside the budgeted suite: ${outside.take(3).toSeq}")
    // a budget the needle count never reaches changes nothing: same rows
    // as the unbudgeted adaptive arm (the cap is ORDER BY md5 LIMIT, and
    // LIMIT >= count keeps the set; training is order-independent)
    val unb = graft.queries.PipelineQueries
      .semanticDecontamIvf(spark, sfDir, graft.operators.IvfKMeans.adaptiveNprobe, 3L, Long.MaxValue)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val big = graft.queries.PipelineQueries
      .semanticDecontamIvf(spark, sfDir, graft.operators.IvfKMeans.adaptiveNprobe, 3L, 1000000L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(big == unb, "a non-binding budget must be a pass-through")
  }

  test("q_dedup_image_recall: pigeonhole floors hold exactly and recall is monotone in band count") {
    import spark.implicits._
    // b bands of 64/b bits guarantee recall 1.0 for d <= b-1 (some band
    // must be untouched); the curve may only decay PAST that floor — and
    // narrower bands (more of them) can never recall fewer pairs (a zero
    // 16-bit xor slice forces zero 8-bit sub-slices).
    val rows = SparkEntry.queries("q_dedup_image_recall")(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.exists(_._1 > 7),
      s"curve must cover the d=4-10 decay range: ${rows.map(_._1).toSeq}")
    rows.foreach { case (d, nTrue, r2, r4, r8) =>
      assert(nTrue > 0)
      if (d <= 1) assert(r2 == nTrue, s"b=2 floor broken at d=$d: $r2/$nTrue")
      if (d <= 3) assert(r4 == nTrue, s"b=4 floor broken at d=$d: $r4/$nTrue")
      if (d <= 7) assert(r8 == nTrue, s"b=8 floor broken at d=$d: $r8/$nTrue")
      assert(r2 <= r4 && r4 <= r8 && r8 <= nTrue,
        s"monotonicity broken at d=$d: $r2/$r4/$r8/$nTrue")
    }
  }

  test("q_similarity_index_serve: the stored-index scan is partition-pruned to the probed cells") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // the persisted index's serve contract: the scan carries the static
    // probed-cell PartitionFilters and reads ONLY those cells' partitions
    // — at 100 TB this is nprobe/K of the index bytes, the property that
    // makes a partitioned on-disk index an I/O win and not just a layout
    var gated = false
    // nprobe=1 over a 1552-vector fixture (K=8 cells — the sf0.001 corpus
    // trains only K=3, which 10 queries cover even at nprobe=1, making a
    // read<total gate vacuous there); the oracle hash certifies the
    // shipped width separately
    val fixDir = {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("ivf_serve_fix").toString
      (0L until 1552L).map { i =>
        (i, Array.tabulate(64)(j => (((i * 31 + j * 17) % 101) - 50).toFloat / 50f))
      }.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    try graft.queries.PipelineQueries.ivfIndexServe(spark, fixDir,
      top3 => {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
          case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
          case f: FileSourceScanExec => Seq(f)
        }.flatten
        val scans = scansOf(top3.queryExecution.executedPlan)
          .filter(_.relation.location.rootPaths
            .exists(_.toString.contains("graft_ivf_index")))
        assert(scans.nonEmpty, "expected a stored-index file scan in the serve plan")
        scans.foreach { f =>
          assert(f.partitionFilters.nonEmpty,
            s"the stored scan must carry the probed-cell partition filter:\n$f")
          val read = f.selectedPartitions.partitionCount
          // total LEAF partitions (cell=*/shard=*) on disk from the scan's
          // own root path (the index dir is still live inside the hook) —
          // partitionCount counts leaves, so the bound must too
          val root = f.relation.location.rootPaths.head.toUri.getPath
          val cellDirs = Option(new java.io.File(root).listFiles()).toSeq.flatten
            .filter(d => d.isDirectory && d.getName.startsWith("cell="))
          val total = cellDirs.map(c => Option(c.listFiles()).toSeq.flatten
            .count(d => d.isDirectory && d.getName.startsWith("shard="))).sum
          assert(total > 0, s"no cell/shard partitions under $root")
          assert(read < total,
            s"pruning must skip unprobed cells: read $read of $total leaf partitions")
        }
        gated = true
      }, nprobe = 1).collect()
    finally rmDir(fixDir)
    assert(gated, "inspect hook must run")
  }

  test("q_similarity_index_health: a planted drifted append fires the growing flag, undrifted cells stay quiet") {
    import spark.implicits._
    // even ids (the indexed half) spread pseudo-uniformly; odd ids (the
    // appended shard) all cluster near one direction — the drift the
    // audit exists to catch. Both flag branches must be live.
    val dir = java.nio.file.Files.createTempDirectory("ivf_health_fix").toString
    (0L until 1000L).map { i =>
      val v =
        if (i % 2 == 0) Array.tabulate(64)(j => (((i * 31 + j * 17) % 101) - 50).toFloat / 50f)
        else Array.tabulate(64)(j =>
          (if (j < 4) 1.0f else 0.0f) + (((i * 7 + j) % 11) - 5).toFloat / 500f)
      (i, v)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows =
      try SparkEntry.queries("q_similarity_index_health")(spark, dir)
        .as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
      finally rmDir(dir)
    assert(rows.length >= 3, s"expected several cells, got ${rows.length}")
    val growing = rows.filter(_._5)
    assert(growing.nonEmpty, s"the planted drift must fire the flag: ${rows.toSeq}")
    assert(growing.length < rows.length,
      s"undrifted cells must stay quiet: ${rows.toSeq}")
    // the drifted mass is concentrated: the flagged cells hold the large
    // majority of the appended shard (live counts — the round-18 audit
    // excludes the takedown-rule members from the indexed/appended columns)
    val appTotal = rows.map(_._3).sum
    assert(growing.map(_._3).sum * 10 > appTotal * 8,
      s"flagged cells should hold >80% of the appended mass: ${rows.toSeq}")
    // the fixture plants no takedown-rule gaps wide enough to waste a
    // cell: the deletion share is ~10% everywhere, below the 20% flag
    assert(rows.forall(!_._6), s"no fixture cell crosses the wasted bar: ${rows.toSeq}")
  }

  test("q_similarity_index_serve: an at-least-once retry of the append converges (idempotent shard overwrite)") {
    import spark.implicits._
    // the IngestDedup discipline the lifecycle claims: redelivering the
    // append shard must overwrite its own (cell, shard) partitions, not
    // double the rows — served results are bit-identical either way
    val sfDir = "/root/testdata/sf0.001"
    val once = graft.queries.PipelineQueries.ivfIndexServe(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val retried = graft.queries.PipelineQueries
      .ivfIndexServe(spark, sfDir, retryAppend = true)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(once.nonEmpty && retried == once,
      s"retry diverged: ${once.size} vs ${retried.size} rows; first diff: " +
        once.zip(retried).find { case (a, b) => a != b })
  }

  test("q_stream_decontaminate_semantic equals the batch exact arm over the same budgeted suite") {
    import spark.implicits._
    // append-mode output of a stateless stream transform = the batch
    // result: the stream twin must emit exactly the exact arm's audit
    // rows for the identical md5-capped 64-needle suite
    val sfDir = "/root/testdata/sf0.001"
    val stream = SparkEntry.queries("q_stream_decontaminate_semantic")(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val batch = graft.queries.PipelineQueries
      .semanticDecontamExact(spark, sfDir, needleMod = 3L, needleBudget = 64L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(stream.nonEmpty && stream == batch,
      s"stream/batch diverged: ${stream.size} vs ${batch.size} rows; first diff: " +
        stream.zip(batch).find { case (a, b) => a != b })
  }

  test("q_multimodal_audit's planted fixtures force all three DecodeResult lanes at the 4096-int envelope") {
    import spark.implicits._
    import graft.multimodal.{JpegCodec, Multimodal}
    val docs = (0L to 20L).map(id => (id, "x")).toDF("doc_id", "text")
    val byId = Multimodal.assetsFromDocumentsJpegAudit(spark, docs)
      .collect().map(a => a.asset_id -> a.content).toMap
    // id%7==1: structurally VALID 80×64 — 5120 plane ints exceeds the
    // audit envelope but passes the information bound, so it must route
    // Oversized (the big-asset lane), never Invalid
    assert(JpegCodec.decodeDetailed(byId(8L), maxPlaneInts = 4096L)
      == JpegCodec.DecodeResult.Oversized(5120L, 4096L))
    // ...and the SAME bytes decode fine under the default envelope —
    // proof the asset is genuinely valid, merely large
    assert(JpegCodec.decodeDetailed(byId(8L)) match {
      case JpegCodec.DecodeResult.Decoded(img) => img.width == 80 && img.height == 64
      case _ => false
    })
    // id%7==0: truncated mid-header — the corrupt lane
    assert(JpegCodec.decodeDetailed(byId(7L), maxPlaneInts = 4096L)
      == JpegCodec.DecodeResult.Invalid)
    // everything else decodes inside the envelope
    assert(JpegCodec.decodeDetailed(byId(2L), maxPlaneInts = 4096L) match {
      case JpegCodec.DecodeResult.Decoded(_) => true
      case _ => false
    })
  }

  test("q_bpe_apply's size-gated vocab join: the forced shuffle arm is bit-identical to the broadcast arm") {
    import spark.implicits._
    // Same tokenizations through BOTH join mechanisms — the degrade the
    // broadcast arm's scaladoc promises past BpeVocabBroadcastCap, proven
    // on real data (the two keys also share one oracle SQL, so the DuckDB
    // gate certifies each arm independently at sf0.01).
    val bc = SparkEntry.queries("q_bpe_apply")(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    val sh = SparkEntry.queries("q_bpe_apply_shuffle")(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(bc.nonEmpty && bc == sh,
      s"arms diverged: ${bc.size} vs ${sh.size} rows; first diff: " +
        bc.zip(sh).find { case (a, b) => a != b })
  }
}
