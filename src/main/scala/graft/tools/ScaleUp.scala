package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-factor multiplier for the TESTDATA corpus: emits
  * `factor` disjoint id-offset shards of the source tables — every shard an
  * exact copy of the source distribution with all join/graph key columns
  * offset by `shard × 10^7`, so join fan-outs, per-key frequency histograms,
  * dup fractions, and text/embedding content scale linearly while
  * cross-shard keys never collide (the reference corpus keeps every id
  * below 10^7, and pagerank's +10^6 supplier node-id shift stays inside a
  * shard's range). Dimension tables (region, nation) are fixed, TPC-H
  * style.
  *
  * Purpose: a data-dominated bench point (sf1 = 10 × sf0.1) for
  * BENCH_SCALING.md. The driver's sf ≤ 0.1 corpora are overhead-bound;
  * correctness stays oracled at sf0.01 — this data feeds wall-clock
  * scaling only. No RNG anywhere: output is byte-stable across runs.
  *
  * Layout parity with TESTDATA: one parquet FILE per table (written via a
  * temp dir, then the single part-file is moved to `<dst>/<table>.parquet`)
  * with 8 MB row groups so a 100+ MB fact table still scans with real
  * parallelism (a default 128 MB single row group would serialize the
  * scan).
  *
  * Usage: `runMain graft.tools.ScaleUp [srcDir] [dstDir] [factor] [maskSeed]`.
  * Pass a non-zero maskSeed when re-scaling ScaleUp's own output (wide-
  * branch corpora like sf4 = 4 × sf1); the shard stride is derived from
  * the source's id span automatically so pass-composed id spaces stay
  * disjoint.
  */
object ScaleUp {
  /** id-bearing columns per table; offsetting keeps intra-shard joins exact */
  val offsetCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )
  val fixedDims: Seq[String] = Seq("region", "nation")
  val ShardOffset: Long = 10000000L

  /** `stride` must clear the SOURCE's id span ([[strideFor]]): offsets
    * compose additively across ScaleUp passes, so re-scaling with the
    * default stride lands sub-shards (i,k) and (k,i) on the SAME ids —
    * 80k rows / 26k distinct vec_ids in the first sf4 attempt. The driver
    * corpora (ids < 10^7) keep the original stride, so single-pass output
    * (sf1) is byte-stable. */
  def scaleTable(spark: SparkSession, df: DataFrame, table: String, factor: Int,
      maskSeed: Int = 0, stride: Long = ShardOffset): DataFrame = {
    require(stride >= ShardOffset && stride % ShardOffset == 0,
      s"stride must be a multiple of ShardOffset covering the source id span (got $stride)")
    // The document decorrelation has only 25 distinct non-identity alphabet
    // rotations: beyond 26 shards some shard PAIR would share a rotation and
    // its cross-shard near-dup pairs would reappear — the quadratic growth
    // this transform exists to prevent. Fail loudly instead of silently
    // producing a corpus whose dup fraction no longer scales linearly.
    require(factor >= 1 && factor <= 26,
      s"ScaleUp factor must be in [1, 26] (got $factor): only 25 distinct " +
        "alphabet rotations exist for cross-shard document decorrelation; " +
        "scale further by re-running ScaleUp on its own output with a " +
        "non-zero maskSeed (arg 4). Caveat: rotations COMPOSE additively, " +
        "so past 26 total sub-shards some document sub-shard pairs " +
        "necessarily share a rotation — document DISTINCT-gram counts grow " +
        "sub-linearly from there (total gram volume still scales exactly); " +
        "embedding decorrelation stays exact via the pass-distinct mask seed")
    if (fixedDims.contains(table)) df
    else {
      import spark.implicits._
      val copies = df.crossJoin(
        broadcast(spark.range(factor.toLong).select($"id".as("__shard"))))
      val withIds = offsetCols(table)
        .foldLeft(copies)((acc, c) =>
          acc.withColumn(c, col(c) + $"__shard" * stride))
      // Content decorrelation across shards — without it every document and
      // embedding would be content-identical to its 9 shard copies, turning
      // the corpus into a degenerate 90%-duplicate set whose near-dup pair
      // count grows QUADRATICALLY in the factor (cluster sizes × factor)
      // instead of linearly like a real 10× corpus. Both transforms are
      // shard-uniform, so WITHIN-shard similarity structure (the thing the
      // dedup operators measure) is preserved exactly:
      //  - documents.text: per-shard alphabet rotation (1:1 translate —
      //    lengths, whitespace, punctuation, and within-shard shingle
      //    overlaps unchanged; cross-shard shingle overlap drops to ~0)
      //  - embeddings.embedding: per-shard deterministic sign flips
      //    (within-shard cosines exactly preserved — both vectors flip the
      //    same components; cross-shard cosine decorrelates to ~0)
      val decorrelated = table match {
        case "documents" =>
          val lower = "abcdefghijklmnopqrstuvwxyz"
          val upper = lower.toUpperCase
          // 1 + (k-1) % 25 is never 0 mod 26, so every non-zero shard gets a
          // genuine (non-identity) rotation; distinctness across shards is
          // guaranteed by the factor <= 26 precondition above
          def rot(s: String, k: Int) = {
            val r = 1 + (k - 1) % 25
            s.drop(r) + s.take(r)
          }
          (1 until factor).foldLeft(when(lit(false), $"text")) {
            case (acc, k) =>
              acc.when($"__shard" === k,
                translate($"text", lower + upper, rot(lower, k) + rot(upper, k)))
          } match {
            case chain =>
              withIds.withColumn("text", chain.otherwise($"text"))
          }
        case "embeddings" =>
          // maskSeed matters when RE-scaling ScaleUp output: composed flip
          // masks are XORs, and with the same hash both passes, sub-shards
          // (i,k) and (k,i) compose to the IDENTICAL mask — every shared
          // base vector becomes an artificial cross-shard exact duplicate
          // (2000 × 6 colliding pairs at factor 4×10 — enough to dominate
          // the dedup-pair mass). A pass-distinct seed makes second-pass
          // masks independent draws, so composed masks collide with
          // probability ~2^-64 per dimension pattern instead.
          withIds.withColumn("embedding",
            when($"__shard" === 0, $"embedding").otherwise(
              zip_with($"embedding",
                sequence(lit(0), size($"embedding") - 1),
                (x, i) =>
                  when(pmod(
                    if (maskSeed == 0) hash(i, $"__shard")
                    else hash(i, $"__shard", lit(maskSeed)), lit(2)) === 0, x)
                    .otherwise(-x))))
        case "events" =>
          // the driver source carries ns timestamps (read here as ns longs);
          // write µs TIMESTAMP — exactly the truncation every reader
          // (Tables.normalizeEventTs, the DuckDB oracle) applies anyway, and
          // it lets oracle SQL run directly against the scaled corpus. A
          // ScaleUp-produced source (re-scaling .localdata output, the
          // sanctioned way past factor 26) is already µs TIMESTAMP — keep it.
          if (withIds.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            withIds.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          else withIds
        case _ => withIds
      }
      decorrelated.drop("__shard")
    }
  }

  /** Smallest ShardOffset multiple strictly above every id the offset
    * columns carry — the stride that keeps a further ScaleUp pass's id
    * spaces disjoint from the source's. */
  def strideFor(spark: SparkSession, src: String): Long = {
    val maxId = offsetCols.toSeq.flatMap { case (t, cols) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      cols.map(c => df.agg(max(col(c).cast("long"))).head().getLong(0))
    }.max
    ShardOffset * (maxId / ShardOffset + 1)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/.localdata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // Non-zero when RE-scaling ScaleUp output (see the embeddings branch);
    // 0 keeps the original sf1 corpus byte-stable.
    val maskSeed = args.lift(3).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is ns parquet; read as long (written back as long — the
      // Tables.normalizeEventTs accessor handles both representations)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dstPath = java.nio.file.Paths.get(dst)
    java.nio.file.Files.createDirectories(dstPath)
    // One stride for ALL tables (cross-table joins must offset in lockstep),
    // derived from the source's actual id span: ShardOffset for the driver
    // corpora (sf1 output stays byte-stable), 10 × ShardOffset when
    // re-scaling sf1, and so on.
    val stride = strideFor(spark, src)
    println(s"[scaleup] stride=$stride (source id span)")
    (fixedDims ++ offsetCols.keys.toSeq.sorted).foreach { t =>
      val out = scaleTable(spark, spark.read.parquet(s"$src/$t.parquet"), t, factor, maskSeed, stride)
      val tmp = dstPath.resolve(s"__tmp_$t")
      out.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (8 * 1024 * 1024).toString)
        .parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part =
        try {
          val found = listing.filter(p =>
            p.getFileName.toString.startsWith("part-")).findFirst()
          if (!found.isPresent)
            throw new IllegalStateException(
              s"parquet write for table '$t' produced no part- file under $tmp")
          found.get()
        } finally listing.close()
      java.nio.file.Files.move(part, dstPath.resolve(s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
      }
      rmTree(tmp.toFile)
      println(s"[scaleup] $t -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
