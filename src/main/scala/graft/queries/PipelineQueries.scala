package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._

/** LLM-data-pipeline operators over `documents` / `embeddings`: dedup (exact,
  * fingerprint, MinHash+LSH), similarity search, text analysis, fingerprinting.
  *
  * Scale notes:
  * - exact / fingerprint dedup: one hash-groupBy shuffle on a 32-byte key —
  *   the canonical 100 TB exact-dedup shape.
  * - MinHash+LSH: signatures are computed per-doc (map-only), candidates come
  *   from an equi-join on (band, band_key) — never an all-pairs product. The
  *   verify step re-checks true Jaccard on candidates only.
  * - similarity: the query side is a tiny broadcast; candidates stream past it
  *   map-side, top-k via per-partition window. Brute-force is the exact
  *   baseline; the LSH-bucketed variant bounds candidates at scale.
  * All hashing is md5-based so DuckDB reproduces signatures bit-for-bit.
  */
object PipelineQueries {

  /** Fixed affine-hash coefficients for the 16 minhash functions
    * ((a*h + b) mod 2^31-1); literal in both the Spark plan and the oracle
    * SQL so signatures reproduce bit-for-bit.
    */
  val lshA: Seq[Long] = Seq(
    1103515245L, 1588635695L, 1203248318L, 1739049700L,
    1357014125L, 1185371942L, 1973594899L, 1129580573L,
    1790575337L, 1236486949L, 1431529177L, 1863225301L,
    1076943109L, 1518932171L, 1343714473L, 1654988357L)
  val lshB: Seq[Long] = Seq(
    12345L, 386724701L, 175692913L, 297764501L,
    523456787L, 88811113L, 734567891L, 419326181L,
    650001233L, 911117773L, 137426953L, 805306457L,
    268435459L, 577007813L, 94906249L, 350011421L)

  /** Extension coefficients for hyperplanes 16–63 of the MULTI-WORD
    * signature (round 19: the 100 TB path past the single-long 16-plane
    * cap). Word 0 keeps the original [[lshA]]/[[lshB]] planes bit-for-bit
    * (so every ≤16-bit banding result is unchanged); words 1–3 draw from
    * these. Fixed literals for the same reason as lshA/lshB: the DuckDB
    * oracle rebuilds identical planes. All 64 (A mod 1009, B mod 1009)
    * pairs are distinct (no duplicate plane directions) and no A ≡ 0 mod
    * 1009 (no constant-weight plane); the 64×64 plane-weight matrix over
    * a 64-dim vector is verified invertible, which is what lets the
    * recall-floor spec PLANT vectors with exact target sign patterns.
    */
  val lshAExt: Seq[Long] = Seq(
    1727058325L, 1842792145L, 1558846283L, 1549210032L,
    1422554628L, 1568223019L, 1627823385L, 1638875957L,
    1115607454L, 1442238308L, 1287667076L, 1115581795L,
    1349502680L, 1334003581L, 1611216808L, 1216499564L,
    1076007735L, 1217488585L, 1582443302L, 1417215069L,
    1787558036L, 1862278609L, 1444998977L, 1106685281L,
    1781678552L, 1811387113L, 1425269760L, 1706832748L,
    1612823753L, 1539341537L, 1170208763L, 1684051696L,
    1250011432L, 1585459807L, 1785310335L, 1860576415L,
    1419060077L, 1148759959L, 1672503091L, 1112358342L,
    1757374380L, 1007467760L, 1972712920L, 1637945190L,
    1558533585L, 1885394257L, 1530430548L, 1459883771L)
  val lshBExt: Seq[Long] = Seq(
    56443419L, 971440226L, 139588228L, 224208618L,
    382769699L, 320703243L, 169192736L, 290330986L,
    289642307L, 361507651L, 906047282L, 840324714L,
    973362717L, 34546404L, 673146751L, 953975282L,
    998272380L, 132290152L, 499204266L, 939962034L,
    89136510L, 115754411L, 28041650L, 631800973L,
    464385930L, 925683325L, 482769975L, 331103328L,
    992359385L, 905293309L, 860363817L, 446361232L,
    841820094L, 629118518L, 125661137L, 232615032L,
    215635965L, 154584040L, 539679856L, 597568187L,
    501848250L, 498015511L, 525132438L, 138632917L,
    525603755L, 546942128L, 406287529L, 972365952L)

  /** One Lloyd iteration as oracle CTEs: `c$k` (cid, cv, cnrm) → `c${k+1}`.
    * The SQL twin of one [[graft.operators.IvfKMeans.train]] pass — same
    * 6-dp cosine argmax with lowest-cid tiebreak, same decimal(38,12)
    * exact sums divided as doubles and rounded to 6 dp.
    */
  private[queries] def lloydIterSql(k: Int): String =
    s"""asg$k AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT n.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |        ROUND(list_sum(list_transform(range(1, 65), i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) DESC,
       |        c.cid) AS rk
       |    FROM n, c$k c) WHERE rk = 1),
       |m$k AS (
       |  SELECT a.cell AS cid, r.i,
       |    ROUND(CAST(SUM(CAST(n.v[r.i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mx
       |  FROM asg$k a JOIN n USING (vec_id), range(1, 65) r(i)
       |  GROUP BY a.cell, r.i),
       |c${k + 1} AS (
       |  SELECT cid, list(mx ORDER BY i) AS cv,
       |    sqrt(list_sum(list_transform(list(mx ORDER BY i), x -> x * x))) AS cnrm
       |  FROM m$k GROUP BY cid)""".stripMargin

  /** Embedding near-dup candidate pairs (id_a < id_b, exact cos4 ≥ 0.45),
    * shared by `q_dedup_embedding` (reports pairs) and `q_dedup_clusters`
    * (connected components over them). Bands carry only ids: the self-join
    * and pair-dedup shuffle 3 longs per row; the 64-double vectors re-attach
    * after dedup via the persisted e (at 100 TB this is the difference
    * between shuffling keys and shuffling payloads).
    *
    * Band WIDTH is occupancy-adaptive: with a fixed `bits` per band, bucket
    * occupancy is n / 2^bits — linear in the corpus — so candidate pairs
    * (Σ occupancy² per bucket) grow QUADRATICALLY at fixed bits. Measured at
    * the sf1 data point: 4-bit bands took 62 s for 10× the sf0.1 data (a
    * 62× blow-up, exactly the all-pairs shape banding exists to avoid). The
    * policy splits the 16-plane signature into bands of 4, 8, or 16 bits as
    * the corpus grows (thresholds keep expected occupancy ≤ ~256), which
    * keeps candidate generation near-linear. The recall trade is the
    * textbook one: wider bands lower hit probability at FIXED similarity
    * (p^bits per band), concentrating recall on genuinely-similar pairs —
    * true near-dups (cos ≥ 0.9, p ≈ 0.93 per plane) stay findable at every
    * width, while weak 0.45-cosine pairs are only exhaustively enumerable
    * at small n. Beyond ~10⁶ vectors the 16-plane signature's widest
    * banding saturates; the policy then switches to the MULTI-WORD
    * signature (round 19 — [[graft.functions.HyperplaneSigWords]]: 4×16
    * planes as array<long>) and bands of 24 or 32 bits, each band drawn
    * from a disjoint 32-plane block (2 bands — the classic multi-table
    * sign-LSH layout), which holds expected occupancy ≤ ~256 out to
    * n ≈ 2^40. Word 0 of the multi-word signature is bit-identical to the
    * single-long signature, so every ≤16-bit result is unchanged. The
    * oracle COMPUTES THE SAME POLICY in SQL (count-driven CTE, see
    * [[embPairsCtes]]), so engine and oracle agree at every scale — the
    * sf1 replay runs the 8-bit branch on both sides, with no N/A
    * divergence point anywhere.
    *
    * `bandBits` pins the band width explicitly (4, 8, 16, 24 or 32),
    * making the adaptive policy an overridable DEFAULT rather than an
    * implicit function of corpus size: a correctness harness can hold
    * 4-bit semantics at any scale (accepting the quadratic candidate cost
    * that entails) or exercise the multi-word path at small n (the
    * `q_dedup_embedding_w24`/`_w32` keys gate it through DuckDB at every
    * sf), so the oracle divergence above the 4-bit threshold is opt-in,
    * not silent — and results stop being a discontinuous function of a
    * single insert crossing an occupancy threshold when the caller pins a
    * width.
    */
  private[graft] def embeddingDupPairs(
      s: SparkSession, d: String, bandBits: Option[Int] = None): DataFrame = {
    import s.implicits._
    bandBits.foreach(b => require(Set(4, 8, 16, 24, 32)(b),
      s"bandBits must be 4/8/16 (single-word) or 24/32 (multi-word); got $b"))
    val base = embeddings(s, d)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    // the width decides which signature column exists, so the adaptive
    // default counts first (a column-pruned parquet scan — cheap) rather
    // than computing 4× the planes on the common single-word path; the
    // count runs ONLY on that default branch — pinned-width callers (the
    // w24/w32 keys, the planted-recall specs) skip the scan job entirely
    // (round-19 ADVICE)
    val bits = bandBits.getOrElse {
      val n = base.count()
      if (n <= 4096L) 4 else if (n <= 65536L) 8
      else if (n <= 16777216L) 16 else if (n <= 268435456L) 24 else 32
    }
    val e = (if (bits <= 16)
        base.withColumn("sig16", graft.functions.LshFunctions.hyperplaneSig(s, $"v"))
      else
        base.withColumn("sigw", graft.functions.LshFunctions.hyperplaneSigWords($"v", 4)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = (if (bits <= 16) {
      val nBands = 16 / bits
      e.select($"vec_id",
        explode(expr(
          s"transform(sequence(0, ${nBands - 1}), b -> struct(b AS band, shiftright(sig16, b * $bits) % ${1 << bits} AS bkey))")).as("bb"))
    } else {
      // 2 bands over disjoint 32-plane blocks: band b = word 2b's 16
      // planes + the low (bits-16) planes of word 2b+1, packed into one
      // ≤32-bit key (words carry ≤16 bits, so no shift ever nears 63 —
      // the DuckDB overflow rule)
      e.select($"vec_id",
        explode(expr(
          s"transform(sequence(0, 1), b -> struct(b AS band, sigw[2*b] + (sigw[2*b+1] % ${1L << (bits - 16)}) * 65536 AS bkey))")).as("bb"))
    }).select($"vec_id", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
    val cand = bands.select($"vec_id".as("id_a"), $"band", $"bkey")
      .join(bands.select($"vec_id".as("id_b"), $"band", $"bkey"), Seq("band", "bkey"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct()
    val pairs = cand
      .join(e.select($"vec_id".as("id_a"), $"v".as("va")), Seq("id_a"))
      .join(e.select($"vec_id".as("id_b"), $"v".as("vb")), Seq("id_b"))
      .withColumn("cos4", round(graft.functions.CosineSimilarity.cosineSim(s, $"va", $"vb"), 4))
      .filter($"cos4" >= 0.45)
      .select($"id_a", $"id_b", $"cos4")
      // materialize the verified pair list (tiny: true near-dups) once,
      // then release the corpus-sized signature cache — callers (pairs
      // report, clustering, canonicalization) consume only `pairs`, and a
      // leaked MEMORY_AND_DISK block would otherwise live for the session
      // (the pagerank lesson; CacheHygieneSpec pins this)
      .localCheckpoint()
    e.unpersist(blocking = false)
    pairs
  }

  /** Oracle-side CTE chain producing `scored (id_a, id_b, cos4)` — the SQL
    * twin of [[embeddingDupPairs]] (before the ≥ 0.45 threshold), shared by
    * the pair-reporting and clustering oracles, parameterized by the `pol`
    * CTE body so the pinned-width keys (`q_dedup_embedding_w24`/`_w32`)
    * replay the multi-word path through the SAME chain.
    *
    * The signature is computed SET-BASED, not as nested lambdas: plane
    * weights materialize ONCE in `pw` (≤64 rows of 64-dim weight lists —
    * the same exact integers-as-doubles the engine kernel derives), the
    * `dots` cross join evaluates each (vector, plane) dot product as the
    * identical left-to-right `list_sum` fold the engine runs, and words
    * pack by grouped bit-OR (SUM of disjoint powers of two). The first
    * nested-lambda formulation recomputed the modular weight arithmetic
    * per (vector, word, plane, dim) — measured 38+ min for the w24 oracle
    * at sf1 vs 2.3 s for this form, byte-identical output. The plane
    * count is policy arithmetic (16 planes on ≤16-bit branches, 64 on
    * multi-word), so the common adaptive oracle pays no 4× cost; planes
    * 1–16 are the original lshA/lshB, so word 0 equals the old sig16
    * bit-for-bit. Band keys: ≤16 bits slice word 0 as before; 24/32 bits
    * pack word 2b + the low (bits−16) planes of word 2b+1 (every shift
    * ≤ 32 — far below DuckDB's 63-bit overflow check).
    */
  private def embPairsCtesWith(polSelect: String): String =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |pol AS ($polSelect),
       |pw AS (
       |  SELECT p.p AS p,
       |    list_transform(range(0, 64), i ->
       |      CAST((([${(PipelineQueries.lshA ++ PipelineQueries.lshAExt).mkString(",")}]::BIGINT[])[p.p + 1] * (i + 1)
       |          + ([${(PipelineQueries.lshB ++ PipelineQueries.lshBExt).mkString(",")}]::BIGINT[])[p.p + 1]) % 1009 - 504 AS DOUBLE)) AS w
       |  FROM (SELECT unnest(range(0, 64)) AS p) p
       |  WHERE p.p < CASE WHEN (SELECT bits FROM pol) <= 16 THEN 16 ELSE 64 END),
       |dots AS (
       |  SELECT e.vec_id, pw.p,
       |    list_sum(list_transform(range(1, 65), i -> e.v[i] * pw.w[i])) AS dot
       |  FROM e, pw),
       |bw AS (
       |  SELECT vec_id, p // 16 AS wd,
       |    CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << (p % 16)) ELSE 0 END) AS BIGINT) AS word
       |  FROM dots GROUP BY vec_id, p // 16),
       |b AS (SELECT vec_id, list(word ORDER BY wd) AS sw FROM bw GROUP BY vec_id),
       |bands AS (
       |  SELECT vec_id, t.b AS band,
       |    CASE WHEN (SELECT bits FROM pol) <= 16
       |         THEN (sw[1] >> (t.b * (SELECT bits FROM pol))) % (1::BIGINT << (SELECT bits FROM pol))
       |         ELSE sw[2 * t.b + 1] + (sw[2 * t.b + 2] % (1::BIGINT << ((SELECT bits FROM pol) - 16))) * 65536
       |    END AS bkey
       |  FROM b, (SELECT unnest(range(0, 4)) AS b) t
       |  WHERE t.b < CASE WHEN (SELECT bits FROM pol) <= 16
       |                   THEN 16 // (SELECT bits FROM pol) ELSE 2 END),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |scored AS (
       |  SELECT id_a, id_b,
       |    ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * c.v[i])) / (a.nrm * c.nrm), 4) AS cos4
       |  FROM cand JOIN n a ON a.vec_id = id_a JOIN n c ON c.vec_id = id_b)""".stripMargin

  /** The adaptive instance — COMPUTES THE SAME occupancy-adaptive
    * band-width policy as the engine (4/8/16/24/32 bits by corpus count)
    * — the bloomPolicyBits pattern: because the policy is pure arithmetic
    * on a COUNT, oracle and engine agree at EVERY scale, with no
    * pinned-constant divergence point. (The pinned 4-bit oracle this
    * replaced was itself quadratic past sf0.1 — DuckDB exceeded 110 GB on
    * the sf1 candidate set the adaptive widths avoid.)
    */
  private val embPairsCtes: String = embPairsCtesWith(
    """SELECT CASE WHEN COUNT(*) <= 4096 THEN 4
      |            WHEN COUNT(*) <= 65536 THEN 8
      |            WHEN COUNT(*) <= 16777216 THEN 16
      |            WHEN COUNT(*) <= 268435456 THEN 24
      |            ELSE 32 END AS bits
      |FROM e""".stripMargin)

  /** Distinct word 5-grams per document (docs under 5 tokens drop) — the
    * shared shingling of the decontamination shapes: map-only explode, no
    * shuffle of its own.
    */
  private def grams5(df: DataFrame): DataFrame = df
    .select(col("doc_id"), split(col("text"), " ").as("tok"))
    .filter(size(col("tok")) >= 5)
    // fused gram assembly (element-identical to Q.grams5Sql — Round11OpsSpec)
    .select(col("doc_id"),
      explode(graft.functions.Grams5.grams5(df.sparkSession, col("tok"))).as("g"))

  /** Bloom-filter decontamination (the engine behind `q_decontaminate_bloom`).
    *
    * The bitmap SIZE is occupancy-adaptive — the same policy family as the
    * LSH band widths: a FIXED 2^16-bit filter saturates once the benchmark
    * outgrows it (measured at sf1: 80,735 grams × 2 bits into 65,536 →
    * ~86% bits set → the probe flagged ALL 48,386 corpus docs, 98% false
    * positives — parity with the oracle held, usefulness didn't). The
    * policy keeps ≥64 bits per benchmark gram: m = max(2^16,
    * next-pow2(64·n)), which pins the k=2 PER-GRAM false-positive rate at
    * (1−e^(−1/32))² ≈ 1e-3 — chosen at the DOC level: a 50-gram document
    * probes 50 times, so per-gram 1e-3 ≈ 5% worst-case doc-level false
    * flags (per-gram 1.4% would compound to ~50%, uselessly aggressive
    * false-dropping). Capped at 2^32 (the probes are 32-bit md5
    * words); past ~2^28 grams the extension is wider hashes (more md5
    * hex), not a denser filter. Because the sizing rule is pure arithmetic
    * on the benchmark gram count, the DuckDB oracle COMPUTES THE SAME
    * POLICY in SQL — unlike the pinned-band-width trio there is no scale
    * point where oracle and engine diverge.
    *
    * Probe mechanism switches on bitmap size:
    *  - ≤ `LiteralProbeMaxWords` (2^20 bits = 133 KB): the bitmap bakes
    *    into the plan as a literal array → MAP-ONLY codegen'd bit tests,
    *    no join, no corpus shuffle.
    *  - beyond: two broadcast left-outer joins on the 63-bit word index —
    *    still no corpus shuffle, and the broadcast is the words table
    *    (m/63 rows), bounded by the policy at ~2 MB per 2^27 bits.
    * Both mechanisms are row-identical (spec-proven via `forceJoinProbe`).
    *
    * `mBitsOverride` pins the bitmap size explicitly (a power of two), the
    * same opt-out the band-width policy exposes.
    *
    * `fastHash = true` is the PRODUCTION hash path: the two probe values
    * come from seeded codegen'd xxhash64 instead of md5-hex words. md5 is
    * only the cross-engine parity contract (DuckDB must rebuild the
    * identical bitmap); a deployment that doesn't need DuckDB-reproducible
    * flags gets the same plan, the same false-negative-free guarantee, and
    * the same sizing policy with a cheaper probe (measured via
    * `graft.tools.BloomHashBench` at sf1: 8.0 s → 5.6 s, 1.42× — the hash
    * is real but NOT dominant; the gram explode and aggregates are the
    * floor, so the old "3-5× cheaper" folklore overstated it). Flagged docs
    * can differ ONLY in the false-positive minority (different hash,
    * different collisions); exact_hit rows are hash-independent.
    */
  private[graft] def bloomDecontaminate(
      s: SparkSession,
      d: String,
      mBitsOverride: Option[Long] = None,
      forceJoinProbe: Boolean = false,
      fastHash: Boolean = false
  ): DataFrame = {
    import s.implicits._
    mBitsOverride.foreach(m => require(m >= 64 && (m & (m - 1)) == 0 && m <= (1L << 32),
      s"mBitsOverride must be a power of two in [64, 2^32] (got $m)"))
    val benchGrams = grams5(documents(s, d).filter(pmod($"doc_id", lit(31)) === 0))
      .select($"g").distinct()
      // used three times (sizing count, bitmap build, exact-hit arm) and
      // bounded by the BENCHMARK gram set: materialize once as an eager
      // checkpoint — a persist here outlived the fn because the returned
      // plan's exact-hit arm reads it (CacheHygieneSpec pins no-residue)
      .localCheckpoint()
    val nGrams = benchGrams.count()
    val mBits = mBitsOverride.getOrElse(bloomPolicyBits(nGrams))
    // two probe hashes per gram: md5 hex words (oracle-reproducible) or
    // seeded xxhash64 (production; mBits is a power of two ≤ 2^32 so the
    // pmod keeps the same uniformity)
    def hashes(g: org.apache.spark.sql.Column): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
      (pmod(xxhash64(g), lit(mBits)), pmod(xxhash64(lit(1), g), lit(mBits)))
    // md5 arm: the fused BloomPair kernel emits [h1, h2] straight from the
    // digest bytes — bit-identical to the former
    // conv(substring(md5(g), 1|9, 8), 16, 10) % mBits pair (the
    // BloomBcAnyHit identity; Round11OpsSpec pins it), skipping the hex
    // string + two substrings + two conv parses per gram
    val pairCol = graft.functions.BloomPair.bloomPair(s, $"g", mBits)
    val wordsDf = {
      val bits =
        if (fastHash) { val (b1, b2) = hashes($"g"); explode(array(b1, b2)) }
        else explode(pairCol)
      benchGrams
        .select(bits.as("bit"))
        .groupBy(expr("bit div 63").as("w"))
        .agg(expr("bit_or(shiftleft(1L, CAST(bit % 63 AS INT)))").as("word"))
    }
    val probeBase = {
      val base = grams5(documents(s, d).filter(pmod($"doc_id", lit(31)) =!= 0))
      if (fastHash) {
        val (p1, p2) = hashes($"g")
        base.withColumn("h1", p1).withColumn("h2", p2)
      } else base
        // own projection: the kernel is non-cheap and referenced twice, so
        // CollapseProject keeps it materialized once per gram
        .withColumn("hp", pairCol)
        .select($"doc_id", $"g",
          element_at($"hp", 1).as("h1"), element_at($"hp", 2).as("h2"))
    }
    val nWords = ((mBits + 62) / 63).toInt
    val probed =
      if (nWords <= LiteralProbeMaxWords && !forceJoinProbe) {
        val words = Array.fill(nWords)(0L)
        wordsDf.collect() // bounded: ≤ nWords ≤ 2^20/63 rows, 16 B each
          .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
        // ONE Literal node holding the whole array — a CreateArray of 16k
        // child literals costs measurable analysis + constant folding on
        // every plan construction (benched +50% on this query at sf0.1)
        val bm = typedlit(words.toIndexedSeq)
        probeBase.withColumn("bloom_g",
          (element_at(bm, ($"h1" / 63).cast("int") + 1)
            .bitwiseAND(expr("shiftleft(1L, CAST(h1 % 63 AS INT))")) =!= 0) &&
          (element_at(bm, ($"h2" / 63).cast("int") + 1)
            .bitwiseAND(expr("shiftleft(1L, CAST(h2 % 63 AS INT))")) =!= 0))
      } else {
        probeBase
          .withColumn("w1", expr("h1 div 63"))
          .withColumn("w2", expr("h2 div 63"))
          .join(broadcast(wordsDf.select($"w".as("w1"), $"word".as("word1"))),
            Seq("w1"), "left_outer")
          .join(broadcast(wordsDf.select($"w".as("w2"), $"word".as("word2"))),
            Seq("w2"), "left_outer")
          .withColumn("bloom_g",
            (coalesce($"word1", lit(0L))
              .bitwiseAND(expr("shiftleft(1L, CAST(h1 % 63 AS INT))")) =!= 0) &&
            (coalesce($"word2", lit(0L))
              .bitwiseAND(expr("shiftleft(1L, CAST(h2 % 63 AS INT))")) =!= 0))
      }
    probed
      .join(broadcast(benchGrams.withColumn("bench_g", lit(true))),
        Seq("g"), "left_outer")
      .groupBy($"doc_id")
      .agg(sum(when($"bloom_g", 1L).otherwise(0L)).as("n_bloom_grams"),
        expr("bool_or(bloom_g)").as("bloom_hit"),
        expr("bool_or(coalesce(bench_g, false))").as("exact_hit"))
      .filter($"bloom_hit" || $"exact_hit")
      .select($"doc_id", $"n_bloom_grams", $"bloom_hit", $"exact_hit")
      .orderBy($"doc_id")
  }

  /** Literal-probe cap: 2^20 bits / 63 ≈ 16.6k words ≈ 133 KB of plan
    * literals (folded once by ConstantFolding). Beyond this the bitmap
    * probes via broadcast word-index joins instead of plan literals —
    * multi-MB array literals are where analysis/codegen plan size hurts.
    */
  private[graft] val LiteralProbeMaxWords: Int = (((1L << 20) + 62) / 63).toInt

  /** The occupancy-adaptive bitmap sizing policy: ≥64 bits per benchmark
    * gram (next power of two), floored at 2^16, capped at 2^32 — see
    * [[bloomDecontaminate]] for the derivation and the saturation
    * measurement that forced it.
    */
  private[graft] def bloomPolicyBits(nGrams: Long): Long = {
    var m = 1L << 16
    while (m < 64L * nGrams && m < (1L << 32)) m <<= 1
    m
  }

  /** Collects the benchmark Bloom bitmap as a words array (md5 probe
    * hashes, 63-bit words): the broadcast-sketch form the STREAMING
    * decontamination filter bakes into its stateless plan. Unlike the
    * batch probe there is no join fallback past [[LiteralProbeMaxWords]] —
    * a stateless stream projection cannot probe via joins — so the literal
    * grows with the policy (1 MB at sf1's 2^23 bits; past ~2^27 bits the
    * production stream path is a broadcast-variable filter UDF, not a plan
    * literal). Returns (mBits, words).
    */
  private[graft] def benchBloomWords(s: SparkSession, d: String): (Long, Array[Long]) = {
    import s.implicits._
    val benchGrams = grams5(documents(s, d).filter(pmod($"doc_id", lit(31)) === 0))
      .select($"g").distinct()
    val mBits = bloomPolicyBits(benchGrams.count())
    // Literal contract: this accessor's result is DESTINED for a plan
    // literal, so it keeps the 2^27 fail-fast. The production path beyond
    // (broadcast-variable probe) is streamBloomGate, which auto-selects.
    require(mBits <= (1L << 27),
      s"benchBloomWords: policy sized the bitmap at $mBits bits (> 2^27); " +
        "a plan-literal bitmap this large is not viable — use " +
        "streamBloomGate, whose broadcast-variable branch covers this scale")
    (mBits, collectBloomWords(benchGrams, mBits))
  }

  /** Bitmap build shared by every probe mechanism: md5-word bits OR'd into
    * 63-bit words, collected to one driver array. Bounded by the words that
    * are actually SET (≤ 2·nGrams rows over the wire); the dense array is
    * ≤ 545 MB at the policy's 2^32 cap — the driver must hold one copy,
    * which is exactly the broadcast-variable production requirement.
    */
  private[graft] def collectBloomWords(benchGrams: DataFrame, mBits: Long): Array[Long] = {
    import benchGrams.sparkSession.implicits._
    val words = Array.fill(((mBits + 62) / 63).toInt)(0L)
    benchGrams
      // fused digest-bytes pair — bit-identical to the former
      // conv(substring(md5, 1|9, 8)) % mBits (see bloomDecontaminate)
      .select(explode(graft.functions.BloomPair.bloomPair(
        benchGrams.sparkSession, $"g", mBits)).as("bit"))
      .groupBy(expr("bit div 63").as("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(bit % 63 AS INT)))").as("word"))
      .collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** The STREAM-side decontamination gate with its mechanism policy: builds
    * the benchmark Bloom bitmap and returns a closure mapping a gram-array
    * column to the any-hit boolean, choosing the probe mechanism by size —
    *  - mBits ≤ 2^18: plan-literal bitmap + `exists` bit tests (map-only,
    *    the round-7 stateless-stream shape — fine while the bitmap is small
    *    enough that the interpreted per-gram lambda doesn't matter);
    *  - beyond (or `forceBroadcast`): [[graft.functions.BloomBcProbe]] — the
    *    words array ships as a TorrentBroadcast and a codegen'd expression
    *    probes it per doc. Same hashes, same words, row-identical flags
    *    (Round11OpsSpec proves bit-parity at a forced 2^28; the oracle-gated
    *    q_stream_decontaminate_bc key forces this branch at every sf).
    * The threshold is MEASURED, not a viability cliff: the broadcast probe
    * is faster wherever tried — 1.47 vs 2.09 s at 2^20 bits (sf0.1), 6.75
    * vs 10.87 s at 2^23 (sf1) — because the compiled any-hit loop beats the
    * interpreted `exists` lambda's per-gram expression walk; the literal's
    * hard viability ceiling (driver/plan cost, formerly the 2^27 fail-fast)
    * sits far above the point where it stops winning. 2^18 keeps the tiny
    * test corpora (sf ≤ 0.01) on the literal so the driver's sf0.01 gate
    * exercises BOTH mechanisms (default literal + forced broadcast twin).
    * `mBitsOverride` pins the size (testing / deployment opt-out), same as
    * the batch probe's override.
    */
  private[graft] def streamBloomGate(
      s: SparkSession,
      d: String,
      forceBroadcast: Boolean = false,
      mBitsOverride: Option[Long] = None
  ): (Long, org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    import s.implicits._
    mBitsOverride.foreach(m => require(m >= 64 && (m & (m - 1)) == 0 && m <= (1L << 32),
      s"mBitsOverride must be a power of two in [64, 2^32] (got $m)"))
    val benchGrams = grams5(documents(s, d).filter(pmod($"doc_id", lit(31)) === 0))
      .select($"g").distinct()
      // two passes are inherent (the policy count must fix mBits BEFORE
      // the words hash with it) — persist so the gram explode runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mBits = mBitsOverride.getOrElse(bloomPolicyBits(benchGrams.count()))
    val words = collectBloomWords(benchGrams, mBits)
    benchGrams.unpersist(blocking = false)
    if (!forceBroadcast && mBits <= (1L << 18)) {
      val bm = typedlit(words.toIndexedSeq)
      // dynamic 1L << (h % 63) as a 63-entry mask literal — the Scala DSL
      // shiftleft only takes a literal shift, and a lambda-bound column
      // can't ride an expr() string
      val masks = typedlit((0 until 63).map(1L << _))
      def bitTest(h: org.apache.spark.sql.Column) =
        element_at(bm, (h / 63).cast("int") + 1)
          .bitwiseAND(element_at(masks, (h % 63).cast("int") + 1)) =!= 0
      def hw(g: org.apache.spark.sql.Column, off: Int) =
        conv(substring(md5(g), off, 8), 16, 10).cast("long") % mBits
      (mBits, (grams: org.apache.spark.sql.Column) =>
        exists(grams, g => bitTest(hw(g, 1)) && bitTest(hw(g, 9))))
    } else {
      (mBits, graft.functions.BloomBcProbe.gate(s, words, mBits))
    }
  }

  /** Exact broadcast-needle arm of semantic decontamination — the mechanism
    * behind `q_decontaminate_semantic` (see that entry's scaladoc for the
    * full contract). Factored out so `q_decontaminate_semantic_recall` can
    * compare it against the IVF tier without duplicating either plan.
    */
  private[graft] def semanticDecontamExact(
      s: SparkSession, d: String,
      needleMod: Long = 31L, needleBudget: Long = Long.MaxValue): DataFrame = {
    // budgets in (Int.MaxValue, Long.MaxValue) would overflow limit()'s
    // Int to a negative — reject up front instead of failing at runtime
    // (Long.MaxValue is the documented pass-through sentinel)
    require(needleBudget == Long.MaxValue || needleBudget <= Int.MaxValue,
      s"needleBudget $needleBudget exceeds limit()'s Int range (use Long.MaxValue to disable)")
    import s.implicits._
    val e = embeddings(s, d).select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val base = e.filter(pmod($"vec_id", lit(needleMod)) === 0)
    // bounded: the benchmark embedding matrix (entry scaladoc); under a
    // needle budget, the same deterministic md5-order cap as the IVF arm
    // so recall keys compare the two mechanisms over ONE suite
    val needleRows =
      (if (needleBudget == Long.MaxValue) base.orderBy($"vec_id")
       else base.orderBy(md5($"vec_id".cast("string")), $"vec_id")
         .limit(needleBudget.toInt))
        .collect()
    val probe = graft.functions.NeedleProbe.gate(s,
      needleRows.map(_.getLong(0)),
      needleRows.map(_.getSeq[Double](1).toArray))
    val low = lit((1L << 41) - 1L)
    e.filter(pmod($"vec_id", lit(needleMod)) =!= 0)
      // the compact single-file parquet source would otherwise run the
      // whole probe loop in one or two scan tasks (the lsh_recall
      // lesson); a no-op at real scale where the source is thousands
      // of splits
      .repartition($"vec_id")
      .withColumn("p", probe($"v"))
      .select($"vec_id",
        (low - $"p".bitwiseAND(low)).as("n_id"),
        ((shiftright($"p", 41) - lit(10000L)).cast("double") / 10000.0).as("sim4"))
      .withColumn("contam", $"sim4" >= 0.40)
      .orderBy($"vec_id")
  }

  /** IVF-composed arm of semantic decontamination — the PAST-BROADCAST tier
    * `q_decontaminate_semantic` documents: when the needle matrix no longer
    * fits a TorrentBroadcast (~2×10⁶ × 64 doubles, the family's measured
    * broadcast ceiling), the needles become an inverted file and the corpus
    * probes cells instead of scanning every needle.
    *
    * Mechanism (every piece an existing, oracle-gated library shape):
    *  1. a coarse quantizer trains on the NEEDLE set with the pinned Lloyd
    *     discipline ([[graft.operators.IvfKMeans.train]]: fixed 2 iterations,
    *     cos6 + lowest-cid assignment, exact decimal(38,12) means — the
    *     DuckDB oracle replays it bit-for-bit via `lloydIterSql`);
    *  2. each needle gets ONE cell (map-side fused kernel, `assignCell`) and
    *     the needle index `(cell, n_id, nv)` is materialized once
    *     (localCheckpoint — the IVF build artifact a production pipeline
    *     writes out);
    *  3. each corpus vector probes its nprobe=2 nearest cells (map-side: the
    *     centroids ride the plan) and meets ONLY those cells' needles via a
    *     SHUFFLE-HASH cell equi-join — the needle side is explicitly NOT
    *     broadcast (that is the exact tier's mechanism; this tier exists for
    *     needle sets past it), and per-vector comparisons are the probed
    *     cells' occupancy (~2·stride), never |needles|;
    *  4. the per-pair argmax packs (round(sim·10⁴), smaller-n_id-wins) into
    *     one long — the same packing as the exact arm / `assignSubCells` —
    *     so HashAggregate partial-aggregates map-side and the pair stream is
    *     consumed in-stage (a struct-ordered min would fall back to
    *     SortAggregate and sort the pair stream).
    *
    * Seed/width policy is occupancy-adaptive like the family's others, pure
    * arithmetic on the needle COUNT so the oracle computes the identical
    * policy in SQL: seed stride 8 (K ≈ n/8) up to 4096 needles — keeps K ≥ 2
    * at the test scales so the cell route is genuinely exercised — and 256
    * (K ≈ n/256, the SemDeDup occupancy policy) beyond. When K itself
    * outgrows plan literals, the assignment swaps to the broadcast-variable
    * kernel and then the hierarchical quantizer — the identical 3-tier
    * ladder `q_semdedup_table`/`q_semdedup_hier` force.
    *
    * The price is exact recall: a needle in an unprobed cell is invisible.
    * `q_decontaminate_semantic_recall` MEASURES that loss against the exact
    * arm (the q_similarity_recall discipline — no approximate tier ships
    * without a measured recall).
    */
  /** @param nprobe how many nearest cells each corpus vector probes. The
    *   shipped tier (and its oracle) pin nprobe=2; `tools/IvfRecallCurve`
    *   sweeps 1/2/4 to publish the recall-vs-cost curve at the scales where
    *   the tier is forced (the round-12 verdict's measurement-completion
    *   item).
    */
  private[graft] def semanticDecontamIvf(
      s: SparkSession, d: String, nprobe: Int = 2): DataFrame =
    semanticDecontamIvf(s, d, (_: Int) => nprobe, 31L, Long.MaxValue)

  /** Policy form: probe width derived from the trained quantizer size by
    * `nprobePolicy` (the production path uses
    * [[graft.operators.IvfKMeans.adaptiveNprobe]] — nprobe = max(2, ⌈K/8⌉),
    * the knee of the measured recall-vs-cost curve). `needleMod` picks the
    * needle set (every `needleMod`-th vector); the adaptive forced key uses
    * a denser set so K is large enough at the oracle scale that the policy
    * width genuinely exceeds the legacy constant.
    */
  private[graft] def semanticDecontamIvf(
      s: SparkSession, d: String,
      nprobePolicy: Int => Int, needleMod: Long,
      needleBudget: Long): DataFrame = {
    require(needleBudget == Long.MaxValue || needleBudget <= Int.MaxValue,
      s"needleBudget $needleBudget exceeds limit()'s Int range (use Long.MaxValue to disable)")
    import s.implicits._
    import graft.operators.IvfKMeans
    val e = embeddings(s, d).select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    // NEEDLE BUDGET (round 16 — the r14 verdict's cost-linearity item): a
    // real benchmark suite is FIXED-SIZE, but the mod-rule needle set grows
    // with the corpus, making the tier's pair work quadratic-over-8
    // (corpus × needles/8 under the adaptive probe width — measured 4.06×
    // per 4× at sf16). Capping the suite at `needleBudget` needles in
    // deterministic md5 order (ties by vec_id — the oracle replays the
    // exact same ORDER BY ... LIMIT) bounds K, the probe width, and the
    // per-vector work by constants, so the corpus pass is linear at any
    // scale. The cap runs BEFORE quantizer training: seeds, centroids and
    // posting lists all derive from the budgeted suite.
    val allNeedles = e.filter(pmod($"vec_id", lit(needleMod)) === 0)
    val needles =
      (if (needleBudget == Long.MaxValue) allNeedles
       else allNeedles.orderBy(md5($"vec_id".cast("string")), $"vec_id")
         .limit(needleBudget.toInt))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNeedles = needles.count() // materializes the persist; drives the seed policy
    val stride = if (nNeedles <= 4096L) 8L else 256L
    // bounded: K ≈ |needles|/stride seed rows through the driver — the
    // k-means-init bound, same as q_similarity_ann_ivf's seed collect
    val seeds: Seq[(Long, Seq[Double])] =
      needles.filter($"vec_id" % (needleMod * stride) === 0).orderBy($"vec_id")
        .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cents = IvfKMeans.train(s, needles, seeds, iters = 2)
    // the IVF build artifact, grouped PER CELL: one row per cell carrying
    // its needle list (id + vector) — the inverted file's posting lists —
    // materialized once. Row width is bounded by the occupancy policy
    // (~stride needles × 64 doubles ≈ 130 KB at stride 256), and the cell
    // table has K rows, so the join side stays an ordinary shuffled
    // relation at any needle count (never broadcast-bounded).
    val nd = needles
      .withColumn("cell", IvfKMeans.assignCell(s, cents, $"v"))
      .groupBy($"cell")
      .agg(collect_list(struct($"vec_id".as("n_id"), $"v".as("nv"))).as("nds"))
      .localCheckpoint()
    needles.unpersist(blocking = false)
    val nprobe = nprobePolicy(cents.size)
    val corpus = e.filter(pmod($"vec_id", lit(needleMod)) =!= 0)
      // spread the compact test scan (same note as the exact arm)
      .repartition($"vec_id")
      // fused top-2 probe (one compiled loop; bit-identical to the
      // composed slice(array_sort(simStructs)) route — Round12OpsSpec) —
      // literal tier while K fits the plan, broadcast-variable twin past
      // it, the same ladder as assignCell/assignCellBc
      .withColumn("cell", explode(
        if (cents.size <= 1024) IvfKMeans.probeCells(s, cents, $"v", nprobe)
        else IvfKMeans.probeCellsBc(s, cents, $"v", nprobe)))
      .select($"vec_id", $"v", $"cell")
    val low = (1L << 41) - 1L
    // ONE fused argmax per (corpus vector × probed cell): the cell's
    // posting list rides the joined row and NeedleArgmaxPackedCells runs
    // the raw cosine loop + single windowed HALF_UP rounding per call —
    // the row-per-pair formulation this replaces evaluated TWO BigDecimal
    // roundings per joined PAIR (~320M at sf16, measured ~70% of the
    // query: 31.2 s → 9.4 s). All-NaN cells yield null; max() skips it.
    val packed = graft.functions.NeedleProbe.argmaxPackedCells($"v", $"nds")
    corpus.join(nd.hint("shuffle_hash"), Seq("cell"))
      .groupBy($"vec_id")
      .agg(max(packed).as("p"))
      .select($"vec_id",
        (lit(low) - $"p".bitwiseAND(lit(low))).as("n_id"),
        ((shiftright($"p", 41) - lit(10000L)).cast("double") / 10000.0).as("sim4"))
      .withColumn("contam", $"sim4" >= 0.40)
      .orderBy($"vec_id")
  }

  /** Oracle CTE chain replaying [[semanticDecontamIvf]] in DuckDB — ends in
    * `ivf (vec_id, n_id, sim4, contam)`. Defines `en`/`n`/`cor` (all /
    * needle / corpus vectors with norms; `n` is the training set
    * `lloydIterSql` folds over), the count-driven seed policy (`pol`), two
    * Lloyd iterations, the needle cell assignment (`nd`), the probe-width
    * policy (`npol` — `nprobeSelect` is either the pinned `SELECT 2 AS np`
    * or the K-derived adaptive formula over the trained centroid table
    * `c2`, mirroring `IvfKMeans.adaptiveNprobe`), the corpus probe list
    * (`prb`) and the cell-restricted argmax.
    */
  private def semanticIvfCtes(
      needleMod: Int = 31, nprobeSelect: String = "SELECT 2 AS np",
      needleBudget: Long = Long.MaxValue): String = {
    val needleCte =
      if (needleBudget == Long.MaxValue)
        s"n AS (SELECT * FROM en WHERE vec_id % $needleMod = 0)"
      else
        // the budget cap, replayed exactly: deterministic md5 order,
        // vec_id ties, LIMIT — same suite the engine trains on
        s"""n AS (
           |  SELECT vec_id, v, nrm FROM en WHERE vec_id % $needleMod = 0
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $needleBudget)""".stripMargin
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |en AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |$needleCte,
       |cor AS (SELECT * FROM en WHERE vec_id % $needleMod <> 0),
       |pol AS (SELECT CASE WHEN COUNT(*) <= 4096 THEN 8 ELSE 256 END AS stride FROM n),
       |c0 AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
       |  WHERE vec_id % ($needleMod * (SELECT stride FROM pol)) = 0),
       |${lloydIterSql(0)},
       |${lloydIterSql(1)},
       |npol AS ($nprobeSelect),
       |nd AS (
       |  SELECT cell, vec_id AS n_id, v AS nv, nrm AS nnrm FROM (
       |    SELECT n.vec_id, n.v, n.nrm, c.cid AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |        ROUND(list_sum(list_transform(range(1, 65), i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) DESC,
       |        c.cid) AS rk
       |    FROM n, c2 c) WHERE rk = 1),
       |prb AS (
       |  SELECT vec_id, v, nrm, cell FROM (
       |    SELECT cor.vec_id, cor.v, cor.nrm, c.cid AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY cor.vec_id ORDER BY
       |        ROUND(list_sum(list_transform(range(1, 65), i -> cor.v[i] * c.cv[i])) / (cor.nrm * c.cnrm), 6) DESC,
       |        c.cid) AS rk
       |    FROM cor, c2 c) WHERE rk <= (SELECT np FROM npol)),
       |pp AS (
       |  SELECT p.vec_id, nd.n_id,
       |    ROUND(list_sum(list_transform(range(1, 65), i -> p.v[i] * nd.nv[i])) / (p.nrm * nd.nnrm), 4) + 0.0 AS sim4
       |  FROM prb p JOIN nd USING (cell)),
       |ivf AS (
       |  SELECT vec_id, n_id, sim4, sim4 >= 0.40 AS contam FROM (
       |    SELECT vec_id, n_id, sim4,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim4 DESC, n_id) AS rn
       |    FROM pp) t WHERE rn = 1)""".stripMargin
  }

  /** Per-image aHash fingerprints over the REAL PPM decode —
    * (doc_id, h_hi, h_lo), one row per image document. Shared by the
    * exact tier (`q_dedup_image_ahash`: hash-equality clusters) and the
    * near tier (`q_dedup_image_phash_near`: banded Hamming≤3 pairs over
    * the distinct-hash representatives). Integer-exact by the family's
    * cross-multiplication discipline: luminance G_i = r+g+b, bit_i =
    * (64·G_i ≥ ΣG), packed into two shift-safe 32-bit BIGINT halves.
    */
  private def imageAhashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val assets = graft.multimodal.Multimodal
      .assetsFromDocumentsCodec(s, documents(s, d).filter($"doc_id" % 2 === 0))
    assets.mapPartitions(_.map { a =>
      val img = graft.multimodal.PpmCodec.decode(a.content)
        .getOrElse(throw new IllegalStateException(s"undecodable fixture ${a.asset_id}"))
      val px = img.pixels
      val g = new Array[Long](64)
      var tot = 0L
      var i = 0
      while (i < 64) {
        g(i) = (px(3 * i) & 0xff).toLong + (px(3 * i + 1) & 0xff) + (px(3 * i + 2) & 0xff)
        tot += g(i); i += 1
      }
      var lo = 0L; var hi = 0L
      i = 0
      while (i < 32) { if (64 * g(i) >= tot) lo |= 1L << i; i += 1 }
      while (i < 64) { if (64 * g(i) >= tot) hi |= 1L << (i - 32); i += 1 }
      (a.asset_id, hi, lo)
    }).toDF("doc_id", "h_hi", "h_lo")
  }

  /** Hamming≤`maxDist` near-dup pairs between DISTINCT-hash canonical
    * image reps — (doc_a, doc_b, hamming), materialized by default (the
    * pair list feeds both the pair report and the cluster labeling
    * without re-running the band join). Banding discipline,
    * distance-parameterized like the IVF probe width (round 17, acting
    * on q_dedup_image_recall's measured curve): `nBands` bands of
    * 64/nBands bits over the 64-bit aHash, any-band equi-join
    * (pigeonhole: ≤ nBands−1 flips leave ≥1 band intact → total recall
    * at d ≤ nBands−1), exact bit_count verify on candidates. The
    * default (4, 3) is the original d≤3 tier; (8, 7) is the production
    * near tier — the recall curve showed 4×16 banding silently decays
    * to 21.4% recall at d=10 at sf1 while 8×8 holds ≥99.9%.
    */
  private[graft] def imagePhashNearPairs(
      s: SparkSession, d: String, materialize: Boolean = true,
      nBands: Int = 4, maxDist: Int = 3): DataFrame = {
    import s.implicits._
    val reps = imageAhashes(s, d)
      .groupBy($"h_hi", $"h_lo")
      .agg(min($"doc_id").as("doc_id"))
      // materialized once: the band explode reads it twice (self-join)
      .localCheckpoint()
    bandedHammingPairs(s, reps, nBands, maxDist, materialize)
  }

  /** The band-join core of [[imagePhashNearPairs]] over an explicit rep
    * table (doc_id, h_hi, h_lo) — factored out so specs can plant exact
    * bit patterns. Requires 64 % nBands == 0 and maxDist < nBands (the
    * pigeonhole exactness bound: beyond nBands−1 flips no band is
    * guaranteed intact and the equi-join under-recalls SILENTLY).
    */
  private[graft] def bandedHammingPairs(
      s: SparkSession, reps: DataFrame, nBands: Int, maxDist: Int,
      materialize: Boolean = true): DataFrame = {
    require(nBands > 1 && 64 % nBands == 0, s"band count $nBands must divide 64")
    require(maxDist < nBands,
      s"maxDist $maxDist breaks the pigeonhole recall floor of $nBands bands")
    import s.implicits._
    val w = 64 / nBands
    val slices = (0 until nBands).map { j =>
      val bitOff = w * j
      val (src, off) = if (bitOff < 32) ("h_lo", bitOff) else ("h_hi", bitOff - 32)
      s"struct(CAST($j AS BIGINT) AS band, shiftright($src, $off) % ${1L << w} AS v)"
    }.mkString("array(\n", ",\n", ")")
    val bands = reps.select($"doc_id", $"h_hi", $"h_lo", explode(expr(slices)).as("b"))
      .select($"doc_id", $"h_hi", $"h_lo", $"b.band".as("band"), $"b.v".as("v"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.h_hi").as("ahi"), col("x.h_lo").as("alo"),
        col("y.h_hi").as("bhi"), col("y.h_lo").as("blo"))
      // a close pair can agree on up to nBands−1 bands — dedup the
      // candidate, not the verified output (hashes ride along: doc_id
      // determines the hash among reps, so the pair key alone dedups)
      .distinct()
    val pairs = cand
      .withColumn("hamming",
        expr("CAST(bit_count(ahi ^ bhi) + bit_count(alo ^ blo) AS BIGINT)"))
      .filter($"hamming" <= maxDist)
      .select($"doc_a", $"doc_b", $"hamming")
    // materialize=false exposes the full lineage for the plan gate (the
    // checkpoint otherwise truncates the visible plan to an ExistingRDD)
    if (materialize) pairs.localCheckpoint() else pairs
  }

  /** The recall-curve body over an explicit rep table (doc_id, h_hi,
    * h_lo) — factored out (round 17) so the full-corpus key and the
    * bounded rep-SAMPLE key share one implementation. Truth arm: 16
    * bands of 4 bits (pigeonhole covers d ≤ 15) + exact bit_count
    * verify; measured arms are pure xor-slice arithmetic on the pair.
    * Output: per d ∈ [1,10], n_true and the pairs recalled by b ∈
    * {2, 4, 8} bands.
    */
  private[graft] def imageRecallCurveOf(s: SparkSession, reps0: DataFrame): DataFrame = {
    import s.implicits._
    val reps = reps0.localCheckpoint() // the 16-band explode self-joins this
    val bands = reps.select($"doc_id", $"h_hi", $"h_lo", explode(expr(
      """transform(sequence(0, 15), j -> struct(CAST(j AS BIGINT) AS band,
        |  CASE WHEN j < 8 THEN shiftright(h_lo, CAST(4 * j AS INT)) % 16
        |       ELSE shiftright(h_hi, CAST(4 * (j - 8) AS INT)) % 16 END AS v))""".stripMargin))
        .as("b"))
      .select($"doc_id", $"h_hi", $"h_lo", $"b.band".as("band"), $"b.v".as("v"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.h_hi").as("ahi"), col("x.h_lo").as("alo"),
        col("y.h_hi").as("bhi"), col("y.h_lo").as("blo"))
      .distinct() // a close pair shares many 4-bit bands
      .select($"doc_a", $"doc_b",
        expr("ahi ^ bhi").as("xhi"), expr("alo ^ blo").as("xlo"))
      .withColumn("hamming",
        expr("CAST(bit_count(xhi) + bit_count(xlo) AS BIGINT)"))
      .filter($"hamming".between(1, 10))
      .withColumn("r2", ($"xlo" === 0 || $"xhi" === 0).cast("long"))
      .withColumn("r4", expr(
        """CAST(xlo % 65536 = 0 OR shiftright(xlo, 16) = 0
          |  OR xhi % 65536 = 0 OR shiftright(xhi, 16) = 0 AS LONG)""".stripMargin))
      .withColumn("r8", expr(
        """CAST(exists(sequence(0, 3),
          |  j -> shiftright(xlo, CAST(8 * j AS INT)) % 256 = 0
          |    OR shiftright(xhi, CAST(8 * j AS INT)) % 256 = 0) AS LONG)""".stripMargin))
      .groupBy($"hamming")
      .agg(count(lit(1)).as("n_true"),
        sum($"r2").as("n_rec_b2"),
        sum($"r4").as("n_rec_b4"),
        sum($"r8").as("n_rec_b8"))
      .orderBy($"hamming")
  }

  /** Shared base of the quantized ANN tier — (vec_id, v, bucket, qv8, qn):
    * float vectors with their LSH bucket (the ann_lsh index) and the int8
    * SYMMETRIC global-scale codes (q = round(127·x/max|x|) — NOT the
    * per-dim affine storage codes of q_embedding_quantize; see the inline
    * note for the measured failure that forced the distinction). The only
    * stats pass is the global max|x| — a 1-row bounded collect baked into
    * the plan as a literal — so the quantize itself is pure map-side
    * codegen over the scan: at 100 TB the codes are written once and the
    * int ranking scans 4× fewer bytes than the float vectors.
    */
  private[graft] def quantizedLshBase(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = embeddings(s, d)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    // SYMMETRIC global-scale codes, NOT the per-dim affine storage codes of
    // q_embedding_quantize: ranking needs the code dot to be PROPORTIONAL
    // to the true dot (q = round(127·x/maxabs) ⇒ Σq·q ≈ (127/maxabs)²·Σx·y),
    // where the storage scheme's per-dim offsets add cross terms that
    // dominate on a centered corpus — measured before this fix: recall@3
    // collapsed 1.00 → 0.07 as bucket occupancy grew 4 → 1250 (the affine
    // codes ranked offsets, not similarity). One global max|x| (a 1-row
    // bounded collect) bakes into the plan; the quantize is pure map.
    val maxAbs = e.select(max(expr(
      "aggregate(v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))"))).head.getDouble(0)
    e.withColumn("bucket", graft.functions.LshFunctions.hyperplaneSig(s, $"v") % 256)
      .withColumn("qv8",
        if (maxAbs == 0.0) expr("transform(v, x -> 0L)")
        else transform($"v", x => floor(x * 127.0 / maxAbs + 0.5)))
      // exact integer code norm Σq² — the shortlist's cosine denominator
      // (code_dot: the compiled twin of the aggregate-HOF fold, round 21)
      .withColumn("qn", graft.functions.CodeDot.codeDot(s, col("qv8"), col("qv8")))
  }

  /** The quantized tier's ranking plan over a (possibly cached) base —
    * bucket equi-join candidates (broadcast 10-query side), exact-integer
    * code-dot shortlist (top 15), full-precision cosine rescore (top 3).
    * Unmaterialized so the plan gate can inspect the join/shortlist shape.
    */
  /** The int8 shortlist over the bucket candidates —
    * (q_id, c_id, qvf, cv, iq): integer code dots, norm-corrected
    * quantized cosine for the order (exact ints → one deterministic IEEE
    * divide; the value never rides an output, only the order with c_id
    * ties), adaptive width max(15, ⌈candidates/8⌉) — the same measured
    * eighth as the IVF probe policy: a fixed 15 of 1250 candidates
    * starves recall at scale exactly like nprobe=2 of K=323 did.
    */
  private[graft] def quantizedShortlist(s: SparkSession, base: DataFrame): DataFrame = {
    import s.implicits._
    quantizedShortlistFrom(s, base,
      base.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qvf"), $"qv8".as("qq8"),
          $"qn".as("qnq"), $"bucket"))
  }

  /** [[quantizedShortlist]] with the QUERY side supplied by the caller —
    * the routing index is a parameter: the LSH tier passes one bucket row
    * per query; the IVF composition passes one row per PROBED CELL (a
    * corpus vector lives in exactly one cell, so a (q, c) pair still
    * appears at most once and the adaptive width sees the query's whole
    * candidate pool across its probes). `q` must carry
    * (q_id, qvf, qq8, qnq, bucket).
    */
  private[graft] def quantizedShortlistFrom(
      s: SparkSession, base: DataFrame, q: DataFrame): DataFrame = {
    import s.implicits._
    val wQ = Window.partitionBy($"q_id")
    base.select($"vec_id".as("c_id"), $"v".as("cv"), $"qv8".as("cq8"),
        $"qn".as("qnc"), $"bucket")
      .join(broadcast(q), Seq("bucket"))
      .filter($"q_id" =!= $"c_id")
      // code_dot (round 21): the aggregate(zip_with(...)) HOF walked two
      // interpreter lambdas per element PER CANDIDATE PAIR — the quantized
      // tier's hot ranking loop (~4M pairs at sf16 serve); the compiled
      // kernel is value-identical including null-on-ragged semantics
      .withColumn("iq", graft.functions.CodeDot.codeDot(s, $"qq8", $"cq8"))
      .withColumn("iqcos",
        when($"qnq" === 0L || $"qnc" === 0L, lit(-2.0d))
          .otherwise($"iq".cast("double") / sqrt(($"qnq" * $"qnc").cast("double"))))
      .withColumn("ncand", count(lit(1)).over(wQ))
      .withColumn("irk", row_number().over(wQ.orderBy($"iqcos".desc, $"c_id")))
      .filter($"irk" <= greatest(lit(15L), ceil($"ncand" / 8.0)))
      .select($"q_id", $"c_id", $"qvf", $"cv", $"iq")
  }

  /** [[quantizedShortlist]] + full-precision rescore, final top-3. */
  private[graft] def quantizedTop3(s: SparkSession, base: DataFrame): DataFrame = {
    import s.implicits._
    quantizedTop3Of(s, quantizedShortlist(s, base))
  }

  /** Full-precision rescore + final top-3 over a prepared shortlist. */
  private[graft] def quantizedTop3Of(s: SparkSession, shortlist: DataFrame): DataFrame = {
    import s.implicits._
    shortlist
      .withColumn("sim4",
        round(graft.functions.CosineSimilarity.cosineSim(s, $"qvf", $"cv"), 4) + lit(0.0))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")))
      .filter($"rnk" <= 3)
      .select($"q_id", $"rnk", $"c_id", $"iq", $"sim4")
      .orderBy($"q_id", $"rnk")
  }

  /** The composed IVF × int8 index — shared body of
    * q_similarity_ivf_quantized and its recall gate (full contract at the
    * key's scaladoc): ann_ivf's trained coarse quantizer routes (nprobe=2
    * probed cells per query), the symmetric global-scale int8 codes rank
    * the probed candidates ([[quantizedShortlistFrom]] — the query side
    * carries one row per probed cell), the adaptive shortlist pays the
    * full-precision rescore for the final top-3.
    */
  private[graft] def ivfQuantizedTop3(s: SparkSession, d: String, nprobe: Int = 8): DataFrame = {
    import s.implicits._
    import graft.operators.IvfKMeans
    val e = embeddings(s, d)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // K ≤ 16 seed rows (the k-means-init bound, ann_ivf's policy) and the
    // global max|x| ranking scale (1-row bounded collect, baked as a plan
    // literal — quantizedLshBase's symmetric-scale contract) fused into
    // ONE corpus pass ([[seedsAndMaxAbs]]; bit-identical values)
    val (seeds, maxAbs) = seedsAndMaxAbs(s, e)
    val cents = IvfKMeans.train(s, e, seeds, iters = 2)
    def quant(df: DataFrame): DataFrame = df
      .withColumn("qv8",
        if (maxAbs == 0.0) expr("transform(v, x -> 0L)")
        else transform($"v", x => floor(x * 127.0 / maxAbs + 0.5)))
      .withColumn("qn", graft.functions.CodeDot.codeDot(s, col("qv8"), col("qv8")))
    // the stored index: cell (map-side literal kernel) + int8 codes
    val cBase = quant(e).withColumn("bucket", IvfKMeans.assignCell(s, cents, $"v"))
    // query side: one row per probed cell (the ann_ivf probe policy)
    val q = quant(e.filter($"vec_id" < 10))
      .withColumn("p", explode(
        slice(array_sort(IvfKMeans.simStructs(s, cents, $"v")), 1, nprobe)))
      .select($"vec_id".as("q_id"), $"v".as("qvf"), $"qv8".as("qq8"),
        $"qn".as("qnq"), $"p.cid".as("bucket"))
    val out = quantizedTop3Of(s,
        quantizedShortlistFrom(s, cBase, q).filter($"q_id" =!= $"c_id"))
      .localCheckpoint() // 30 rows; then release the corpus cache
    e.unpersist(blocking = false)
    out
  }

  /** BUILD/SERVE-separated persisted ANN index (round 16) — the lifecycle
    * a production vector store actually runs, distinct from the
    * compute-everything-per-query composition above:
    *
    *  - BUILD: the quantizer (centroids) AND the int8 scale train on the
    *    indexed corpus only (even vec_ids — "yesterday's index"); the
    *    index is WRITTEN as a parquet table PARTITIONED BY CELL — the
    *    on-disk layout that makes probing an I/O win.
    *  - INCREMENTAL APPEND: today's shard (odd vec_ids) is assigned to
    *    the EXISTING centroids and quantized with the STORED scale — no
    *    retrain, no rewrite of existing partitions; appended rows land in
    *    their cells' directories under a shard-id partition level with
    *    DYNAMIC partition overwrite, so an at-least-once retry of the
    *    shard overwrites its own partitions instead of double-appending
    *    (the IngestDedup store discipline applied to the vector index —
    *    idempotency spec-proven via `retryAppend`).
    *  - SERVE: queries probe their nprobe=8 nearest cells; the stored
    *    index is read back with a STATIC cell-list partition filter (the
    *    union of probed cells — bounded by K), so the scan reads ONLY the
    *    probed cells' files (PartitionFilters/PartitionCount plan-gated in
    *    Round16OpsSpec via the `inspect` hook) — at 100 TB this is the
    *    difference between touching nprobe·K⁻¹ of the index bytes and all
    *    of them. Ranking is the composed tier unchanged: int8 shortlist
    *    ([[quantizedShortlistFrom]]) + full-precision rescore.
    *
    * The DuckDB oracle replays the lifecycle semantics exactly (training
    * and scale from the even half, assignment/quantization of both halves,
    * probe, shortlist, rescore), so the hash certifies that persistence +
    * append added and lost nothing.
    */
  private def embVecs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    embeddings(s, d)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  /** int8-quantize `v` with a stored symmetric scale (the index's scale
    * artifact — NOT recomputed per shard). */
  private def quantWith(df: DataFrame, maxAbs: Double): DataFrame = df
    .withColumn("qv8",
      if (maxAbs == 0.0) expr("transform(v, x -> 0L)")
      else transform(col("v"), x => floor(x * 127.0 / maxAbs + 0.5)))
    .withColumn("qn",
      graft.functions.CodeDot.codeDot(df.sparkSession, col("qv8"), col("qv8")))

  /** BUILD the persisted index into the named `store` directory —
    * `store/index` is the parquet index partitioned by (cell, shard)
    * (later GENERATIONS from [[ivfIndexCompact]] live beside it, named
    * by the `store/CURRENT` pointer all readers resolve through);
    * `store/meta` holds the trained centroids and the stored int8 scale
    * (one row per centroid, max_abs riding every row). The store — not a
    * returned DataFrame — is the artifact; [[ivfIndexAppend]] and
    * [[ivfIndexServeOnly]] run against it in LATER jobs, which is the
    * production point of a persisted index (build once, serve many).
    * Trains on "yesterday's corpus" (even vec_ids).
    */
  private[graft] def ivfIndexBuild(s: SparkSession, d: String, store: String): Unit = {
    import s.implicits._
    import graft.operators.IvfKMeans
    val build = embVecs(s, d).filter($"vec_id" % 2 === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed pool + the stored scale artifact (max|x| over the INDEXED
    // corpus only — appended shards quantize with it: the scale is part
    // of the index, not recomputed per shard) in ONE corpus pass — the
    // two collects were separate jobs and the chain's cost at small sf is
    // per-job fixed overhead (round-19 VERDICT #5). Bit-identical: seeds
    // sort by vec_id either way, and max is order-independent.
    val (seeds, maxAbs) = seedsAndMaxAbs(s, build)
    val cents = IvfKMeans.train(s, build, seeds, iters = 2)
    cents.map { case (cid, cv) => (cid, cv, maxAbs) }
      .toDF("cid", "cv", "max_abs")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/meta")
    quantWith(build, maxAbs)
      .withColumn("cell", IvfKMeans.assignCell(s, cents, $"v"))
      .select($"vec_id", $"v", $"qv8", $"qn", $"cell")
      .withColumn("shard", lit(0L))
      .write.partitionBy("cell", "shard").mode("overwrite").parquet(s"$store/index")
    build.unpersist(blocking = false)
  }

  /** Seed pool (the k-means-init policy: vec_id ≡ 0 mod 97, < 1552 —
    * K ≤ 16 rows, sorted by vec_id) AND the global int8 scale max|x|, in
    * ONE aggregation job over `df` (`vec_id`, `v`). `collect_list` skips
    * the non-seeds' nulls; `sort_array` on the structs orders by the
    * leading vec_id field — bit-identical to the former
    * filter-orderBy-collect, and max is order-independent, so both values
    * equal the two-job originals exactly (oracle keys unchanged). */
  private[graft] def seedsAndMaxAbs(
      s: SparkSession, df: DataFrame): (Seq[(Long, Seq[Double])], Double) = {
    import s.implicits._
    val row = df.agg(
      sort_array(collect_list(when($"vec_id" % 97 === 0 && $"vec_id" < 1552,
        struct($"vec_id", $"v")))).as("seeds"),
      max(expr(
        "aggregate(v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))")).as("ma"))
      .head()
    (row.getSeq[org.apache.spark.sql.Row](0)
       .map(r => (r.getLong(0), r.getSeq[Double](1))),
      row.getDouble(1))
  }

  /** Read back the store's trained artifacts: (centroids, stored scale).
    * Bounded: K ≤ 16 centroid rows. */
  private[graft] def ivfIndexMeta(
      s: SparkSession, store: String): (Seq[(Long, Seq[Double])], Double) = {
    val rows = s.read.parquet(s"$store/meta").collect()
    require(rows.nonEmpty, s"no index meta at $store (store missing or build incomplete)")
    (rows.map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq,
      rows.head.getDouble(2))
  }

  /** The store's LIVE generation name — `store/CURRENT` (one line, the
    * generation-pointer file compaction flips atomically) when present,
    * the build's original `index` otherwise. Append, serve and compaction
    * all resolve through this, so a reader can never observe a
    * half-written generation.
    */
  /** The index-store directory contract is LOCAL-filesystem only: the
    * CURRENT pointer (atomic rename), the `_ABSORBED` manifest and the
    * tombstone-partition probe all go through java.nio/java.io, which a
    * scheme-qualified path (hdfs://, s3a://) would silently miss — the
    * store would look tombstone-free and serve deleted vectors. Fail fast
    * at every store entry point instead (round-18 ADVICE). A distributed
    * deployment would port these probes to the Hadoop FileSystem API and
    * replace the rename flip with a conditional-put pointer.
    */
  private[graft] def requireLocalStore(store: String): Unit =
    require(!store.contains("://"),
      s"index store paths must be local-filesystem (CURRENT/_ABSORBED/" +
        s"tombstone probes use java.nio and would silently miss a remote " +
        s"scheme): got $store")

  private[graft] def ivfIndexLiveName(store: String): String = {
    requireLocalStore(store)
    val cur = java.nio.file.Paths.get(store, "CURRENT")
    if (java.nio.file.Files.exists(cur))
      new String(java.nio.file.Files.readAllBytes(cur), "UTF-8").trim
    else "index"
  }

  /** Full path of the live generation directory (see [[ivfIndexLiveName]]). */
  private[graft] def ivfIndexLiveDir(store: String): String =
    s"$store/${ivfIndexLiveName(store)}"

  /** The reserved shard id compaction re-keys merged rows under. NEGATIVE
    * by construction: [[ivfIndexAppend]] requires `shard > 0` and the
    * build writes `shard = 0`, so no append redelivery can ever name this
    * partition — a redelivered shard can therefore never dynamic-overwrite
    * the compacted data (round-18 ADVICE; r17 keyed compacted rows as
    * `shard = upTo`, which a redelivery of shard `upTo` silently replaced).
    */
  private[graft] val CompactedShard: Long = -1L

  /** Shard ids a compaction has ABSORBED into the [[CompactedShard]]
    * partition — read from the live generation's `_ABSORBED` manifest
    * (underscore-prefixed: parquet readers ignore it). Empty before any
    * compaction. [[ivfIndexAppend]] consults this to recognize an
    * at-least-once REDELIVERY of a shard whose rows already live in the
    * compacted partition (the append must no-op, not duplicate), while a
    * first-delivery append whose shard id merely compares `<= upTo`
    * numerically (the in-flight-during-compaction case — compaction never
    * saw its rows) is NOT in the manifest and still lands under its own id.
    */
  private[graft] def ivfIndexAbsorbed(store: String, genName: String): Set[Long] = {
    val p = java.nio.file.Paths.get(store, genName, "_ABSORBED")
    if (java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSet
    else Set.empty
  }

  /** Shard ids present in a DataFrame's OWN file-index snapshot, parsed
    * from its `inputFiles` partition directories — driver-side, zero Spark
    * jobs (the round-20 directory-listing property preserved), and ATOMIC
    * with the rows the frame will read. Round-21 ADVICE: a fresh directory
    * listing taken AFTER the snapshot could record a concurrently-appended
    * shard as absorbed without its rows being merged — the append's
    * post-write generation fence would then no-op its re-land and silently
    * lose the shard; parsing the snapshot's own file list closes that race
    * window by construction. */
  private[graft] def snapshotShardIds(df: DataFrame): Set[Long] =
    df.inputFiles.iterator.flatMap(
      _.split('/').find(_.startsWith("shard="))
        .map(_.stripPrefix("shard=").toLong)).toSet

  /** TOMBSTONE deletion — the lifecycle verb a training-data vector store
    * cannot ship without (takedowns, opt-outs, dedup-driven retractions).
    * A delete writes the doomed `vec_id`s as marker rows under
    * `store/tombstones`, PARTITIONED BY the caller's delete-batch id with
    * dynamic partition overwrite — the append discipline applied to
    * deletion, so an at-least-once redelivery of the same delete batch
    * overwrites its own partition instead of duplicating markers (and
    * duplicates would be harmless anyway: readers consume the DISTINCT
    * set through [[ivfIndexTombstones]]). Tombstones are STORE-level, not
    * generation-level: they survive compaction pointer flips, because a
    * redelivered append of a carried shard could resurrect a deleted row's
    * index entry — the serve-side anti-join must keep masking it. The set
    * stays tiny relative to the index (deletes are rare events), so the
    * serve-side cost is one broadcast anti-join over already-pruned rows.
    */
  private[graft] def ivfIndexDelete(
      s: SparkSession, store: String, delId: Long, vecIds: DataFrame): Unit = {
    requireLocalStore(store)
    vecIds
      .select(col(vecIds.columns.head).cast("long").as("vec_id"))
      .withColumn("del", lit(delId))
      .write.partitionBy("del")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$store/tombstones")
  }

  /** CELL-ALIGNED tombstone write — the past-broadcast deletion mechanism
    * (round-19 VERDICT #4): the r19 scaling arm established that the
    * serve-side mask's ceiling is the BROADCAST of the global distinct
    * tombstone set (~10^8 ids ≈ 1 GB — an operational compact-before rule,
    * not a mechanism). This entry point removes the global set from the
    * serve path entirely: tombstones are partitioned by the STORE'S OWN
    * cell layout (one column-pruned (vec_id, cell) lookup against the live
    * generation per delete batch — delete batches are rare, bounded
    * events), so a serve reads ONLY the probed cells' tombstone partitions
    * — the same nprobe/K pruning fraction the index scan itself pays. A
    * store can then carry tombstones at any scale: the mask cost tracks
    * probed-cell tombstones, never the global set.
    *
    * Sound under every lifecycle race the store admits:
    *   - cell assignment is a pure function of the vector and the
    *     IMMUTABLE centroid meta, so a redelivered carried shard that
    *     resurrects a physically-dropped row re-lands it in the SAME cell
    *     its tombstone is filed under — the pruned mask still catches it;
    *   - an OUT-OF-ORDER takedown (the id is not in the index yet — its
    *     append arrives later) files under the reserved
    *     [[UnassignedTombCell]] partition, which every serve reads
    *     unconditionally (bounded: ids deleted before they ever landed);
    *   - redelivery of the same delete batch converges via dynamic
    *     partition overwrite of its own (cell, del) partitions — the
    *     append/delete discipline unchanged.
    */
  private[graft] def ivfIndexDeleteCellAligned(
      s: SparkSession, store: String, delId: Long, vecIds: DataFrame): Unit = {
    import s.implicits._
    requireLocalStore(store)
    // no distinct on the feed either (the legacy ivfIndexDelete writes the
    // caller's rows raw for the same reason): duplicate marker rows are
    // invisible to every anti-/semi-join consumer
    val doomed = vecIds
      .select(col(vecIds.columns.head).cast("long").as("vec_id"))
    val live = s.read.parquet(ivfIndexLiveDir(store))
      .select($"vec_id", $"cell".cast("long").as("cell"))
    // the batch is the small side by contract (a takedown feed, never the
    // corpus) — broadcast it against the column-pruned index scan. ONE
    // index pass total (round 20): the residual (out-of-order takedowns)
    // derives from the MATERIALIZED assigned set — bounded by the delete
    // batch — instead of a second pass; the former
    // `doomed LEFT ANTI live` used the full index as the anti-join's
    // lookup side, which at 100 TB means hashing/shuffling index-scale
    // rows to answer a delete-batch-sized question.
    // no distinct on the semi output: vec_id is unique within a live
    // generation, and duplicate marker rows would be harmless anyway —
    // every consumer is an anti-/semi-join (set semantics) except the
    // health audit, which distincts at its own join (round 20: the
    // distinct was one exchange + its adaptive stage per delete batch).
    // The bounded set (≤ the delete batch's distinct ids) materializes as
    // a driver-side LocalRelation — the ivfIndexServeQueriesWith probe
    // pattern — instead of a localCheckpoint whose cached blocks outlived
    // the delete in a long-running serving/ingest process (round-21
    // ADVICE: the checkpoint was never unpersisted), and the residual's
    // anti-join lookup side broadcasts from local rows with no scan stage.
    val assignedPlan = live.join(broadcast(doomed), Seq("vec_id"), "left_semi")
    val assignedRows = assignedPlan.collect()
    guardBoundedCollect("ivfIndexDeleteCellAligned assigned set", assignedRows.length,
      "the delete feed is a takedown batch by contract, never the corpus — " +
        "split the batch or use the legacy ivfIndexDelete layout")
    val assigned = s.createDataFrame(
      java.util.Arrays.asList(assignedRows: _*), assignedPlan.schema)
    val residual = doomed.join(broadcast(assigned.select($"vec_id")), Seq("vec_id"), "left_anti")
      .withColumn("cell", lit(UnassignedTombCell))
    assigned.unionByName(residual)
      .withColumn("del", lit(delId))
      .write.partitionBy("cell", "del")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$store/tombstones_cell")
  }

  /** Reserved tombstone partition for ids absent from the live index at
    * delete time (out-of-order takedowns). NEGATIVE: cell ids are k-means
    * seed-derived non-negative longs, so no real cell can collide. */
  private[graft] val UnassignedTombCell: Long = -1L

  /** Serve-side tombstone-mask broadcast ceiling, in bytes-on-disk of the
    * PRUNED tombstone partitions actually read (probed cells + residual —
    * never the global set). Under it the mask is a broadcast anti-join;
    * past it the same semantics degrade to a shuffle-HASH anti-join (the
    * tombstone side builds per-partition hash maps, the pruned index rows
    * stream through — no sort, no driver collect). The
    * q_bpe_apply/[[graft.queries.CorpusOpsQueries]] vocab-join discipline
    * applied to deletion; the forced arm (`q_similarity_index_delete_cell`,
    * cap = 0) proves serve identity through the non-broadcast mechanism
    * against the DuckDB oracle. 64 MB ≈ 8M pruned ids — far above any
    * healthy store's probed-cell tombstone mass, far below driver heap. */
  private[graft] val TombstoneBroadcastCapBytes: Long = 64L << 20

  /** Row ceiling for the lifecycle's bounded-by-contract driver collects
    * (serve probe rows = queries × nprobe; delete-batch assigned set). The
    * contracts say these are request/batch-sized, never a corpus — this
    * guard makes that safe by construction (round-20 VERDICT audit #5): a
    * caller that feeds a corpus gets a clear error instead of a driver
    * OOM. 4M rows ≈ low hundreds of MB of driver heap at these row widths
    * — far above any healthy request or takedown batch. */
  private[graft] val BoundedCollectCapRows: Int = 4 << 20

  private[graft] def guardBoundedCollect(
      what: String, rows: Int, hint: String): Unit =
    require(rows <= BoundedCollectCapRows,
      s"$what collected $rows rows — past the $BoundedCollectCapRows-row " +
        s"bounded-collect contract ($hint)")

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  /** The store's tombstoned vec_id marker rows (raw — duplicates across
    * redundant delete batches possible and harmless) with their
    * bytes-on-disk, or None when no delete has ever run (the common case —
    * serve adds NO plan nodes then, keeping the pruned-scan plan gates
    * byte-identical).
    * `cells = Some(probed)` restricts the CELL-ALIGNED layout to the named
    * cells' partitions plus the [[UnassignedTombCell]] residual — a
    * partition-pruned read whose bytes figure feeds the
    * [[TombstoneBroadcastCapBytes]] gate; `None` (compaction, health
    * audit) reads the full set. The legacy store-level `tombstones` layout
    * (un-pruned — kept for stores written before the cell-aligned
    * mechanism) is unioned in whole either way. Both layouts guard on the
    * presence of at least one partition directory, not the base dir alone:
    * an EMPTY delete batch (a takedown feed with no new ids) writes the
    * base dir but no partitions, and a bare-dir parquet read would throw
    * UNABLE_TO_INFER_SCHEMA on the next serve. */
  private[graft] def ivfIndexTombstonesPruned(
      s: SparkSession, store: String,
      cells: Option[Seq[Long]]): Option[(DataFrame, Long)] = {
    requireLocalStore(store)
    val legacyDir = new java.io.File(s"$store/tombstones")
    val legacyHas = legacyDir.exists() &&
      Option(legacyDir.listFiles()).exists(_.exists(f =>
        f.isDirectory && f.getName.startsWith("del=")))
    val cellDir = new java.io.File(s"$store/tombstones_cell")
    val cellParts = Option(cellDir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    if (!legacyHas && cellParts.isEmpty) return None
    val keepNames = cells.map(cs =>
      (cs :+ UnassignedTombCell).map(c => s"cell=$c").toSet)
    val selParts = keepNames.fold(cellParts)(k => cellParts.filter(f => k(f.getName)))
    val bytes = (if (legacyHas) dirBytes(legacyDir) else 0L) +
      selParts.map(dirBytes).sum
    val parts =
      (if (legacyHas) Seq(s.read.parquet(s"$store/tombstones").select("vec_id"))
       else Nil) ++
      (if (cellParts.nonEmpty) {
        val base = s.read.parquet(s"$store/tombstones_cell")
        Seq(cells.fold(base)(cs => base.where(col("cell")
            .isin((cs :+ UnassignedTombCell).map(Long.box): _*)))
          .select("vec_id"))
      } else Nil)
    // RAW marker rows, not a distinct set (round 20): every consumer is an
    // anti-/semi-join, for which duplicates are invisible — except the
    // health audit's left join, which applies its own distinct. The former
    // always-on distinct cost one exchange + an adaptive stage per serve.
    Some((parts.reduce(_ unionByName _), bytes))
  }

  /** Full tombstone marker rows (both layouts; may carry duplicates — see
    * [[ivfIndexTombstonesPruned]]), no pruning — the compaction /
    * health-audit view. */
  private[graft] def ivfIndexTombstones(
      s: SparkSession, store: String): Option[DataFrame] =
    ivfIndexTombstonesPruned(s, store, None).map(_._1)

  /** Store-backed index health audit — the production twin of the
    * q_similarity_index_health key, computed from a REAL store's live
    * generation + tombstone set instead of the corpus halves. Per cell:
    * live indexed rows (`shard <= 0` — the build, plus compacted-merged
    * partitions, which ARE the index base once a compaction folds the
    * appended history in), live appended rows (`shard > 0`), tombstoned
    * rows still physically present (the broadcast join against the
    * tombstone set — after a compaction physically drops them this count
    * falls to the carried shards' share, which is exactly the signal:
    * WASTED flags a cell whose reads are >20% discarded rows, i.e.
    * compaction's first target). Flags use the key's exact-integer
    * cross-multiplications; the key's oracle certifies the arithmetic,
    * `Round18OpsSpec` ties this function to the key row-for-row on an
    * ephemeral store and drives both flag branches on planted deletions.
    */
  private[graft] def ivfIndexHealthOf(s: SparkSession, store: String): DataFrame = {
    import s.implicits._
    val live = s.read.parquet(ivfIndexLiveDir(store))
      .select($"vec_id", $"cell".cast("long").as("cell"),
        $"shard".cast("long").as("shard"))
    val marked = ivfIndexTombstones(s, store)
      // distinct HERE (the one consumer with bag semantics): the reader
      // returns raw marker rows, and a left join against duplicates would
      // duplicate live rows
      .map(t => live
        .join(broadcast(t.distinct().withColumn("tomb", lit(true))), Seq("vec_id"), "left")
        .withColumn("tomb", coalesce($"tomb", lit(false))))
      .getOrElse(live.withColumn("tomb", lit(false)))
    marked.groupBy($"cell")
      .agg(
        sum(when($"shard" <= 0 && !$"tomb", 1L).otherwise(0L)).as("n_indexed"),
        sum(when($"shard" > 0 && !$"tomb", 1L).otherwise(0L)).as("n_appended"),
        sum(when($"tomb", 1L).otherwise(0L)).as("n_tombstoned"))
      .withColumn("tot_idx", sum($"n_indexed").over(Window.partitionBy()))
      .withColumn("tot_app", sum($"n_appended").over(Window.partitionBy()))
      .select($"cell", $"n_indexed", $"n_appended", $"n_tombstoned",
        (lit(2L) * $"n_appended" * $"tot_idx" >
          lit(3L) * $"n_indexed" * $"tot_app").as("growing"),
        (lit(5L) * $"n_tombstoned" >
          $"n_indexed" + $"n_appended" + $"n_tombstoned").as("wasted"))
      .orderBy($"cell")
  }

  /** COMPACT the persisted index — the store's small-files maintenance
    * pass (the IngestDedup compaction discipline applied to the vector
    * index): every [[ivfIndexAppend]] adds one parquet file per
    * (cell, shard), so after N daily shards each probed cell pays N
    * file-opens at serve time while the DATA per cell is tiny. Compaction
    * rewrites every partition with `shard <= upTo` as ONE partition per
    * cell — keyed under the RESERVED [[CompactedShard]] id, which no
    * append can ever name, so a redelivered append of an absorbed shard
    * cannot dynamic-overwrite the merged data (round-18 ADVICE; the r17
    * `shard = upTo` keying lost the build's and older shards' vectors to
    * exactly that redelivery) — and copies partitions with `shard > upTo`
    * (an in-flight append under at-least-once delivery) verbatim. The set
    * of shard ids actually merged is recorded in the generation's
    * `_ABSORBED` manifest (cumulative across chained compactions), which
    * is what lets [[ivfIndexAppend]] distinguish a true redelivery
    * (no-op) from a first delivery that merely has a low shard id.
    *
    * Compaction is also where deletion becomes PHYSICAL: rows whose
    * vec_id is tombstoned ([[ivfIndexDelete]]) are anti-joined out of the
    * merged partition — the serve-side mask turns into reclaimed bytes.
    * Carried (`> upTo`) shards keep their tombstoned rows (they must stay
    * byte-verbatim for redelivery idempotence); the tombstone set is
    * retained either way, because a redelivered carried shard can
    * resurrect a deleted row's index entry and serve must keep masking it.
    *
    * Crash-safe without transactions, via GENERATION DIRECTORIES and an
    * atomically-flipped pointer: the compacted generation is fully
    * written to `store/index_c<upTo>` (a retry's initial delete clears a
    * half-written attempt — idempotent), then `store/CURRENT` is flipped
    * by temp-file + ATOMIC_MOVE rename; only after the flip is the old
    * generation deleted (best effort — a crash leaves harmless garbage a
    * later pass removes). A crash at ANY point leaves CURRENT naming a
    * complete generation, so serves never break. The generation name
    * derives from the constant base `index` plus a parsed epoch counter,
    * never by string-appending to the current generation — chained
    * compactions cannot accrete suffixes (the IngestDedup storeBaseName
    * lesson). A SECOND compaction at the SAME watermark (new tombstones,
    * or a raced append that landed a low shard after the flip) is
    * detected by probing for remaining work and runs under an
    * epoch-bumped name (`index_cNe2`, `e3`, …); a pure retry with no
    * work left converges as a no-op. Returns the live generation name.
    *
    * Concurrency boundary: compaction vs a SIMULTANEOUS append from a
    * different driver needs external coordination (this store is a
    * directory contract, not a lock service); within at-least-once
    * redelivery — the failure mode the lifecycle is designed for — both
    * sides converge, and [[ivfIndexAppend]]'s post-write generation fence
    * re-lands an append whose target generation was retired mid-write.
    */
  private[graft] def ivfIndexCompact(
      s: SparkSession, store: String, upTo: Long): String = {
    import s.implicits._
    require(upTo >= 0, s"compaction upTo must be >= 0, got $upTo")
    val liveName = ivfIndexLiveName(store)
    val base = s"index_c$upTo"
    val live = s.read.parquet(s"$store/$liveName")
      .select($"vec_id", $"v", $"qv8", $"qn",
        $"cell".cast("long").as("cell"), $"shard".cast("long").as("shard"))
    val gen =
      if (liveName != base && !liveName.startsWith(base + "e")) base
      else {
        // a pass at this watermark already FLIPPED. That can be a pure
        // retry (converge as a no-op) — or a genuinely NEW compaction
        // requested at the same watermark: tombstones added since the
        // flip, or a raced first-delivery append that landed a shard
        // <= upTo the earlier pass never saw. The bare name-equality
        // no-op silently skipped such a pass — tombstones added after
        // compact(upTo=N) were never physically dropped by a second
        // compact(upTo=N) (round-18 ADVICE). Distinguish by probing for
        // remaining work; a real new pass gets an EPOCH-bumped name
        // (index_cNe2, e3, …) so crash-retry convergence — delete and
        // rewrite under a deterministic name — still holds.
        val atOrBelow = live.filter($"shard" <= upTo) // includes CompactedShard
        val unmerged = !atOrBelow.filter($"shard" =!= CompactedShard).isEmpty
        val tombWork = !unmerged && ivfIndexTombstones(s, store).exists(t =>
          !atOrBelow.join(broadcast(t), Seq("vec_id"), "left_semi").isEmpty)
        if (!unmerged && !tombWork) return liveName
        val epoch =
          if (liveName == base) 2 else liveName.stripPrefix(base + "e").toInt + 1
        s"${base}e$epoch"
      }
    graft.util.Fs.deleteRecursively(s"$store/$gen") // retry convergence
    val merged = live.filter($"shard" <= upTo)
    // cumulative absorbed set: earlier generations' manifest + the real
    // shard ids this pass merges — parsed from the SAME file-index snapshot
    // the merge write reads ([[snapshotShardIds]] over `live.inputFiles`;
    // still zero Spark jobs). A fresh directory listing here raced a
    // concurrent append: a shard <= upTo committed between the snapshot
    // and the listing would be manifest-recorded as absorbed while its
    // rows were never merged, and the append's generation fence would
    // then no-op the re-land — a silently lost shard (round-21 ADVICE).
    val absorbed = ivfIndexAbsorbed(store, liveName) ++
      snapshotShardIds(live).filter(id => id >= 0 && id <= upTo)
    // physical deletion point: tombstoned rows leave the merged partition
    val compacted = ivfIndexTombstones(s, store)
      .map(t => merged.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(merged)
      .withColumn("shard", lit(CompactedShard))
      // one file per (cell, shard=CompactedShard): co-locate each cell
      .repartition($"cell")
    val carried = live.filter($"shard" > upTo)
    compacted.unionByName(carried)
      .write.partitionBy("cell", "shard").mode("overwrite").parquet(s"$store/$gen")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(store, gen, "_ABSORBED"),
      absorbed.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    // atomic pointer flip: readers see the old generation or the new one,
    // never a partial state
    val tmp = java.nio.file.Paths.get(store, s"CURRENT.tmp${System.nanoTime()}")
    java.nio.file.Files.write(tmp, gen.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(store, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // old generation is garbage only AFTER the flip
    graft.util.Fs.deleteRecursively(s"$store/$liveName")
    gen
  }

  /** Shard-IDEMPOTENT incremental append of `shard` (odd vec_ids —
    * "today's data") against the STORED centroids and scale — no retrain,
    * no rewrite of existing partitions. The shard id is the second
    * partition level and the write runs under DYNAMIC partition
    * overwrite, so it replaces only (cell=*, shard=N) — an at-least-once
    * retry of the same shard OVERWRITES its own partitions instead of
    * double-appending, and the build shard's partitions are never touched
    * (the IngestDedup store discipline applied to the vector index;
    * idempotency spec-proven via `retryAppend`). The overwrite mode rides
    * the WRITER (per-write option), not the session conf — a concurrent
    * write in the same session can never inherit it (round-17 ADVICE).
    *
    * Redelivery AFTER a compaction (round-18 ADVICE): if the live
    * generation's `_ABSORBED` manifest lists this shard, its rows already
    * live in the merged [[CompactedShard]] partition — the append
    * NO-OPS (writing under its own shard id would duplicate every row at
    * serve). A shard id that is numerically old but NOT in the manifest
    * (its first delivery raced the compaction, which never saw its rows)
    * still lands under its own id — no collision with the reserved
    * compacted partition is possible. And if a compaction retires the
    * target generation WHILE the append writes, the post-write fence
    * re-resolves the pointer and re-runs against the new generation (the
    * dropped-with-the-old-generation write is the r17 in-flight hole).
    */
  private[graft] def ivfIndexAppend(
      s: SparkSession, d: String, store: String, shard: Long = 1L,
      // optional (mod, rem) slice of the appendable half — a production
      // shard carries a DISJOINT subset of the day's data; the default
      // (1, 0) appends everything (the lifecycle key's single-shard shape).
      // The slice keys on the DENSE odd index (vec_id-1)/2, not vec_id
      // itself: odd ids mod an even modulus hit only odd remainders, so
      // slicing raw ids would leave half an even day-count's slices empty
      // (round-18 ADVICE — the bench's frag-store arm relied on this)
      slice: (Long, Long) = (1L, 0L),
      // test-injection seam: invoked with the RESOLVED live generation name
      // immediately before each write attempt, so a spec can interleave a
      // compaction pointer-flip between pointer resolution and the write
      // deterministically (Round19OpsSpec drives the in-flight-append
      // fence under real interleaving). Production default: no-op.
      preWrite: String => Unit = _ => ()): Unit = {
    import s.implicits._
    import graft.operators.IvfKMeans
    require(shard > 0,
      s"append shard ids are positive (0 = build, $CompactedShard reserved " +
        s"for compacted partitions); got $shard")
    val (cents, maxAbs) = ivfIndexMeta(s, store)
    val rows = quantWith(embVecs(s, d)
        .filter($"vec_id" % 2 =!= 0)
        .filter(pmod(($"vec_id" - 1) / 2, lit(slice._1)) === slice._2), maxAbs)
      .withColumn("cell", IvfKMeans.assignCell(s, cents, $"v"))
      .select($"vec_id", $"v", $"qv8", $"qn", $"cell")
      .withColumn("shard", lit(shard))
    var attempts = 0
    var landed = false
    // the last mid-write exception a generation flip explained away — kept
    // so an attempts-exhausted failure surfaces the real error, not just
    // the generic race message (round-18 ADVICE)
    var lastRaceLoss: Exception = null
    while (!landed) {
      attempts += 1
      if (attempts > 5)
        throw new IllegalStateException(
          s"append of shard $shard lost a generation race 5 times — " +
            "compactions are flipping faster than one shard write completes" +
            (if (lastRaceLoss == null) ""
             else " (last mid-write failure attached as cause)"),
          lastRaceLoss)
      val liveName = ivfIndexLiveName(store)
      if (ivfIndexAbsorbed(store, liveName).contains(shard)) {
        // at-least-once redelivery of a shard a compaction already merged:
        // the rows live in the CompactedShard partition — converge as a no-op
        landed = true
      } else {
        preWrite(liveName) // outside the try: a hook failure must surface
        try {
          rows.write.partitionBy("cell", "shard")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(s"$store/$liveName")
          // generation fence: a compaction that flipped the pointer during
          // the write deleted the target directory with the old generation
          // — loop and re-land against the generation it produced
          landed = ivfIndexLiveName(store) == liveName
          // the aborted write usually RECREATED the retired directory
          // (parquet overwrite to a deleted path succeeds) — drop it before
          // looping, or it orphans forever and, were CURRENT ever lost,
          // ivfIndexLiveName's 'index' fallback could resolve to the
          // partial orphan (round-19 ADVICE)
          if (!landed) graft.util.Fs.deleteRecursively(s"$store/$liveName")
        } catch {
          case e: Exception =>
            // a mid-write failure is only retryable if a flip explains it
            // (the target directory left with the retired generation);
            // anything else — bad input, executor loss — surfaces as-is
            if (ivfIndexLiveName(store) == liveName) throw e
            lastRaceLoss = e
            graft.util.Fs.deleteRecursively(s"$store/$liveName") // stale partial
        }
      }
    }
  }

  /** SERVE-ONLY against a prebuilt store: queries probe their nprobe
    * nearest cells (routing via the STORED centroids — no training, no
    * corpus pass), and the index is read back with a STATIC cell-list
    * partition filter (the union of probed cells — bounded by K), so the
    * scan reads ONLY the probed cells' files (PartitionFilters /
    * PartitionCount plan-gated in Round16OpsSpec via `inspect`) — at
    * 100 TB this is the difference between touching nprobe·K⁻¹ of the
    * index bytes and all of them. Ranking is the composed tier unchanged:
    * int8 shortlist ([[quantizedShortlistFrom]]) + full-precision rescore.
    */
  private[graft] def ivfIndexServeOnly(
      s: SparkSession, d: String, store: String,
      inspect: DataFrame => Unit = _ => (),
      nprobe: Int = 8,
      tombBroadcastCap: Long = TombstoneBroadcastCapBytes): DataFrame = {
    import s.implicits._
    ivfIndexServeQueries(s, store, embVecs(s, d).filter($"vec_id" < 10),
      inspect, nprobe, tombBroadcastCap)
  }

  /** [[ivfIndexServeOnly]] with the query traffic supplied by the caller
    * — (vec_id, v) rows; the streaming serve twin passes each micro-batch
    * here (round 17). The queries are quantized with the STORED scale and
    * routed via the STORED centroids, so serving needs no training and no
    * corpus pass regardless of where the traffic comes from. */
  private[graft] def ivfIndexServeQueries(
      s: SparkSession, store: String, queries: DataFrame,
      inspect: DataFrame => Unit = _ => (),
      nprobe: Int = 8,
      tombBroadcastCap: Long = TombstoneBroadcastCapBytes): DataFrame =
    ivfIndexServeQueriesWith(s, store, ivfIndexMeta(s, store), queries,
      inspect, nprobe, tombBroadcastCap)

  /** [[ivfIndexServeQueries]] with the store's (centroids, scale) meta
    * supplied by the caller — a long-lived serving process loads the meta
    * ONCE and reuses it across triggers, because the meta is IMMUTABLE
    * after build (appends assign against it, compaction rewrites data
    * only), so caching it is always safe. The TOMBSTONE set is NOT
    * cacheable the same way — deletes arrive between triggers and a
    * stale mask would serve taken-down vectors — so it is re-read per
    * call (one tiny parquet read, vs the meta's read+collect).
    * `StreamLatencyBench`'s serve arm measures both shapes to price the
    * per-trigger fixed cost. */
  private[graft] def ivfIndexServeQueriesWith(
      s: SparkSession, store: String,
      meta: (Seq[(Long, Seq[Double])], Double), queries: DataFrame,
      inspect: DataFrame => Unit = _ => (),
      nprobe: Int = 8,
      tombBroadcastCap: Long = TombstoneBroadcastCapBytes): DataFrame = {
    import s.implicits._
    import graft.operators.IvfKMeans
    val (cents, maxAbs) = meta
    val qPlan = quantWith(queries, maxAbs)
      .withColumn("p", explode(
        slice(array_sort(IvfKMeans.simStructs(s, cents, $"v")), 1, nprobe)))
      .select($"vec_id".as("q_id"), $"v".as("qvf"), $"qv8".as("qq8"),
        $"qn".as("qnq"), $"p.cid".as("bucket"))
    // ONE driver materialization of the probe rows (bounded: queries are
    // the serve REQUEST — queries × nprobe rows — never a corpus): the
    // probed-cell list derives locally and q re-enters the plan as a
    // LocalRelation, so the former localCheckpoint job + distinct-collect
    // job collapse into this single job, and the broadcast below builds
    // from local rows without a scan stage (round-19 VERDICT #5 — the
    // chain's cost at small sf is per-job fixed overhead).
    val qRows = qPlan.collect()
    guardBoundedCollect("ivfIndexServeQueriesWith probe rows", qRows.length,
      "serve traffic is a query request by contract, never a corpus — " +
        "batch the requests or lower nprobe")
    // bounded: ≤ K distinct probed cells — the static partition filter
    val probedCells = qRows.map(_.getLong(4)).distinct.toSeq
    val q = s.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qPlan.schema)
    val scanned = s.read.parquet(ivfIndexLiveDir(store))
      .where($"cell".isin(probedCells: _*))
      .select($"vec_id", $"v", $"qv8", $"qn", $"cell".cast("long").as("bucket"))
    // deletion mask: tombstoned vectors never reach the shortlist — the
    // anti-join runs AFTER the partition prune (only probed cells' rows
    // pay it) and BEFORE the shortlist cut (so serve-with-tombstones is
    // row-identical to serving an index rebuilt without the deleted
    // vectors — spec-proven). The mask itself is PRUNED to the probed
    // cells' tombstone partitions (+ the out-of-order residual) — the
    // serve never touches the global set — and SIZE-GATED on the pruned
    // bytes actually read: broadcast anti-join under
    // [[TombstoneBroadcastCapBytes]], shuffle-HASH anti-join past it
    // (round-19 VERDICT #4 — the ~10^8-id broadcast ceiling is gone; the
    // forced arm q_similarity_index_delete_cell proves the non-broadcast
    // path oracle-identical). Absent tombstones the plan is byte-unchanged.
    val stored = ivfIndexTombstonesPruned(s, store, Some(probedCells)) match {
      case None => scanned
      case Some((t, bytes)) if bytes <= tombBroadcastCap =>
        scanned.join(broadcast(t), Seq("vec_id"), "left_anti")
      case Some((t, _)) =>
        scanned.join(t.hint("shuffle_hash"), Seq("vec_id"), "left_anti")
    }
    val top3 = quantizedTop3Of(s,
      quantizedShortlistFrom(s, stored, q).filter($"q_id" =!= $"c_id"))
    inspect(top3) // plan gate hook: partition pruning on the stored scan
    top3
  }

  /** The oracle-gated lifecycle key: [[ivfIndexBuild]] →
    * [[ivfIndexAppend]] → [[ivfIndexServeOnly]] composed over an
    * ephemeral store (the DuckDB hash certifies that persistence + append
    * added and lost nothing). Production runs the three entry points
    * separately against a named shared-storage store — serve-only
    * wall-clock and pruned-bytes fraction are measured by
    * `graft.tools.IndexServeBench` and recorded in BENCH_SCALING.
    */
  private[graft] def ivfIndexServe(
      s: SparkSession, d: String,
      inspect: DataFrame => Unit = _ => (),
      nprobe: Int = 8,
      retryAppend: Boolean = false): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_index").toString
    try {
      ivfIndexBuild(s, d, dir)
      ivfIndexAppend(s, d, dir)
      if (retryAppend) ivfIndexAppend(s, d, dir) // at-least-once redelivery
      ivfIndexServeOnly(s, d, dir, inspect, nprobe)
        .localCheckpoint() // 30 rows; then release the index dir
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  /** DuckDB replay of [[ivfIndexServe]]'s lifecycle semantics — training
    * and scale over the even half, assignment/quantization of both halves,
    * probe, int8 shortlist, rescore; ends in `sc (q_id, c_id, iq, sim4)`.
    * `lloydIterSql` trains over the CTE named `n` (the build corpus);
    * `en` carries every vector for assignment/probing. */
  private[queries] lazy val ivfIndexServeCtes: String =
    ivfIndexServeCtesWhere("TRUE")

  /** [[ivfIndexServeCtes]] with a candidate-side predicate spliced into
    * the probe join — `candPred` sees the index row as `ce`. The delete
    * key replays its tombstone mask this way (`ce.vec_id % 10 <> 3`):
    * excluding a vector from candidacy BEFORE the shortlist cut is
    * exactly what the engine's pre-shortlist anti-join does, so the hash
    * certifies the mask's position in the pipeline, not just its set. */
  private[queries] def ivfIndexServeCtesWhere(candPred: String): String =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |en AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |n AS (SELECT * FROM en WHERE vec_id % 2 = 0),
       |c0 AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
       |  WHERE vec_id % 97 = 0 AND vec_id < 1552),
       |${lloydIterSql(0)},
       |${lloydIterSql(1)},
       |asg AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) AS rk
       |  FROM (
       |    SELECT en.vec_id, c.cid,
       |      ROUND(list_sum(list_transform(range(1, 65), i -> en.v[i] * c.cv[i])) / (en.nrm * c.cnrm), 6) AS cos6
       |    FROM en, c2 c)),
       |cells AS (SELECT vec_id, cid AS cell FROM asg WHERE rk = 1),
       |probes AS (SELECT vec_id AS q_id, cid AS cell FROM asg WHERE vec_id < 10 AND rk <= 8),
       |ma AS (
       |  SELECT MAX(list_max(list_transform(v, x -> abs(x)))) AS maxabs
       |  FROM e WHERE vec_id % 2 = 0),
       |q8 AS (
       |  SELECT vec_id,
       |    CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::BIGINT)
       |         ELSE list_transform(v, x -> CAST(FLOOR(x * 127.0 / maxabs + 0.5) AS BIGINT)) END AS qv8
       |  FROM e, ma),
       |qn8 AS (
       |  SELECT vec_id, qv8, CAST(list_sum(list_transform(qv8, q -> q * q)) AS BIGINT) AS qn
       |  FROM q8),
       |cp AS (
       |  SELECT p.q_id, ce.vec_id AS c_id
       |  FROM probes p JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.q_id AND ($candPred)),
       |iq AS (
       |  SELECT cp.q_id, cp.c_id,
       |    CAST(list_sum(list_transform(range(1, 65), i -> a.qv8[i] * z.qv8[i])) AS BIGINT) AS iq,
       |    a.qn AS qnq, z.qn AS qnc
       |  FROM cp JOIN qn8 a ON a.vec_id = cp.q_id JOIN qn8 z ON z.vec_id = cp.c_id),
       |iqc AS (
       |  SELECT q_id, c_id, iq,
       |    CASE WHEN qnq = 0 OR qnc = 0 THEN -2.0
       |         ELSE CAST(iq AS DOUBLE) / sqrt(CAST(qnq * qnc AS DOUBLE)) END AS iqcos,
       |    COUNT(*) OVER (PARTITION BY q_id) AS ncand
       |  FROM iq),
       |short AS (
       |  SELECT q_id, c_id, iq FROM (
       |    SELECT q_id, c_id, iq, ncand,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY iqcos DESC, c_id) AS irk
       |    FROM iqc) t
       |  WHERE irk <= GREATEST(15, CAST(CEIL(ncand / 8.0) AS BIGINT))),
       |sc AS (
       |  SELECT s.q_id, s.c_id, s.iq,
       |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 AS sim4
       |  FROM short s JOIN en q ON q.vec_id = s.q_id JOIN en c ON c.vec_id = s.c_id)""".stripMargin

  /** DuckDB replay of [[ivfQuantizedTop3]] — the ann_ivf training/probe
    * CTEs composed with the quantized tier's code/shortlist CTEs, ending
    * in `sc (q_id, c_id, iq, sim4)` (the rescored shortlist). */
  private lazy val ivfQuantizedCtes: String =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |c0 AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
       |  WHERE vec_id % 97 = 0 AND vec_id < 1552),
       |${lloydIterSql(0)},
       |${lloydIterSql(1)},
       |asg AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) AS rk
       |  FROM (
       |    SELECT n.vec_id, c.cid,
       |      ROUND(list_sum(list_transform(range(1, 65), i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS cos6
       |    FROM n, c2 c)),
       |cells AS (SELECT vec_id, cid AS cell FROM asg WHERE rk = 1),
       |probes AS (SELECT vec_id AS q_id, cid AS cell FROM asg WHERE vec_id < 10 AND rk <= 8),
       |ma AS (SELECT MAX(list_max(list_transform(v, x -> abs(x)))) AS maxabs FROM e),
       |q8 AS (
       |  SELECT vec_id,
       |    CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::BIGINT)
       |         ELSE list_transform(v, x -> CAST(FLOOR(x * 127.0 / maxabs + 0.5) AS BIGINT)) END AS qv8
       |  FROM e, ma),
       |qn8 AS (
       |  SELECT vec_id, qv8, CAST(list_sum(list_transform(qv8, q -> q * q)) AS BIGINT) AS qn
       |  FROM q8),
       |cp AS (
       |  SELECT p.q_id, ce.vec_id AS c_id
       |  FROM probes p JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.q_id),
       |iq AS (
       |  SELECT cp.q_id, cp.c_id,
       |    CAST(list_sum(list_transform(range(1, 65), i -> a.qv8[i] * z.qv8[i])) AS BIGINT) AS iq,
       |    a.qn AS qnq, z.qn AS qnc
       |  FROM cp JOIN qn8 a ON a.vec_id = cp.q_id JOIN qn8 z ON z.vec_id = cp.c_id),
       |iqc AS (
       |  SELECT q_id, c_id, iq,
       |    CASE WHEN qnq = 0 OR qnc = 0 THEN -2.0
       |         ELSE CAST(iq AS DOUBLE) / sqrt(CAST(qnq * qnc AS DOUBLE)) END AS iqcos,
       |    COUNT(*) OVER (PARTITION BY q_id) AS ncand
       |  FROM iq),
       |short AS (
       |  SELECT q_id, c_id, iq FROM (
       |    SELECT q_id, c_id, iq, ncand,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY iqcos DESC, c_id) AS irk
       |    FROM iqc) t
       |  WHERE irk <= GREATEST(15, CAST(CEIL(ncand / 8.0) AS BIGINT))),
       |sc AS (
       |  SELECT s.q_id, s.c_id, s.iq,
       |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 AS sim4
       |  FROM short s JOIN n q ON q.vec_id = s.q_id JOIN n c ON c.vec_id = s.c_id)""".stripMargin

  /** DuckDB replay of [[quantizedLshBase]] + the bucket candidate pairs —
    * ends in `n (vec_id, v, bucket, nrm)`, `q8 (vec_id, qv8)`,
    * `cp (q_id, c_id)` (the LSH bucket candidates for queries vec_id < 10)
    * and `iq (q_id, c_id, iq)` (the exact integer code dot products).
    * The bucket CTE is the q_similarity_ann_lsh lattice replay; the
    * quantization recomputes the same single GLOBAL max|x| scale (the
    * `ma` CTE — the 1-row value the engine baked as a plan literal;
    * identical doubles → identical codes).
    */
  private lazy val quantizedLshCtes: String =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |b AS (
       |  SELECT vec_id, v,
       |    CAST(list_sum(list_transform(range(0, 8), p ->
       |      CASE WHEN list_sum(list_transform(range(0, 64),
       |          i -> v[i + 1] * CAST((([${PipelineQueries.lshA.mkString(",")}]::BIGINT[])[p + 1] * (i + 1)
       |                              + ([${PipelineQueries.lshB.mkString(",")}]::BIGINT[])[p + 1]) % 1009 - 504 AS DOUBLE))) > 0
       |           THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS bucket
       |  FROM e),
       |n AS (SELECT vec_id, v, bucket, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM b),
       |ma AS (SELECT MAX(list_max(list_transform(v, x -> abs(x)))) AS maxabs FROM e),
       |q8 AS (
       |  SELECT vec_id,
       |    CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::BIGINT)
       |         ELSE list_transform(v, x -> CAST(FLOOR(x * 127.0 / maxabs + 0.5) AS BIGINT)) END AS qv8
       |  FROM e, ma),
       |qn8 AS (
       |  SELECT vec_id, qv8, CAST(list_sum(list_transform(qv8, q -> q * q)) AS BIGINT) AS qn
       |  FROM q8),
       |cp AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id
       |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |iq AS (
       |  SELECT cp.q_id, cp.c_id,
       |    CAST(list_sum(list_transform(range(1, 65), i -> a.qv8[i] * z.qv8[i])) AS BIGINT) AS iq,
       |    a.qn AS qnq, z.qn AS qnc
       |  FROM cp JOIN qn8 a ON a.vec_id = cp.q_id JOIN qn8 z ON z.vec_id = cp.c_id),
       |iqc AS (
       |  SELECT q_id, c_id, iq,
       |    CASE WHEN qnq = 0 OR qnc = 0 THEN -2.0
       |         ELSE CAST(iq AS DOUBLE) / sqrt(CAST(qnq * qnc AS DOUBLE)) END AS iqcos,
       |    COUNT(*) OVER (PARTITION BY q_id) AS ncand
       |  FROM iq),
       |short AS (
       |  SELECT q_id, c_id, iq FROM (
       |    SELECT q_id, c_id, iq, ncand,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY iqcos DESC, c_id) AS irk
       |    FROM iqc) t
       |  WHERE irk <= GREATEST(15, CAST(CEIL(ncand / 8.0) AS BIGINT)))""".stripMargin

  /** DuckDB replay of [[imagePhashNearPairs]] — extends `imageAhashCtes`
    * with the rep table `hh`, the 4×16-bit band explode `bb`, the any-band
    * candidate join `cand`, and the verified pair list
    * `np (doc_a, doc_b, hamming ≤ 3)`. */
  private lazy val imagePhashNearCtes: String =
    s"""$imageAhashCtes,
       |hh AS (SELECT h_hi, h_lo, MIN(doc_id) AS doc_id FROM h GROUP BY h_hi, h_lo),
       |bb AS (
       |  SELECT doc_id, h_hi, h_lo, band,
       |    CASE WHEN band = 0 THEN h_lo % 65536
       |         WHEN band = 1 THEN h_lo // 65536
       |         WHEN band = 2 THEN h_hi % 65536
       |         ELSE h_hi // 65536 END AS v
       |  FROM (SELECT doc_id, h_hi, h_lo, unnest(range(4)) AS band FROM hh)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    x.h_hi AS ahi, x.h_lo AS alo, y.h_hi AS bhi, y.h_lo AS blo
       |  FROM bb x JOIN bb y ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id),
       |np AS (
       |  SELECT * FROM (
       |    SELECT doc_a, doc_b,
       |      CAST(bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) AS BIGINT) AS hamming
       |    FROM cand) t
       |  WHERE hamming <= 3)""".stripMargin

  /** DuckDB replay of the PRODUCTION 8×8-bit-band near tier
    * (`bandedHammingPairs(nBands = 8, maxDist = 7)`) over ANY hash CTE
    * chain ending in `h (doc_id, h_hi, h_lo)` — the rep table `hh`, the
    * 8-band explode `bb8`, the any-band candidate join `cand8`, and the
    * verified pair list `np8 (doc_a, doc_b, hamming ≤ 7)`. Shared by the
    * image (aHash) and audio (energy-profile) modalities — the banding
    * machinery is hash-source-agnostic on both engine and oracle sides.
    */
  private def bandedB8CtesOver(hashCtes: String): String =
    s"""$hashCtes,
       |hh AS (SELECT h_hi, h_lo, MIN(doc_id) AS doc_id FROM h GROUP BY h_hi, h_lo),
       |bb8 AS (
       |  SELECT doc_id, h_hi, h_lo, band,
       |    CASE WHEN band = 0 THEN h_lo % 256
       |         WHEN band = 1 THEN (h_lo // 256) % 256
       |         WHEN band = 2 THEN (h_lo // 65536) % 256
       |         WHEN band = 3 THEN (h_lo // 16777216) % 256
       |         WHEN band = 4 THEN h_hi % 256
       |         WHEN band = 5 THEN (h_hi // 256) % 256
       |         WHEN band = 6 THEN (h_hi // 65536) % 256
       |         ELSE (h_hi // 16777216) % 256 END AS v
       |  FROM (SELECT doc_id, h_hi, h_lo, unnest(range(8)) AS band FROM hh)),
       |cand8 AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    x.h_hi AS ahi, x.h_lo AS alo, y.h_hi AS bhi, y.h_lo AS blo
       |  FROM bb8 x JOIN bb8 y ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id),
       |np8 AS (
       |  SELECT * FROM (
       |    SELECT doc_a, doc_b,
       |      CAST(bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) AS BIGINT) AS hamming
       |    FROM cand8) t
       |  WHERE hamming <= 7)""".stripMargin

  private lazy val imagePhashNearB8Ctes: String = bandedB8CtesOver(imageAhashCtes)

  /** Per-audio-asset energy-profile fingerprint over the REAL WAV decode
    * (round 17 — the audio member of the perceptual-dedup family, the
    * aHash discipline applied to sound): samples bin into 64 equal-width
    * time bins (bin = ⌊64·i/n⌋), per-bin short-time energy E_b = Σ s²
    * (exact int64), bit_b = (64·E_b ≥ ΣE) — cross-multiplied, no
    * division, no float — packed into two shift-safe 32-bit halves. Two
    * recordings with the same coarse energy envelope (the loudness
    * contour, robust to small per-sample perturbations) collide; the
    * near tier widens to Hamming-adjacent envelopes through the SAME
    * banded machinery the image tier uses.
    */
  private def audioFps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val assets = graft.multimodal.Multimodal
      .assetsFromDocumentsCodec(s, documents(s, d)
        .filter($"doc_id" % 2 === 1 && length($"text") >= 1))
    assets.mapPartitions(_.map { a =>
      val wav = graft.multimodal.WavCodec.decode(a.content)
        .getOrElse(throw new IllegalStateException(s"undecodable fixture ${a.asset_id}"))
      val n = wav.samples.length
      val e = new Array[Long](64)
      var i = 0
      while (i < n) {
        val v = wav.samples(i).toLong
        e(((i.toLong * 64) / n).toInt) += v * v
        i += 1
      }
      var tot = 0L
      var j = 0
      while (j < 64) { tot += e(j); j += 1 }
      var lo = 0L; var hi = 0L
      j = 0
      while (j < 32) { if (tot > 0 && 64 * e(j) >= tot) lo |= 1L << j; j += 1 }
      while (j < 64) { if (tot > 0 && 64 * e(j) >= tot) hi |= 1L << (j - 32); j += 1 }
      (a.asset_id, hi, lo)
    }).toDF("doc_id", "h_hi", "h_lo")
  }

  /** DuckDB replay of [[audioFps]] — ends in `h (doc_id, h_hi, h_lo)`;
    * the oracle reconstructs the decoded samples from `text`
    * (s = (byte − 128)·256, the WAV fixture's exact inverse), so a decode
    * slip breaks every fingerprint. Bins absent for short clips (n < 64)
    * contribute zero bits on both sides (engine: E_b = 0 and ΣE > 0 on
    * any real signal; oracle: no row for the bin). */
  private val audioFpCtes: String =
    """ad AS (
      |  SELECT doc_id, text, length(text) AS n FROM documents
      |  WHERE doc_id % 2 = 1 AND length(text) >= 1),
      |sm AS (
      |  SELECT doc_id, n, i,
      |    (ascii(substring(text, CAST(i + 1 AS INT), 1)) - 128) * 256 AS s
      |  FROM (SELECT doc_id, text, n, unnest(range(n)) AS i FROM ad)),
      |be AS (
      |  SELECT doc_id, (i * 64) // n AS b, SUM(CAST(s AS BIGINT) * s) AS e
      |  FROM sm GROUP BY 1, 2),
      |te AS (SELECT doc_id, SUM(e) AS tot FROM be GROUP BY 1),
      |h AS (
      |  SELECT be.doc_id,
      |    CAST(SUM(CASE WHEN b >= 32 AND tot > 0 AND 64 * e >= tot
      |      THEN (1::BIGINT << CAST(b - 32 AS INT)) ELSE 0 END) AS BIGINT) AS h_hi,
      |    CAST(SUM(CASE WHEN b < 32 AND tot > 0 AND 64 * e >= tot
      |      THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS h_lo
      |  FROM be JOIN te USING (doc_id) GROUP BY be.doc_id)""".stripMargin

  /** Per-video temporal fingerprint over the REAL container + frame
    * decode (round 18 — the VIDEO member of the perceptual-dedup triple;
    * images and audio already carry the aHash / energy-profile tiers):
    * the audio energy-profile discipline applied VERBATIM to the video's
    * decoded pixel timeline. Every asset is the MJPEG-in-MP4 corpus
    * (q_multimodal_video_frames' construction): the real ISO-BMFF box
    * walk extracts the samples, the real JPEG decoder yields each
    * frame's pixels, and the concatenated (frame-order × row-major)
    * luminance stream bins into 64 equal-width TIME bins — E_b = Σ v²
    * (exact int64; v ≤ 254 and ≤ 896 px keep Σ far from overflow),
    * bit_b = (64·E_b ≥ ΣE), cross-multiplied, packed into shift-safe
    * 32-bit halves. Assets the decode REJECTS carry no fingerprint: a
    * truncated container or a corrupt frame is quarantined by the codec
    * result itself (the engine filters on decode success; the oracle
    * replays the corpus's planted corruption rules), because hashing a
    * half-decoded video would cluster it by failure mode, not content.
    */
  private def videoFps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val assets = graft.multimodal.Multimodal
      .assetsFromDocumentsMjpeg(s, documents(s, d))
    assets.mapPartitions(_.flatMap { a =>
      graft.multimodal.Mp4Codec.decode(a.content) match {
        case None => Iterator.empty // container-corrupt: quarantined
        case Some(m) =>
          val fs = m.samples.map(sb => graft.multimodal.JpegCodec.decode(sb))
          if (fs.exists(_.isEmpty)) Iterator.empty // frame-corrupt: quarantined
          else {
            val px = fs.iterator.flatMap(_.get.pixels.iterator).toArray
            val n = px.length
            val e = new Array[Long](64)
            var i = 0
            while (i < n) {
              val v = (px(i) & 0xff).toLong
              e(((i.toLong * 64) / n).toInt) += v * v
              i += 1
            }
            var tot = 0L
            var j = 0
            while (j < 64) { tot += e(j); j += 1 }
            var lo = 0L; var hi = 0L
            j = 0
            while (j < 32) { if (tot > 0 && 64 * e(j) >= tot) lo |= 1L << j; j += 1 }
            while (j < 64) { if (tot > 0 && 64 * e(j) >= tot) hi |= 1L << (j - 32); j += 1 }
            Iterator.single((a.asset_id, hi, lo))
          }
      }
    }).toDF("doc_id", "h_hi", "h_lo")
  }

  /** DuckDB replay of [[videoFps]] — ends in `h (doc_id, h_hi, h_lo)`;
    * the oracle reconstructs every decoded pixel from doc_id (block b of
    * frame k is constant 128 + 2·t, t = ((7·id + 13·k + 29·b) mod 128) −
    * 64, row-major 16×8 so blocks interleave every 8 pixels), so a box
    * walk, Huffman, dequant, IDCT, or bin-arithmetic slip breaks every
    * fingerprint. The corruption rules (% 89 container, % 97 last-frame)
    * replay the engine's decode-success quarantine. */
  private val videoFpCtes: String =
    """vd AS (
      |  SELECT doc_id, CAST(1 + doc_id % 7 AS BIGINT) AS nf FROM documents
      |  WHERE doc_id % 89 <> 0 AND doc_id % 97 <> 0),
      |vfr AS (SELECT doc_id, nf, unnest(range(nf)) AS k FROM vd),
      |vpx AS (SELECT doc_id, nf, k, unnest(range(128)) AS i FROM vfr),
      |vpv AS (
      |  SELECT doc_id, nf, k, i,
      |    128 + 2 * (((doc_id * 7 + k * 13 + ((i % 16) // 8) * 29) % 128) - 64) AS v
      |  FROM vpx),
      |vbe AS (
      |  SELECT doc_id, ((k * 128 + i) * 64) // (128 * nf) AS b,
      |    SUM(CAST(v AS BIGINT) * v) AS e
      |  FROM vpv GROUP BY 1, 2),
      |vte AS (SELECT doc_id, SUM(e) AS tot FROM vbe GROUP BY 1),
      |h AS (
      |  SELECT vbe.doc_id,
      |    CAST(SUM(CASE WHEN b >= 32 AND tot > 0 AND 64 * e >= tot
      |      THEN (1::BIGINT << CAST(b - 32 AS INT)) ELSE 0 END) AS BIGINT) AS h_hi,
      |    CAST(SUM(CASE WHEN b < 32 AND tot > 0 AND 64 * e >= tot
      |      THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS h_lo
      |  FROM vbe JOIN vte USING (doc_id) GROUP BY vbe.doc_id)""".stripMargin

  /** DuckDB replay of [[imageAhashes]] — ends in `h (doc_id, h_lo, h_hi)`;
    * the oracle reconstructs the decoded pixels from `text` so a decode
    * slip breaks every hash. */
  private val imageAhashCtes: String =
    """b AS (
      |  SELECT doc_id, list_transform(range(0, 192),
      |    i -> CASE WHEN i < length(text) THEN ascii(substring(text, CAST(i + 1 AS INT), 1)) ELSE 0 END) AS pb
      |  FROM documents WHERE doc_id % 2 = 0),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 64), i -> pb[CAST(3 * i + 1 AS INT)] + pb[CAST(3 * i + 2 AS INT)] + pb[CAST(3 * i + 3 AS INT)]) AS lum
      |  FROM b),
      |s AS (SELECT doc_id, lum, list_sum(lum) AS tot FROM g),
      |h AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 32),
      |      i -> CASE WHEN 64 * lum[CAST(i + 1 AS INT)] >= tot THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS h_lo,
      |    CAST(list_sum(list_transform(range(32, 64),
      |      i -> CASE WHEN 64 * lum[CAST(i + 1 AS INT)] >= tot THEN (1::BIGINT << CAST(i - 32 AS INT)) ELSE 0 END)) AS BIGINT) AS h_hi
      |  FROM s)""".stripMargin

  val entries: Map[String, QueryDef] = Map(
    // ---------------------------------------------------------- dedup
    "q_dedup_exact" -> QueryDef(
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .withColumn("fp", md5(lower(trim($"text"))))
          .groupBy($"fp")
          .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
          .orderBy($"doc_id")
      },
      Some("""SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY doc_id""".stripMargin)
    ),

    "q_dedup_fuzzy" -> QueryDef(
      // Word-set fingerprint: identical token sets (any order/multiplicity)
      // collapse — unigram-Jaccard==1.0 near-duplicate clusters.
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .withColumn("fp", md5(array_join(array_sort(array_distinct(split($"text", " "))), " ")))
          .groupBy($"fp")
          .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_members"))
          .orderBy($"doc_id")
      },
      Some("""SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             |  MIN(doc_id) AS doc_id, COUNT(*) AS n_members
             |FROM documents GROUP BY 1 ORDER BY doc_id""".stripMargin)
    ),

    "q_dedup_minhash_lsh" -> QueryDef(
      // MinHash+LSH near-dup pairs: one md5 per distinct 3-token shingle →
      // 48-bit int, then 16 affine universal hashes ((a*h+b) mod 2^31-1 —
      // pure codegen'd arithmetic, no further digesting), 4 bands × 4 rows;
      // candidates from the (band, key) equi-join — never an all-pairs
      // product — verified with exact Jaccard >= 0.5. The shingle set is
      // persisted across the signature and verify branches (at 100 TB this
      // is the "materialize signatures once" checkpoint).
      // The verify step compares HASHED shingle sets (sorted distinct, via
      // the codegen'd two-pointer merge) rather than string sets — the hash
      // pass already exists for the signatures, and both engines hash
      // identically, so a collision merges the same two shingles on both
      // sides and parity is exact by construction.
      (s, d) => {
        import s.implicits._
        // spread the corpus before the per-doc shingle+md5 work: a compact
        // parquet file arrives in one or two scan partitions, which would
        // single-thread the hashing (at real scale the source is already
        // thousands of splits and the repartition is a no-op to remove)
        val sh = documents(s, d)
          .select($"doc_id", $"text")
          .repartition($"doc_id")
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 3)
          // fused shingle kernel (gram assembly + md5 + mod in one compiled
          // loop, element-identical to the two-step HOF — Round11OpsSpec)
          .select($"doc_id", graft.functions.Grams3Hash48.grams3Hash48(s, $"tok").as("hs"))
          .withColumn("hsd", array_sort(array_distinct($"hs")))
          .withColumn("sz", size($"hsd"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sig = sh.select($"doc_id",
          graft.functions.LshFunctions.minhashSig(s, $"hs").as("sig"))
        val bands = sig.select($"doc_id",
          explode(expr("transform(sequence(0, 3), b -> struct(b AS band, concat_ws('|', slice(sig, b*4+1, 4)) AS bkey))"))
            .as("bb"))
          .select($"doc_id", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
        val cand = bands.as("x")
          .join(bands.as("y"), Seq("band", "bkey"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(sh.select($"doc_id".as("doc_a"), $"hsd".as("h_a"), $"sz".as("sz_a")), Seq("doc_a"))
          .join(sh.select($"doc_id".as("doc_b"), $"hsd".as("h_b"), $"sz".as("sz_b")), Seq("doc_b"))
          .withColumn("ov", graft.functions.SetOps.sortedIntersectSize(s, $"h_a", $"h_b"))
          .withColumn("jaccard", $"ov".cast("double") / ($"sz_a" + $"sz_b" - $"ov"))
          .filter($"jaccard" >= 0.5)
          .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
              |sh AS (
              |  SELECT doc_id, list_distinct(list_transform(range(0, len(tok)-2),
              |    i -> tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3])) AS shingles
              |  FROM toks WHERE len(tok) >= 3),
              |hs AS (
              |  SELECT doc_id, list_transform(shingles,
              |    g -> ('0x' || substring(md5(g), 1, 12))::BIGINT % 2147483647) AS hs
              |  FROM sh),
              |hsz AS (
              |  SELECT doc_id, list_distinct(hs) AS hsd, len(list_distinct(hs)) AS sz FROM hs),
              |sig AS (
              |  SELECT doc_id, list_transform(range(0, 16),
              |    s -> list_min(list_transform(hs,
              |      h -> ([${PipelineQueries.lshA.mkString(",")}][s + 1] * h
              |          + [${PipelineQueries.lshB.mkString(",")}][s + 1]) % 2147483647))) AS sig
              |  FROM hs),
              |bands AS (
              |  SELECT doc_id, CAST(c.band AS INTEGER) AS band, c.bkey FROM (
              |    SELECT doc_id, unnest(list_transform(range(0, 4),
              |      b -> {'band': b, 'bkey': array_to_string(sig[b*4+1 : b*4+4], '|')})) AS c
              |    FROM sig)),
              |cand AS (
              |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
              |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
              |pairs AS (
              |  SELECT doc_a, doc_b,
              |    CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE)
              |      / (a.sz + b.sz - len(list_intersect(a.hsd, b.hsd))) AS jac
              |  FROM cand JOIN hsz a ON a.doc_id = doc_a JOIN hsz b ON b.doc_id = doc_b)
              |SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard
              |FROM pairs WHERE jac >= 0.5 ORDER BY doc_a, doc_b""".stripMargin)
    ),

    "q_dedup_containment" -> QueryDef(
      // Containment-based near-dup classification — the measure Jaccard
      // dedup is structurally blind to: a short doc fully quoted inside a
      // long one has containment |A∩B|/min(|A|,|B|) ≈ 1 while Jaccard
      // |A∩B|/|A∪B| stays far below any dedup threshold. Candidate
      // generation must therefore NOT be Jaccard-tuned MinHash bands
      // (band collision probability ~j^4 → short-in-long pairs are
      // structurally unreachable); instead it is the PPJoin-family
      // inverted-index form: candidates = docs sharing a RARE shingle
      // (2 ≤ doc-frequency ≤ 8). A contained doc shares its ENTIRE
      // shingle set with its container, so recall is deterministic UNDER
      // THE PRECONDITION that the contained doc owns at least one shingle
      // with df in [2, 8]. The df cap bounds per-shingle fan-out at
      // C(8,2)=28 pairs, keeping candidate count linear in corpus size
      // (rare shingles dominate real vocabularies by Zipf).
      //
      // HEAVY-SHINGLE ESCALATION TIER (round 11): a doc quoted into MORE
      // than 8 containers has every shingle above the band and generates
      // zero primary candidates. Such BAND-BLIND docs (min df over their
      // shingles > 8 — by definition every shingle is heavy) escalate
      // exactly ONE shingle: their rarest (min df, tie min h — a
      // deterministic total order both engines replay), joined against
      // that shingle's full posting list when its df ≤ 64. Fan-out bound:
      // ≤ 63 pairs PER BAND-BLIND DOC (not per shingle), and band-blind
      // docs are the fully-boilerplate minority by Zipf — at 100 TB the
      // anchor join is a broadcast of the tiny anchor set against the
      // inverted index, no new shuffle of the corpus. Anchors with
      // df > 64 (65+-way replication) remain the documented hand-off to
      // the LINEAR tiers (q_dedup_paragraph drops the quoted block from
      // every later doc; q_dedup_exact collapses whole-doc copies) —
      // Round10OpsSpec proves both the catch at 20 containers and the
      // hand-off past the cap. Verification is exact containment via the codegen'd
      // sorted two-pointer intersect; both thresholds are integer
      // cross-multiplications (5·ov ≥ 4·min(sz) for θ=0.8;
      // 3·ov < sz_a+sz_b flags pairs Jaccard<0.5 dedup would MISS) — no
      // float decides membership. Shingle hashing is shared verbatim with
      // q_dedup_minhash_lsh (md5→48-bit grams), so both engines hash
      // identically and a collision merges the same pair on both sides.
      (s, d) => {
        import s.implicits._
        val sh = documents(s, d)
          .select($"doc_id", $"text")
          .repartition($"doc_id")
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 3)
          // fused shingle kernel (gram assembly + md5 + mod in one compiled
          // loop, element-identical to the two-step HOF — Round11OpsSpec)
          .select($"doc_id", graft.functions.Grams3Hash48.grams3Hash48(s, $"tok").as("hs"))
          .withColumn("hsd", array_sort(array_distinct($"hs")))
          .withColumn("sz", size($"hsd"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ex = sh.select($"doc_id", explode($"hsd").as("h"))
        // df as a WINDOW COUNT over the exploded table (the round-7
        // lesson): one h-exchange attaches df in place, and every h-keyed
        // consumer below (the rare-band self-join, the anchor posting-list
        // probe) reuses that same partitioning — the groupBy+join-back
        // form re-exchanged the full gram table per consumer. Persisted
        // because three candidate arms read it.
        val exdf = ex
          .withColumn("df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"h")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val exr = exdf.filter($"df".between(2L, 8L))
        val primary = exr.as("x")
          .join(exr.as("y"), Seq("h"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        // heavy tier: band-blind docs escalate their single rarest shingle
        // (min df, tie min h); anchors with df <= 64 join the full posting
        // list — <= 63 pairs per band-blind doc, broadcast-sized anchor set
        val anchorWin = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"df", $"h")
        val anchors = exdf
          .withColumn("rn", row_number().over(anchorWin))
          .filter($"rn" === 1 && $"df" > 8L && $"df" <= 64L)
          .select($"doc_id".as("bb_doc"), $"h")
        val heavy = broadcast(anchors).join(ex, Seq("h"))
          .filter($"doc_id" =!= $"bb_doc")
          .select(least($"bb_doc", $"doc_id").as("doc_a"),
            greatest($"bb_doc", $"doc_id").as("doc_b"))
        val cand = primary.union(heavy).distinct()
        val out = cand
          .join(sh.select($"doc_id".as("doc_a"), $"hsd".as("h_a"), $"sz".as("sz_a")), Seq("doc_a"))
          .join(sh.select($"doc_id".as("doc_b"), $"hsd".as("h_b"), $"sz".as("sz_b")), Seq("doc_b"))
          .withColumn("ov", graft.functions.SetOps.sortedIntersectSize(s, $"h_a", $"h_b"))
          .withColumn("min_sz", least($"sz_a", $"sz_b"))
          .filter($"ov" * 5L >= $"min_sz" * 4L)
          .withColumn("containment", round($"ov".cast("double") / $"min_sz", 4))
          .withColumn("jaccard_missed", $"ov" * 3L < $"sz_a" + $"sz_b")
          .select($"doc_a", $"doc_b", $"containment", $"jaccard_missed")
          .orderBy($"doc_a", $"doc_b")
          // materialize, then drop the two caches: in a long session
          // (bench/verify sweeps) leaked MEMORY_AND_DISK blocks accumulate
          // for the SparkSession's lifetime (the pagerank pattern)
          .localCheckpoint()
        sh.unpersist(blocking = false)
        exdf.unpersist(blocking = false)
        out
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
              |sh AS (
              |  SELECT doc_id, list_distinct(list_transform(range(0, len(tok)-2),
              |    i -> tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3])) AS shingles
              |  FROM toks WHERE len(tok) >= 3),
              |hsz AS (
              |  SELECT doc_id,
              |    list_distinct(list_transform(shingles,
              |      g -> ('0x' || substring(md5(g), 1, 12))::BIGINT % 2147483647)) AS hsd
              |  FROM sh),
              |ex AS (SELECT doc_id, unnest(hsd) AS h FROM hsz),
              |dfs AS (SELECT h, COUNT(*) AS df FROM ex GROUP BY h),
              |rare AS (SELECT h FROM dfs WHERE df BETWEEN 2 AND 8),
              |pband AS (
              |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
              |  FROM ex x JOIN rare r ON x.h = r.h
              |       JOIN ex y ON y.h = r.h AND x.doc_id < y.doc_id),
              |anch AS (
              |  SELECT doc_id AS bb_doc, h FROM (
              |    SELECT e.doc_id, e.h, d.df,
              |      ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.h) AS rn
              |    FROM ex e JOIN dfs d ON e.h = d.h)
              |  WHERE rn = 1 AND df > 8 AND df <= 64),
              |heavy AS (
              |  SELECT LEAST(a.bb_doc, e.doc_id) AS doc_a,
              |         GREATEST(a.bb_doc, e.doc_id) AS doc_b
              |  FROM anch a JOIN ex e ON e.h = a.h AND e.doc_id != a.bb_doc),
              |cand AS (SELECT DISTINCT * FROM (
              |  SELECT * FROM pband UNION ALL SELECT * FROM heavy)),
              |pairs AS (
              |  SELECT doc_a, doc_b,
              |    len(list_intersect(a.hsd, b.hsd)) AS ov,
              |    LEAST(len(a.hsd), len(b.hsd)) AS min_sz,
              |    len(a.hsd) AS sz_a, len(b.hsd) AS sz_b
              |  FROM cand JOIN hsz a ON a.doc_id = doc_a JOIN hsz b ON b.doc_id = doc_b)
              |SELECT doc_a, doc_b,
              |  ROUND(CAST(ov AS DOUBLE) / min_sz, 4) AS containment,
              |  ov * 3 < sz_a + sz_b AS jaccard_missed
              |FROM pairs WHERE ov * 5 >= min_sz * 4
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    "q_dedup_ngram_jaccard" -> QueryDef(
      // Exact n-gram Jaccard near-dup join via PREFIX FILTERING (the
      // PPJoin/AllPairs candidate rule): order each doc's shingle set by
      // global rarity (document frequency, shingle as tiebreak — any total
      // order works) and index only the first |S| - ceil(tau*|S|) + 1
      // shingles. Two docs with J >= tau MUST share a prefix shingle, so the
      // equi-join on prefix shingles has exact recall while indexing ~half
      // the tokens — and rare-first ordering keeps per-key join fan-out
      // (df^2) small. This is the scale path for exact-threshold set-
      // similarity joins, complementing q_dedup_minhash_lsh's probabilistic
      // banding: no all-pairs product, one df pre-pass, one equi-join.
      // tau = 1/2, so prefix length = |S| - ceil(|S|/2) + 1 in exact
      // integer arithmetic ((n+1) div 2 — no float ceil drift between
      // engines).
      // Shingles are hashed to 48-bit longs (md5 prefix, the minhash-query
      // convention) IN BOTH ENGINES before any join/intersect work: the
      // rarity sort, the prefix self-join and the verify intersect all run
      // on fixed-width longs instead of ~50-char strings (measured 3x on
      // the verify stage). A hash collision would merge two shingles — in
      // both engines identically, so oracle parity is exact by
      // construction.
      (s, d) => {
        import s.implicits._
        // sorted once per doc so the verify merge below is a two-pointer
        // scan; repartition first — the compact parquet source would
        // otherwise single-thread the shingle hashing (no-op at real scale
        // where the source is already thousands of splits)
        val sh = documents(s, d)
          .select($"doc_id", $"text")
          .repartition($"doc_id")
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 3)
          .select($"doc_id", array_sort(array_distinct(
            // raw-48-bit fused shingle kernel; its internal string-level
            // dedupe only removes duplicates the array_distinct here would
            graft.functions.Grams3Hash48.grams3Hash48Raw(s, $"tok"))).as("hs"))
          .withColumn("sz", size($"hs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ex = sh.select($"doc_id", explode($"hs").as("h"))
        // document frequency per shingle — the global rarity order. A window
        // count over the shingle partition annotates each exploded row in
        // ONE shuffle of ex; the aggregate-then-rejoin formulation costs
        // three (dfreq groupBy, ex re-shuffle for the join, then the groupBy
        // below).
        val wdf = Window.partitionBy($"h")
        // per-doc shingles sorted rare-first; struct sort is (df, h) lexicographic
        val ordered = ex.withColumn("df", count(lit(1)).over(wdf))
          .groupBy($"doc_id")
          .agg(array_sort(collect_list(struct($"df", $"h"))).as("ord"))
        // prefix tokens carry (position, set size) for the PPJoin pruning
        // bounds below; pos is 0-based within the rare-first order. Tokens
        // with df = 1 exist in exactly one document, so they cannot produce
        // a candidate — a qualifying pair's earliest SHARED token has
        // df >= 2 and survives, so dropping them from the index keeps exact
        // recall while removing the (majority) unique-shingle rows from the
        // self-join.
        val pre = ordered.select($"doc_id", size($"ord").as("sz"),
          posexplode(expr("slice(ord, 1, size(ord) - ((size(ord) + 1) div 2) + 1)")))
          .filter($"col.df" >= 2)
          .select($"doc_id", $"sz", $"pos", $"col.h".as("h"))
        // Length filter: J >= 1/2 forces min(|A|,|B|) >= max(|A|,|B|)/2.
        // Positional filter: for the EARLIEST shared token (pos_a, pos_b),
        // every shared token lives in both suffixes, so
        // overlap <= min(|A|-pos_a, |B|-pos_b); J >= 1/2 needs
        // overlap >= (|A|+|B|)/3. Both bounds are exact-recall (the
        // earliest shared token of a qualifying pair always passes) and cut
        // candidates ~3.3x at sf0.1 (409k -> 125k, measured) before the
        // verify join.
        val cand = pre.as("x").join(pre.as("y"),
            col("x.h") === col("y.h") &&
              col("x.doc_id") < col("y.doc_id") &&
              lit(2) * least(col("x.sz"), col("y.sz")) >=
                greatest(col("x.sz"), col("y.sz")) &&
              lit(3) * least(col("x.sz") - col("x.pos"), col("y.sz") - col("y.pos")) >=
                col("x.sz") + col("y.sz"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(sh.select($"doc_id".as("doc_a"), $"hs".as("h_a"), $"sz".as("sz_a")), Seq("doc_a"))
          .join(sh.select($"doc_id".as("doc_b"), $"hs".as("h_b"), $"sz".as("sz_b")), Seq("doc_b"))
          // codegen'd two-pointer merge over the pre-sorted hash sets —
          // allocation-free, vs array_intersect's per-row hash set +
          // materialized intersection array
          .withColumn("ov", graft.functions.SetOps.sortedIntersectSize(s, $"h_a", $"h_b"))
          // |A ∪ B| = |A| + |B| − |A ∩ B|: one merge, no union allocation
          .withColumn("jaccard", $"ov".cast("double") / ($"sz_a" + $"sz_b" - $"ov"))
          .filter($"jaccard" >= 0.5)
          .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
          .orderBy($"doc_a", $"doc_b")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    list_transform(range(0, len(tok)-2), i -> tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3]),
             |    g -> ('0x' || substring(md5(g), 1, 12))::BIGINT)) AS hs
             |  FROM toks WHERE len(tok) >= 3),
             |shz AS (SELECT doc_id, hs, len(hs) AS sz FROM sh),
             |ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
             |dfreq AS (SELECT h, COUNT(*) AS df FROM ex GROUP BY h),
             |ordered AS (
             |  SELECT e.doc_id, list(e.h ORDER BY d.df, e.h) AS ogs
             |  FROM ex e JOIN dfreq d USING (h) GROUP BY e.doc_id),
             |pre AS (
             |  SELECT doc_id, unnest(ogs[1 : len(ogs) - ((len(ogs) + 1) // 2) + 1]) AS h
             |  FROM ordered),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             |  FROM pre x JOIN pre y ON x.h = y.h AND x.doc_id < y.doc_id),
             |pairs AS (
             |  SELECT doc_a, doc_b,
             |    CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
             |      / (a.sz + b.sz - len(list_intersect(a.hs, b.hs))) AS jac
             |  FROM cand JOIN shz a ON a.doc_id = doc_a JOIN shz b ON b.doc_id = doc_b)
             |SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard
             |FROM pairs WHERE jac >= 0.5 ORDER BY doc_a, doc_b""".stripMargin)
    ),

    "q_dedup_lsh_recall" -> QueryDef(
      // MinHash-banding recall measurement — the gate a production dedup
      // pipeline runs before trusting the probabilistic index (the dedup-side
      // twin of q_similarity_recall's ANN gate). Ground truth is the
      // library's OWN exact-recall algorithm: the PPJoin prefix-filter join
      // (q_dedup_ngram_jaccard's candidate rule) enumerates EVERY pair with
      // shingle-Jaccard >= 0.5 without an all-pairs product, so the truth arm
      // scales the same way the index does — no sampling compromise needed.
      // The measured arm is q_dedup_minhash_lsh's 16-hash / 4-band / 4-row
      // banding. Both arms share ONE shingle-hash domain (3-token shingles,
      // md5 48-bit → mod 2^31-1, the minhash convention) and one persisted
      // shingle pass. Output: per integer Jaccard decile (band = ⌊10·J⌋
      // via integer cross-multiplication, J=1.0 clamped into decile 9),
      // true-pair count and how many of those the banding recalled — the
      // measured S-curve of the scheme. Integers only; nothing float decides
      // a row or a group.
      // MEASUREMENT NOTE (the r11 "order-sensitive" item, root-caused in
      // round 12): this query's cost is dominated by the shared shingle /
      // md5 / sorted-set kernels, which need ~10 corpus-scale passes to
      // reach JVM steady state (C2). In-suite, the alphabetically earlier
      // dedup queries provide those passes; isolated-from-cold they don't —
      // measured at sf0.1: 4.63 s alone vs 2.19 s when preceded by
      // q_dedup_{minhash_lsh,ngram_jaccard,containment} (≈1.6× calibrated).
      // The published figure is the in-suite one — the steady state any
      // long-running deployment sits in; an isolated re-measure is expected
      // to read HIGH, never low, so the bench's min(suite, isolated)
      // correction cannot be fooled by it.
      (s, d) => {
        import s.implicits._
        val sh = documents(s, d)
          .select($"doc_id", $"text")
          .repartition($"doc_id")
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 3)
          // fused shingle kernel (gram assembly + md5 + mod in one compiled
          // loop, element-identical to the two-step HOF — Round11OpsSpec)
          .select($"doc_id", graft.functions.Grams3Hash48.grams3Hash48(s, $"tok").as("hs"))
          .withColumn("hsd", array_sort(array_distinct($"hs")))
          .withColumn("sz", size($"hsd"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // ---- truth arm: PPJoin prefix filtering (exact recall at tau=1/2)
        val ex = sh.select($"doc_id", explode($"hsd").as("h"))
        val ordered = ex
          .withColumn("df", count(lit(1)).over(Window.partitionBy($"h")))
          .groupBy($"doc_id")
          .agg(array_sort(collect_list(struct($"df", $"h"))).as("ord"))
        val pre = ordered.select($"doc_id", size($"ord").as("sz"),
            posexplode(expr("slice(ord, 1, size(ord) - ((size(ord) + 1) div 2) + 1)")))
          .filter($"col.df" >= 2)
          .select($"doc_id", $"sz", $"pos", $"col.h".as("h"))
        // Positional-filter soundness is TAU-SPECIFIC (ADVICE r10): the
        // zero-accumulated-overlap PPJoin bound 3·least(sz−pos) ≥ sz_x+sz_y
        // is applied at EVERY prefix match independently, which is lossless
        // only because at tau = 1/2 the GLOBALLY-FIRST common token (in the
        // shared df,h order) provably sits inside both prefixes and passes
        // it: J ≥ 1/2 ⇒ ov ≥ ⌈(sz_x+sz_y)/3⌉, and at the first common
        // token every remaining suffix still holds the whole overlap, so
        // least(sz−pos) ≥ ov there. Changing tau or the prefix length
        // requires RE-DERIVING this — a tighter per-match prune would
        // silently drop true pairs.
        val candTruth = pre.as("x").join(pre.as("y"),
            col("x.h") === col("y.h") &&
              col("x.doc_id") < col("y.doc_id") &&
              lit(2) * least(col("x.sz"), col("y.sz")) >=
                greatest(col("x.sz"), col("y.sz")) &&
              lit(3) * least(col("x.sz") - col("x.pos"), col("y.sz") - col("y.pos")) >=
                col("x.sz") + col("y.sz"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val truth = candTruth
          .join(sh.select($"doc_id".as("doc_a"), $"hsd".as("h_a"), $"sz".as("sz_a")), Seq("doc_a"))
          .join(sh.select($"doc_id".as("doc_b"), $"hsd".as("h_b"), $"sz".as("sz_b")), Seq("doc_b"))
          .withColumn("ov", graft.functions.SetOps.sortedIntersectSize(s, $"h_a", $"h_b").cast("long"))
          .withColumn("uni", $"sz_a".cast("long") + $"sz_b" - $"ov")
          .filter($"ov" * 2 >= $"uni")
          .select($"doc_a", $"doc_b",
            least(expr("(10 * ov) div uni"), lit(9L)).as("band10"))
        // ---- measured arm: minhash banding candidate pairs
        val sig = sh.select($"doc_id",
          graft.functions.LshFunctions.minhashSig(s, $"hsd").as("sig"))
        val bnd = sig.select($"doc_id",
          explode(expr("transform(sequence(0, 3), b -> struct(b AS band, concat_ws('|', slice(sig, b*4+1, 4)) AS bkey))"))
            .as("bb"))
          .select($"doc_id", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
        val candLsh = bnd.as("x")
          .join(bnd.as("y"), Seq("band", "bkey"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
          .withColumn("hit", lit(1))
        val out = truth
          .join(candLsh, Seq("doc_a", "doc_b"), "left_outer")
          .groupBy($"band10")
          .agg(count(lit(1)).as("n_true"), count($"hit").as("n_recalled"))
          .orderBy($"band10")
          // ≤10 decile rows: materialize, then release the shingle cache —
          // a session-lifetime leak otherwise (ADVICE r10)
          .localCheckpoint()
        sh.unpersist(blocking = false)
        out
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
              |shs AS (
              |  SELECT doc_id, list_sort(list_distinct(list_transform(
              |    list_transform(range(0, len(tok)-2), i -> tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3]),
              |    g -> ('0x' || substring(md5(g), 1, 12))::BIGINT % 2147483647))) AS hsd
              |  FROM toks WHERE len(tok) >= 3),
              |hsz AS (SELECT doc_id, hsd, len(hsd) AS sz FROM shs),
              |ex AS (SELECT doc_id, unnest(hsd) AS h FROM shs),
              |dfreq AS (SELECT h, COUNT(*) AS df FROM ex GROUP BY h),
              |ordered AS (
              |  SELECT e.doc_id, list(e.h ORDER BY d.df, e.h) AS ogs
              |  FROM ex e JOIN dfreq d USING (h) GROUP BY e.doc_id),
              |pre AS (
              |  SELECT doc_id, unnest(ogs[1 : len(ogs) - ((len(ogs) + 1) // 2) + 1]) AS h
              |  FROM ordered),
              |candt AS (
              |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
              |  FROM pre x JOIN pre y ON x.h = y.h AND x.doc_id < y.doc_id),
              |truth AS (
              |  SELECT doc_a, doc_b,
              |    LEAST((10 * len(list_intersect(a.hsd, b.hsd)))
              |            // (a.sz + b.sz - len(list_intersect(a.hsd, b.hsd))), 9) AS band10
              |  FROM candt JOIN hsz a ON a.doc_id = doc_a JOIN hsz b ON b.doc_id = doc_b
              |  WHERE 2 * len(list_intersect(a.hsd, b.hsd)) >= a.sz + b.sz - len(list_intersect(a.hsd, b.hsd))),
              |sig AS (
              |  SELECT doc_id, list_transform(range(0, 16),
              |    s -> list_min(list_transform(hsd,
              |      h -> ([${PipelineQueries.lshA.mkString(",")}][s + 1] * h
              |          + [${PipelineQueries.lshB.mkString(",")}][s + 1]) % 2147483647))) AS sig
              |  FROM shs),
              |bands AS (
              |  SELECT doc_id, CAST(c.band AS INTEGER) AS band, c.bkey FROM (
              |    SELECT doc_id, unnest(list_transform(range(0, 4),
              |      b -> {'band': b, 'bkey': array_to_string(sig[b*4+1 : b*4+4], '|')})) AS c
              |    FROM sig)),
              |candl AS (
              |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
              |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
              |SELECT CAST(t.band10 AS BIGINT) AS band10, COUNT(*) AS n_true,
              |  COUNT(c.doc_a) AS n_recalled
              |FROM truth t LEFT JOIN candl c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
              |GROUP BY t.band10 ORDER BY band10""".stripMargin)
    ),

    "q_dedup_simhash" -> QueryDef(
      // 16-bit md5-derived SimHash over unigrams: per-token hash bits vote,
      // sign of the vote forms the fingerprint. Map-only per doc; grouping on
      // the fingerprint finds near-dup buckets. The fingerprint is computed
      // by the fused codegen'd SimHash16 expression — the first HOF
      // formulation (nested aggregate(sequence(0,15), aggregate(tok, ...)))
      // recomputed the md5 once PER BIT per token through interpreted
      // lambdas and was the suite's single most expensive query once the
      // bench forced full rows (4.46 s at sf0.1); the fused kernel hashes
      // each token once and votes all 16 bits in one compiled loop
      // (Round11OpsSpec pins fused-vs-HOF value identity).
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", array_distinct(split($"text", " ")).as("tok"))
          .withColumn("simhash", graft.functions.SimHash16.simhash16(s, $"tok"))
          .select($"doc_id", $"simhash")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok FROM documents),
             |bits AS (
             |  SELECT doc_id, b,
             |    CASE WHEN SUM(CASE WHEN (CAST(('0x' || substring(md5(tk), 1, 8))::VARCHAR AS BIGINT) // (1::BIGINT << b)) % 2 = 1
             |                       THEN 1 ELSE -1 END) > 0
             |         THEN (1::BIGINT << b) ELSE 0 END AS bit
             |  FROM t, unnest(tok) AS u(tk), unnest(range(0, 16)) AS r(b)
             |  GROUP BY doc_id, b)
             |SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS simhash FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // ---------------------------------------------------------- similarity
    "q_similarity_topk" -> QueryDef(
      // Exact brute-force cosine top-5 for 10 query vectors: query side
      // broadcast, dot product via the codegen'd CosineSimilarity expression
      // (sequential double fold — bit-identical to the oracle's list_sum
      // order), ranking on 4-dp-rounded sims with vec_id tiebreak for
      // cross-engine determinism.
      (s, d) => {
        import s.implicits._
        val e = embeddings(s, d).select($"vec_id",
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"v".as("qv"))
        val scored = e.select($"vec_id".as("c_id"), $"v".as("cv"))
          .join(broadcast(q), $"q_id" =!= $"c_id")
          // + 0.0 normalizes the -0.0 a tiny negative cosine rounds to in
          // IEEE engines (DuckDB) but not BigDecimal ones (Spark) — invisible
          // until a sparse bucket's best candidate lands in (-5e-5, 0)
          .withColumn("sim4",
            round(graft.functions.CosineSimilarity.cosineSim(s, $"qv", $"cv"), 4) + lit(0.0))
        val w = Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")
        scored.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 5)
          .select($"q_id", $"rnk", $"c_id", $"sim4")
          .orderBy($"q_id", $"rnk")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |n AS (
             |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
             |s AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 AS sim4
             |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
             |SELECT q_id, rnk, c_id, sim4 FROM (
             |  SELECT q_id, c_id, sim4,
             |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
             |  FROM s) t
             |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_ann_lsh" -> QueryDef(
      // The 100 TB similarity path: 16 random-hyperplane sign bits (planes
      // are deterministic integer lattices so both engines build identical
      // buckets) → equi-join on bucket id → exact cosine rerank of
      // candidates only, top-3. Candidates per query ≈ N/2^16·skew instead
      // of N: the all-pairs product never materializes.
      (s, d) => {
        import s.implicits._
        val e = embeddings(s, d)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .withColumn("bucket", graft.functions.LshFunctions.hyperplaneSig(s, $"v") % 256)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"v".as("qv"), $"bucket")
        val scored = e.select($"vec_id".as("c_id"), $"v".as("cv"), $"bucket")
          .join(broadcast(q), Seq("bucket"))
          .filter($"q_id" =!= $"c_id")
          // + 0.0 normalizes the -0.0 a tiny negative cosine rounds to in
          // IEEE engines (DuckDB) but not BigDecimal ones (Spark) — invisible
          // until a sparse bucket's best candidate lands in (-5e-5, 0)
          .withColumn("sim4",
            round(graft.functions.CosineSimilarity.cosineSim(s, $"qv", $"cv"), 4) + lit(0.0))
        val w = Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")
        scored.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"q_id", $"rnk", $"c_id", $"sim4")
          .orderBy($"q_id", $"rnk")
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |b AS (
              |  SELECT vec_id, v,
              |    CAST(list_sum(list_transform(range(0, 8), p ->
              |      CASE WHEN list_sum(list_transform(range(0, 64),
              |          i -> v[i + 1] * CAST((([${PipelineQueries.lshA.mkString(",")}]::BIGINT[])[p + 1] * (i + 1)
              |                              + ([${PipelineQueries.lshB.mkString(",")}]::BIGINT[])[p + 1]) % 1009 - 504 AS DOUBLE))) > 0
              |           THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS bucket
              |  FROM e),
              |n AS (SELECT vec_id, v, bucket, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM b),
              |s AS (
              |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 AS sim4
              |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
              |SELECT q_id, rnk, c_id, sim4 FROM (
              |  SELECT q_id, c_id, sim4,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |  FROM s) t
              |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_quantized" -> QueryDef(
      // int8 CANDIDATE RANKING inside the ANN index (round 14) — the
      // memory-bandwidth tier every 100 TB vector store runs: vectors are
      // scalar-quantized once with a SYMMETRIC global scale
      // (q = round(127·x/max|x|), so the code dot is proportional to the
      // true dot — quantizedLshBase documents why the per-dim affine
      // STORAGE codes are wrong for ranking, with the measured collapse),
      // the LSH bucket equi-join provides candidates (never all-pairs),
      // the shortlist is ordered by the norm-corrected QUANTIZED COSINE
      // (exact integer dot and norms, one deterministic IEEE divide; 4×
      // less memory traffic than float — at scale the ranking scan reads
      // only the int8 codes), and only the adaptive shortlist
      // (max(15, ⌈candidates/8⌉) — the IVF policy's measured eighth) pays
      // the full-precision cosine rescore for the final top-3. The
      // shortlist decision is hash-exact across engines; the rescore
      // reuses the family's round-4 cosine. Quantization loss is MEASURED
      // by q_similarity_quantized_recall at every forced scale (no
      // approximate tier ships unmeasured).
      (s, d) => {
        import s.implicits._
        val eq = quantizedLshBase(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // materialize the 30-row result, then release the corpus cache
        // (the cache-hygiene contract; the gate inspects the
        // unmaterialized quantizedTop3 plan instead)
        val out = quantizedTop3(s, eq).localCheckpoint()
        eq.unpersist(blocking = false)
        out
      },
      Some(s"""WITH $quantizedLshCtes,
              |sc AS (
              |  SELECT s.q_id, s.c_id, s.iq,
              |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 AS sim4
              |  FROM short s JOIN n q ON q.vec_id = s.q_id JOIN n c ON c.vec_id = s.c_id)
              |SELECT q_id, rnk, c_id, iq, sim4 FROM (
              |  SELECT q_id, c_id, iq, sim4,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |  FROM sc) t
              |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_quantized_recall" -> QueryDef(
      // Measured quantization loss (the q_similarity_recall discipline,
      // isolated to the NEW approximation): both arms see the IDENTICAL
      // LSH bucket candidates, the float arm ranks them all at full
      // precision, the quantized arm ranks by int8 codes and rescores only
      // its adaptive shortlist — so any top-3 disagreement is attributable
      // to the int8 ranking alone, not to bucketing. Integer counters
      // only. Measured where the shortlist actually truncates (occupancy
      // 78–1250 at sf1–sf16, BENCH_SCALING round 14) — the sf0.01 point is
      // non-truncating by design and the spec pins it to exact equality.
      (s, d) => {
        import s.implicits._
        val eq = quantizedLshBase(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val q = eq.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"v".as("qvf"), $"bucket")
        val cand = eq.select($"vec_id".as("c_id"), $"v".as("cv"), $"bucket")
          .join(broadcast(q), Seq("bucket"))
          .filter($"q_id" =!= $"c_id")
        def top3(df: DataFrame): DataFrame =
          df.withColumn("rnk", row_number().over(
              Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")))
            .filter($"rnk" <= 3)
            .select($"q_id", $"c_id")
        val sim = round(graft.functions.CosineSimilarity.cosineSim(s, $"qvf", $"cv"), 4) + lit(0.0)
        val floatArm = top3(cand.withColumn("sim4", sim))
        val quantArm = top3(quantizedShortlist(s, eq).withColumn("sim4", sim))
        val nF = floatArm.groupBy($"q_id").agg(count(lit(1)).as("n_float"))
        val nQ = quantArm.groupBy($"q_id").agg(count(lit(1)).as("n_quant"))
        val nH = floatArm.join(quantArm, Seq("q_id", "c_id"))
          .groupBy($"q_id").agg(count(lit(1)).as("n_hit"))
        val out = nF
          .join(nQ, Seq("q_id"), "left_outer")
          .join(nH, Seq("q_id"), "left_outer")
          .select($"q_id", $"n_float",
            coalesce($"n_quant", lit(0L)).as("n_quant"),
            coalesce($"n_hit", lit(0L)).as("n_hit"))
          .orderBy($"q_id")
          .localCheckpoint()
        eq.unpersist(blocking = false)
        out
      },
      Some(s"""WITH $quantizedLshCtes,
              |fa AS (
              |  SELECT q_id, c_id FROM (
              |    SELECT s.q_id, s.c_id, ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY
              |      ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 DESC,
              |      s.c_id) AS rnk
              |    FROM cp s JOIN n q ON q.vec_id = s.q_id JOIN n c ON c.vec_id = s.c_id) t
              |  WHERE rnk <= 3),
              |qa AS (
              |  SELECT q_id, c_id FROM (
              |    SELECT s.q_id, s.c_id, ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY
              |      ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 DESC,
              |      s.c_id) AS rnk
              |    FROM short s JOIN n q ON q.vec_id = s.q_id JOIN n c ON c.vec_id = s.c_id) t
              |  WHERE rnk <= 3)
              |SELECT fa.q_id,
              |  CAST(COUNT(*) AS BIGINT) AS n_float,
              |  CAST(MAX(nq.n_quant) AS BIGINT) AS n_quant,
              |  CAST(SUM(CASE WHEN qa.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
              |FROM fa
              |LEFT JOIN qa ON fa.q_id = qa.q_id AND fa.c_id = qa.c_id
              |JOIN (SELECT q_id, COUNT(*) AS n_quant FROM qa GROUP BY q_id) nq ON nq.q_id = fa.q_id
              |GROUP BY fa.q_id ORDER BY fa.q_id""".stripMargin)
    ),

    "q_similarity_ivf_quantized" -> QueryDef(
      // IVF × int8 COMPOSED ANN (round 16) — the architecture a 100 TB
      // vector store actually deploys (the FAISS IVFx,SQ8 shape): the
      // coarse quantizer ROUTES (each query probes its nprobe nearest
      // cells, so the index touches ~nprobe·N/K candidates, never N), the
      // int8 code dot RANKS the probed candidates (exact integer
      // arithmetic, 4× less memory traffic than float), and only the
      // adaptive shortlist (max(15, ⌈candidates/8⌉)) pays the
      // full-precision rescore for the final top-3. Every stage is an
      // existing oracle-gated mechanism composed unchanged: the ann_ivf
      // trainer (pinned Lloyd, plan-literal centroid assignment —
      // zero-shuffle cell routing), the quantized tier's symmetric
      // global-scale codes and norm-corrected shortlist
      // (quantizedShortlistFrom — the query side here carries one row per
      // PROBED CELL), the family's round-4 rescore. nprobe=8 is a
      // MEASURED knee, not a guess (tools/IvfQuantizedCurve, BENCH_SCALING
      // round 16): this corpus's near-uniform synthetic vectors spread
      // true neighbors across the K≤16 coarse cells, so nprobe=2 recalls
      // only 0.47–0.53@3 while 8 reaches 0.87–0.97 at flat wall-clock (a
      // real embedding corpus is clustered and sits left of this knee).
      // The DuckDB oracle replays the whole composition: both Lloyd
      // iterations, cell assignment, the probe list, the global max|x|
      // scale, integer code dots, the adaptive width over the per-query
      // candidate pool, and the rescored top-3 — a drift anywhere breaks
      // the hash. Loss measured by q_similarity_ivf_quantized_recall.
      (s, d) => ivfQuantizedTop3(s, d),
      Some(s"""WITH $ivfQuantizedCtes
              |SELECT q_id, rnk, c_id, iq, sim4 FROM (
              |  SELECT q_id, c_id, iq, sim4,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |  FROM sc) t
              |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_ivf_quantized_recall" -> QueryDef(
      // Measured loss of the COMPOSED index (the family rule): recall@3 of
      // IVF-routing × int8-shortlist × rescore against exact brute force,
      // per query — the composition stacks two approximations (an exact
      // neighbor can hide in an unprobed cell OR fall off the int8
      // shortlist), so neither constituent's measured recall covers it.
      // Integer counters only; the exact arm is the allowlisted
      // brute-force baseline (q_similarity_topk's non-equi broadcast join
      // IS that operator), re-run here exactly as q_similarity_recall
      // re-runs it for the LSH arm.
      (s, d) => {
        import s.implicits._
        val e = embeddings(s, d)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"v".as("qv"))
        val exact = e.select($"vec_id".as("c_id"), $"v".as("cv"))
          .join(broadcast(q), $"q_id" =!= $"c_id")
          .withColumn("sim4",
            round(graft.functions.CosineSimilarity.cosineSim(s, $"qv", $"cv"), 4))
          .withColumn("rnk", row_number().over(
            Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")))
          .filter($"rnk" <= 3)
          .select($"q_id", $"c_id")
        val ann = ivfQuantizedTop3(s, d).select($"q_id", $"c_id")
        val nHit = exact.join(ann, Seq("q_id", "c_id"))
          .groupBy($"q_id").agg(count(lit(1)).as("n_hit"))
        val out = exact.groupBy($"q_id").agg(count(lit(1)).as("n_exact"))
          .join(ann.groupBy($"q_id").agg(count(lit(1)).as("n_ann")),
            Seq("q_id"), "left_outer")
          .join(nHit, Seq("q_id"), "left_outer")
          .select($"q_id", $"n_exact",
            coalesce($"n_ann", lit(0L)).as("n_ann"),
            coalesce($"n_hit", lit(0L)).as("n_hit"))
          .orderBy($"q_id")
          .localCheckpoint() // 10 counter rows; then release the corpus cache
        e.unpersist(blocking = false)
        out
      },
      Some(s"""WITH $ivfQuantizedCtes,
              |ann AS (
              |  SELECT q_id, c_id FROM (
              |    SELECT q_id, c_id,
              |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |    FROM sc) t WHERE rnk <= 3),
              |ex AS (
              |  SELECT q_id, c_id FROM (
              |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              |        ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) DESC,
              |        c.vec_id) AS rnk
              |    FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id) t
              |  WHERE rnk <= 3)
              |SELECT ex.q_id, COUNT(*) AS n_exact,
              |  (SELECT COUNT(*) FROM ann a WHERE a.q_id = ex.q_id) AS n_ann,
              |  CAST(SUM(CASE WHEN ann.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
              |FROM ex LEFT JOIN ann ON ann.q_id = ex.q_id AND ann.c_id = ex.c_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)
    ),

    "q_similarity_index_health" -> QueryDef(
      // INDEX MAINTENANCE AUDIT (round 16) — the signal that tells a
      // production store WHEN the incrementally-appended index needs a
      // retrain: appended shards are assigned to centroids trained on
      // yesterday's data, so distribution drift shows up as per-cell
      // occupancy skew. Per cell: indexed count (the build half), appended
      // count (today's shard), and a GROWING flag — the cell's appended
      // share exceeds 1.5× its indexed share, by exact integer
      // cross-multiplication (2·n_app·Σidx > 3·n_idx·Σapp; no float
      // decides a row). Round 18 folds DELETION into the audit: indexed/
      // appended counts become LIVE counts (tombstoned members excluded —
      // the q_similarity_index_delete takedown rule, vec_id ≡ 3 mod 10),
      // a per-cell n_tombstoned column lands beside them, and a WASTED
      // flag fires when tombstones exceed 20% of the cell's rows
      // (5·n_tomb > n_idx+n_app+n_tomb, exact integers) — such a cell
      // pays >20% of its serve reads for rows the anti-join discards,
      // so it is compaction's (physical-drop) first target. One
      // bounded-key aggregate over the same map-side cell assignment the
      // serve lifecycle uses — the audit costs one corpus pass, the
      // retrain/compact decision reads K rows. The store-backed twin
      // [[ivfIndexHealthOf]] computes the same row from a REAL store's
      // live generation + tombstone set (spec-tied to this key).
      (s, d) => {
        import s.implicits._
        import graft.operators.IvfKMeans
        val e = embeddings(s, d)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val build = e.filter($"vec_id" % 2 === 0)
        val seeds: Seq[(Long, Seq[Double])] =
          build.filter($"vec_id" % 97 === 0 && $"vec_id" < 1552).orderBy($"vec_id")
            .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
        val cents = IvfKMeans.train(s, build, seeds, iters = 2)
        val counts = e
          .withColumn("cell", IvfKMeans.assignCell(s, cents, $"v"))
          .withColumn("tomb", $"vec_id" % 10 === 3)
          .groupBy($"cell")
          .agg(
            sum(when($"vec_id" % 2 === 0 && !$"tomb", 1L).otherwise(0L)).as("n_indexed"),
            sum(when($"vec_id" % 2 =!= 0 && !$"tomb", 1L).otherwise(0L)).as("n_appended"),
            sum(when($"tomb", 1L).otherwise(0L)).as("n_tombstoned"))
        val out = counts
          .withColumn("tot_idx", sum($"n_indexed").over(Window.partitionBy()))
          .withColumn("tot_app", sum($"n_appended").over(Window.partitionBy()))
          .select($"cell", $"n_indexed", $"n_appended", $"n_tombstoned",
            (lit(2L) * $"n_appended" * $"tot_idx" >
              lit(3L) * $"n_indexed" * $"tot_app").as("growing"),
            (lit(5L) * $"n_tombstoned" >
              $"n_indexed" + $"n_appended" + $"n_tombstoned").as("wasted"))
          .orderBy($"cell")
          .localCheckpoint() // K rows; then release the corpus cache
        e.unpersist(blocking = false)
        out
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |en AS (
              |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
              |n AS (SELECT * FROM en WHERE vec_id % 2 = 0),
              |c0 AS (
              |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
              |  WHERE vec_id % 97 = 0 AND vec_id < 1552),
              |${lloydIterSql(0)},
              |${lloydIterSql(1)},
              |cells AS (
              |  SELECT vec_id, cid AS cell FROM (
              |    SELECT en.vec_id, c.cid,
              |      ROW_NUMBER() OVER (PARTITION BY en.vec_id ORDER BY
              |        ROUND(list_sum(list_transform(range(1, 65), i -> en.v[i] * c.cv[i])) / (en.nrm * c.cnrm), 6) DESC,
              |        c.cid) AS rk
              |    FROM en, c2 c) WHERE rk = 1),
              |cnt AS (
              |  SELECT cell,
              |    CAST(SUM(CASE WHEN vec_id % 2 = 0 AND vec_id % 10 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_indexed,
              |    CAST(SUM(CASE WHEN vec_id % 2 <> 0 AND vec_id % 10 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_appended,
              |    CAST(SUM(CASE WHEN vec_id % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstoned
              |  FROM cells GROUP BY cell),
              |tot AS (SELECT SUM(n_indexed) AS ti, SUM(n_appended) AS ta FROM cnt)
              |SELECT cell, n_indexed, n_appended, n_tombstoned,
              |  2 * n_appended * ti > 3 * n_indexed * ta AS growing,
              |  5 * n_tombstoned > n_indexed + n_appended + n_tombstoned AS wasted
              |FROM cnt, tot ORDER BY cell""".stripMargin)
    ),

    "q_similarity_index_serve" -> QueryDef(
      // BUILD / INCREMENTAL-APPEND / SERVE lifecycle of the persisted
      // IVF × int8 index — contract and 100 TB story at [[ivfIndexServe]]:
      // quantizer + scale trained on the indexed half only, index written
      // partitioned by cell, today's shard appended against the STORED
      // artifacts (no retrain), queries served off the store through a
      // static probed-cell partition filter (scan reads only probed cells
      // — plan-gated) with the composed int8-shortlist + rescore ranking.
      (s, d) => ivfIndexServe(s, d),
      Some(s"""WITH $ivfIndexServeCtes
              |SELECT q_id, rnk, c_id, iq, sim4 FROM (
              |  SELECT q_id, c_id, iq, sim4,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |  FROM sc) t
              |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_index_delete" -> QueryDef(
      // INDEX DELETION (round 18) — the lifecycle verb a training-data
      // vector store cannot ship without (takedowns, opt-outs,
      // dedup-driven retractions; the reference's O6 DELETE semantics
      // applied to the index artifact). The key runs the FULL delete
      // lifecycle against an ephemeral store: build → append → DELETE a
      // takedown batch (every vec_id ≡ 3 mod 10 — ~10% of the corpus,
      // spanning both the indexed and appended halves) → redeliver the
      // SAME delete batch (at-least-once; dynamic partition overwrite
      // makes it converge) → COMPACT (tombstoned rows physically leave
      // the merged partition; serve must not change) → serve. The DuckDB
      // hash certifies the whole chain: the tombstone mask excludes
      // candidates BEFORE the shortlist cut (so surviving neighbors
      // re-rank exactly as a rebuilt-without-the-deleted index would),
      // the redelivery added nothing, and physical removal lost nothing.
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_ivf_del").toString
        try {
          ivfIndexBuild(s, d, dir)
          ivfIndexAppend(s, d, dir)
          val doomed = embVecs(s, d).filter($"vec_id" % 10 === 3).select($"vec_id")
          ivfIndexDelete(s, dir, delId = 1L, doomed)
          ivfIndexDelete(s, dir, delId = 1L, doomed) // at-least-once redelivery
          ivfIndexCompact(s, dir, upTo = 1L) // physical drop of tombstoned rows
          ivfIndexServeOnly(s, d, dir)
            .localCheckpoint() // 30 rows; then release the store dir
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      Some(s"""WITH ${ivfIndexServeCtesWhere("ce.vec_id % 10 <> 3")}
              |SELECT q_id, rnk, c_id, iq, sim4 FROM (
              |  SELECT q_id, c_id, iq, sim4,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |  FROM sc) t
              |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_index_delete_cell" -> QueryDef(
      // PAST-BROADCAST deletion mask, FORCED (round-19 VERDICT #4 — the
      // r19 scaling arm measured the legacy mask's ceiling: a driver-
      // collected broadcast of the global tombstone set dies near ~10^8
      // ids; that was an operational compact-before rule, not a
      // mechanism). This key runs the CELL-ALIGNED mechanism end-to-end:
      // tombstones partitioned by the store's own cell layout
      // ([[ivfIndexDeleteCellAligned]]), so serve reads only the probed
      // cells' tombstone partitions (+ the out-of-order residual) — the
      // same nprobe/K pruning the index scan pays — and the mask is
      // size-gated on the bytes actually read. The gate is forced PAST
      // broadcast here (cap = 0, the q_bpe_apply_shuffle discipline):
      // the mask runs as a shuffle-HASH anti-join and the DuckDB hash
      // certifies serve identity through the non-broadcast path. The
      // chain also drives the OUT-OF-ORDER lane: the odd half's takedown
      // batch lands BEFORE the append introduces those vectors (filed
      // under the reserved unassigned partition), and a redelivered
      // batch converges via dynamic (cell, del) partition overwrite.
      // Same oracle mask as q_similarity_index_delete: every vec_id ≡ 3
      // (mod 10) is invisible to the shortlist.
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_ivf_delc").toString
        try {
          ivfIndexBuild(s, d, dir)
          // out-of-order: the odd half is not indexed yet — these file
          // under the unassigned residual and must mask the append below
          val early = embVecs(s, d)
            .filter($"vec_id" % 10 === 3 && $"vec_id" % 2 =!= 0).select($"vec_id")
          ivfIndexDeleteCellAligned(s, dir, delId = 1L, early)
          ivfIndexAppend(s, d, dir)
          val doomed = embVecs(s, d).filter($"vec_id" % 10 === 3).select($"vec_id")
          ivfIndexDeleteCellAligned(s, dir, delId = 2L, doomed)
          ivfIndexDeleteCellAligned(s, dir, delId = 2L, doomed) // redelivery
          ivfIndexServeOnly(s, d, dir, tombBroadcastCap = 0L)
            .localCheckpoint() // 30 rows; then release the store dir
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      Some(s"""WITH ${ivfIndexServeCtesWhere("ce.vec_id % 10 <> 3")}
              |SELECT q_id, rnk, c_id, iq, sim4 FROM (
              |  SELECT q_id, c_id, iq, sim4,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |  FROM sc) t
              |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_filtered" -> QueryDef(
      // Pipeline COMPOSITION: the text-quality gate (q_text_quality's
      // predicate) curates the corpus BEFORE the ANN index is built — the
      // semi-join prunes vectors ahead of signature computation, so the
      // bucketing/rerank cost scales with the curated corpus, not the raw
      // one. Same LSH-bucket retrieval as q_similarity_ann_lsh afterwards;
      // queries are drawn from the curated set ("search within the cleaned
      // corpus"). documents.doc_id and embeddings.vec_id share the id space.
      (s, d) => {
        import s.implicits._
        val quality = documents(s, d)
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok").between(10, 2000) &&
            graft.functions.GopherKernels.tokenSetCount(
              s, $"tok", graft.functions.GopherKernels.Stopwords).cast("double")
              / size($"tok") <= 0.5)
          .select($"doc_id".as("vec_id"))
        val e = embeddings(s, d)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .join(quality, Seq("vec_id"), "left_semi")
          .withColumn("bucket", graft.functions.LshFunctions.hyperplaneSig(s, $"v") % 256)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"v".as("qv"), $"bucket")
        val scored = e.select($"vec_id".as("c_id"), $"v".as("cv"), $"bucket")
          .join(broadcast(q), Seq("bucket"))
          .filter($"q_id" =!= $"c_id")
          // + 0.0 normalizes the -0.0 a tiny negative cosine rounds to in
          // IEEE engines (DuckDB) but not BigDecimal ones (Spark) — invisible
          // until a sparse bucket's best candidate lands in (-5e-5, 0)
          .withColumn("sim4",
            round(graft.functions.CosineSimilarity.cosineSim(s, $"qv", $"cv"), 4) + lit(0.0))
        val w = Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")
        scored.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"q_id", $"rnk", $"c_id", $"sim4")
          .orderBy($"q_id", $"rnk")
      },
      Some(s"""WITH qual AS (
              |  SELECT doc_id FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
              |  WHERE len(tok) BETWEEN 10 AND 2000
              |    AND CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / len(tok) <= 0.5),
              |e AS (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
              |  WHERE vec_id IN (SELECT doc_id FROM qual)),
              |b AS (
              |  SELECT vec_id, v,
              |    CAST(list_sum(list_transform(range(0, 8), p ->
              |      CASE WHEN list_sum(list_transform(range(0, 64),
              |          i -> v[i + 1] * CAST((([${PipelineQueries.lshA.mkString(",")}]::BIGINT[])[p + 1] * (i + 1)
              |                              + ([${PipelineQueries.lshB.mkString(",")}]::BIGINT[])[p + 1]) % 1009 - 504 AS DOUBLE))) > 0
              |           THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS bucket
              |  FROM e),
              |n AS (SELECT vec_id, v, bucket, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM b),
              |s AS (
              |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 AS sim4
              |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
              |SELECT q_id, rnk, c_id, sim4 FROM (
              |  SELECT q_id, c_id, sim4,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
              |  FROM s) t
              |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_similarity_ann_ivf" -> QueryDef(
      // IVF coarse quantization — the other 100 TB similarity scale path
      // (inverted-file ANN, complementing the LSH buckets above). Seeds are
      // a tiny deterministic sample (vec_id % 97 == 0 and < 1552: 6 rows at
      // sf0.01, 16 at sf0.1), refined by 2 fixed Lloyd iterations
      // (graft.operators.IvfKMeans: distributed assign + decimal-sum means,
      // rounded so the oracle replays them bit-for-bit). The trained
      // centroids bake into the plan as array literals, so nearest-centroid
      // assignment of the N candidate vectors is pure map-side codegen (K
      // fused cosine loops per row, ZERO shuffle — the property that makes
      // IVF viable at 100 TB). Queries probe their nprobe=2 nearest cells;
      // candidates come from an equi-join on cell id against the broadcast
      // probe list, so ~2N/K vectors are reranked exactly instead of N.
      (s, d) => {
        import s.implicits._
        import graft.operators.IvfKMeans
        // scanned by both Lloyd passes, the final assignment, and the probe
        // side — persist once
        val e = embeddings(s, d)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // K ≤ 16 rows — legitimate driver-side materialization (k-means
        // init + per-iteration mean table); everything row-scale stays
        // distributed.
        val seeds: Seq[(Long, Seq[Double])] =
          e.filter($"vec_id" % 97 === 0 && $"vec_id" < 1552).orderBy($"vec_id")
            .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
        val cents = IvfKMeans.train(s, e, seeds, iters = 2)
        val assigned = e
          .withColumn("cell", IvfKMeans.assignCell(s, cents, $"v"))
          .select($"vec_id".as("c_id"), $"v".as("cv"), $"cell")
        val probes = e.filter($"vec_id" < 10)
          .withColumn("p", explode(slice(array_sort(IvfKMeans.simStructs(s, cents, $"v")), 1, 2)))
          .select($"vec_id".as("q_id"), $"v".as("qv"), $"p.cid".as("cell"))
        val scored = assigned
          .join(broadcast(probes), Seq("cell"))
          .filter($"q_id" =!= $"c_id")
          // + 0.0 normalizes the -0.0 a tiny negative cosine rounds to in
          // IEEE engines (DuckDB) but not BigDecimal ones (Spark) — invisible
          // until a sparse bucket's best candidate lands in (-5e-5, 0)
          .withColumn("sim4",
            round(graft.functions.CosineSimilarity.cosineSim(s, $"qv", $"cv"), 4) + lit(0.0))
        val w = Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")
        val out = scored.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"q_id", $"rnk", $"c_id", $"sim4")
          .orderBy($"q_id", $"rnk")
          // materialize the tiny top-k result, then release the corpus
          // cache (the materialize-then-unpersist session-hygiene pattern)
          .localCheckpoint()
        e.unpersist(blocking = false)
        out
      },
      Some(s"""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |n AS (
             |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
             |c0 AS (
             |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
             |  WHERE vec_id % 97 = 0 AND vec_id < 1552),
             |${lloydIterSql(0)},
             |${lloydIterSql(1)},
             |asg AS (
             |  SELECT vec_id, cid,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos6 DESC, cid) AS rk
             |  FROM (
             |    SELECT n.vec_id, c.cid,
             |      ROUND(list_sum(list_transform(range(1, 65), i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS cos6
             |    FROM n, c2 c)),
             |cells AS (SELECT vec_id, cid AS cell FROM asg WHERE rk = 1),
             |probes AS (SELECT vec_id AS q_id, cid AS cell FROM asg WHERE vec_id < 10 AND rk <= 2),
             |s AS (
             |  SELECT p.q_id, ce.vec_id AS c_id,
             |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * cv.v[i])) / (q.nrm * cv.nrm), 4) + 0.0 AS sim4
             |  FROM probes p
             |  JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.q_id
             |  JOIN n cv ON cv.vec_id = ce.vec_id
             |  JOIN n q ON q.vec_id = p.q_id)
             |SELECT q_id, rnk, c_id, sim4 FROM (
             |  SELECT q_id, c_id, sim4,
             |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim4 DESC, c_id) AS rnk
             |  FROM s) t
             |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin)
    ),

    "q_dedup_embedding" -> QueryDef(
      // Embedding-cosine near-dup detection, banded: 16 hyperplane sign bits
      // split into 4 bands × 4 bits — a pair is a candidate if ANY band
      // matches (union-of-bands recall, the MinHash-banding trick applied to
      // sign LSH). Candidates rerank with exact cosine; threshold tuned to
      // this corpus (no planted dups; max pair ≈ 0.51). All-pairs never
      // materializes: the join key is (band, 4-bit key).
      (s, d) => {
        import s.implicits._
        embeddingDupPairs(s, d).orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH $embPairsCtes
              |SELECT id_a, id_b, cos4 FROM scored WHERE cos4 >= 0.45
              |ORDER BY id_a, id_b""".stripMargin)
    ),

    "q_dedup_embedding_w24" -> QueryDef(
      // The MULTI-WORD signature path at a PINNED 24-bit band width
      // (round 19): 2 bands over disjoint 32-plane blocks, each key = 16
      // planes of word 2b + 8 planes of word 2b+1. This is the branch the
      // adaptive policy takes past 2^24 vectors; pinning it here gates the
      // multi-word engine path through DuckDB at EVERY sf instead of only
      // at the (untestable) corpus size that triggers it. Candidates
      // shrink to near-identical-signature pairs by design — the wide-band
      // recall trade the scaladoc on embeddingDupPairs documents; the
      // planted-pair recall floor lives in Round19OpsSpec.
      (s, d) => {
        import s.implicits._
        embeddingDupPairs(s, d, bandBits = Some(24)).orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH ${embPairsCtesWith("SELECT 24 AS bits")}
              |SELECT id_a, id_b, cos4 FROM scored WHERE cos4 >= 0.45
              |ORDER BY id_a, id_b""".stripMargin)
    ),

    "q_dedup_embedding_w32" -> QueryDef(
      // The widest multi-word branch (>2^28 vectors): 2 bands of 32 bits,
      // band b = words (2b, 2b+1) packed whole. See q_dedup_embedding_w24.
      (s, d) => {
        import s.implicits._
        embeddingDupPairs(s, d, bandBits = Some(32)).orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH ${embPairsCtesWith("SELECT 32 AS bits")}
              |SELECT id_a, id_b, cos4 FROM scored WHERE cos4 >= 0.45
              |ORDER BY id_a, id_b""".stripMargin)
    ),

    "q_dedup_clusters_w32" -> QueryDef(
      // Connected components over the 32-bit-banded near-dup pairs — the
      // full dedup chain (signature → bands → verify → cluster) under the
      // multi-word path, oracle-gated by the same recursive closure as
      // q_dedup_clusters. At 100 TB this IS the chain that runs (the
      // adaptive policy selects 32-bit bands there); the small-sf gate
      // proves chain correctness, the adaptive key proves policy parity.
      (s, d) => {
        import s.implicits._
        val pairs = embeddingDupPairs(s, d, bandBits = Some(32))
          .select($"id_a", $"id_b")
        val nPairs = pairs.count()
        val result = graft.operators.ConnectedComponents.labels(
          s, pairs, knownEdgeCount = Some(nPairs))
        val labelSide =
          if (nPairs < 1000000L) broadcast(result) else result
        embeddings(s, d).select($"vec_id".as("id"))
          .join(labelSide, Seq("id"), "left_outer")
          .select($"id".as("doc_id"), coalesce($"lbl", $"id").as("cluster_id"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE ${embPairsCtesWith("SELECT 32 AS bits")},
              |pairs AS (SELECT id_a, id_b FROM scored WHERE cos4 >= 0.45),
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs),
              |reach(a, rb) AS (
              |  SELECT vec_id, vec_id FROM e
              |  UNION
              |  SELECT r.a, ed.dst FROM reach r JOIN edges ed ON r.rb = ed.src)
              |SELECT a AS doc_id, MIN(rb) AS cluster_id
              |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin)
    ),

    "q_dedup_clusters" -> QueryDef(
      // Connected components over the near-dup pair graph, so every document
      // gets a canonical cluster_id = min reachable doc id and "keep one per
      // cluster" becomes a groupBy. Execution is ADAPTIVE
      // (graft.operators.ConnectedComponents): a subcritical edge list —
      // the near-dup common case, dup pairs are a tiny fraction of a healthy
      // corpus — collapses to driver union-find (microseconds vs one Spark
      // job PER ROUND), while larger graphs run the Pregel-style iterative
      // min-label propagation with O(1)-in-rounds executor storage. The
      // oracle's recursive closure certifies the fixpoint either way.
      (s, d) => {
        import s.implicits._
        // embeddingDupPairs returns an already-materialized (checkpointed)
        // pair list, so the forward + reversed edge reads below never
        // re-run the LSH+verify pipeline.
        val pairs = embeddingDupPairs(s, d).select($"id_a", $"id_b")
        val nPairs = pairs.count()
        val result = graft.operators.ConnectedComponents.labels(
          s, pairs, knownEdgeCount = Some(nPairs))
        // re-attach the isolated nodes (own id = own cluster); the label
        // table is bounded by the connected subgraph — broadcast it while it
        // fits so the full corpus never shuffles
        val labelSide =
          if (nPairs < 1000000L) broadcast(result) else result
        embeddings(s, d).select($"vec_id".as("id"))
          .join(labelSide, Seq("id"), "left_outer")
          .select($"id".as("doc_id"), coalesce($"lbl", $"id").as("cluster_id"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $embPairsCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE cos4 >= 0.45),
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs),
              |reach(a, rb) AS (
              |  SELECT vec_id, vec_id FROM e
              |  UNION
              |  SELECT r.a, ed.dst FROM reach r JOIN edges ed ON r.rb = ed.src)
              |SELECT a AS doc_id, MIN(rb) AS cluster_id
              |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin)
    ),

    "q_multimodal_pipeline" -> QueryDef(
      // The multimodal plumbing as a verifiable query, over REAL container
      // bytes (round 14 — retires the DecodeStub): every document is a
      // genuine ISO-BMFF/MP4 file, `decodeToFrames` runs the real box walk
      // + sample-table reads and yields one frame per container-extracted
      // SAMPLE (mean_intensity = mean payload byte — the statistic a
      // frame-sampling pipeline gates on), and the histogram bins count
      // the extracted payload bytes. The payload generator is modular
      // arithmetic on doc_id, so the oracle replays frame counts,
      // frame-0 mean and every bin without touching the engine path.
      // Every 89th document is truncated before moov → the -1 row.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal.assetsFromDocumentsMp4(s, documents(s, d))
        val frames = graft.multimodal.Multimodal.decodeToFrames(assets)
        val frameAgg = frames.groupBy($"asset_id".as("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
            round(max(when($"frame_idx" === 0, $"mean_intensity")), 4).as("frame0_mean"))
        val hists = assets.map { a =>
          graft.multimodal.Multimodal.unitHistogram(a) match {
            case Some(h) => (a.asset_id, false, h(0), h(1), h(2), h(3))
            case None => (a.asset_id, true, -1L, -1L, -1L, -1L)
          }
        }.toDF("doc_id", "failed", "h0", "h1", "h2", "h3")
        // Drive from `hists` (one row per asset, unconditionally): a failed
        // container decode yields zero frames, so an inner join on frameAgg
        // would silently drop it instead of surfacing the -1 row.
        hists.join(frameAgg, Seq("doc_id"), "left_outer")
          .select($"doc_id",
            when($"failed", lit(-1L)).otherwise(coalesce($"n_frames", lit(0L))).as("n_frames"),
            when($"failed", lit(-1.0d)).otherwise($"frame0_mean").as("frame0_mean"),
            $"h0", $"h1", $"h2", $"h3")
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS ns FROM documents),
             |s AS (SELECT doc_id, ns, unnest(range(ns)) AS k FROM d),
             |sz AS (SELECT doc_id, ns, k, 8 + (doc_id + k) % 9 AS sk FROM s),
             |bj AS (SELECT doc_id, ns, k, unnest(range(sk)) AS j FROM sz),
             |v AS (SELECT doc_id, ns, k, (doc_id * 31 + k * 17 + j * 7) % 256 AS b FROM bj),
             |agg AS (
             |  SELECT doc_id, MAX(ns) AS ns,
             |    ROUND(CAST(SUM(CASE WHEN k = 0 THEN b END) AS DOUBLE)
             |      / COUNT(CASE WHEN k = 0 THEN 1 END), 4) AS frame0_mean,
             |    CAST(COUNT(*) FILTER (b % 64 = 0) AS BIGINT) AS h0,
             |    CAST(COUNT(*) FILTER (b % 64 = 1) AS BIGINT) AS h1,
             |    CAST(COUNT(*) FILTER (b % 64 = 2) AS BIGINT) AS h2,
             |    CAST(COUNT(*) FILTER (b % 64 = 3) AS BIGINT) AS h3
             |  FROM v GROUP BY doc_id)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE ns END AS BIGINT) AS n_frames,
             |  CASE WHEN doc_id % 89 = 0 THEN -1.0 ELSE frame0_mean END AS frame0_mean,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE h0 END AS BIGINT) AS h0,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE h1 END AS BIGINT) AS h1,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE h2 END AS BIGINT) AS h2,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE h3 END AS BIGINT) AS h3
             |FROM agg ORDER BY doc_id""".stripMargin)
    ),

    "q_multimodal_features" -> QueryDef(
      // The other half of the multimodal surface, over REAL container
      // bytes (round 14 — retires the DecodeStub): frame SAMPLING (every
      // 2nd container-extracted sample — the video-stride shape through
      // the real frameSample path) and the folded-histogram FEATURE vector
      // over the extracted payload bytes. Normalized dims are computed in
      // double math from the exact long histogram counts, so both engines
      // perform the identical IEEE sqrt+divide (the float-accumulating
      // extractFeatures path stays spec-tested; compared values must not
      // ride float rounding). Every 89th document is truncated → -1 row.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal.assetsFromDocumentsMp4(s, documents(s, d))
        val sampled = graft.multimodal.Multimodal
          .frameSample(graft.multimodal.Multimodal.decodeToFrames(assets), 2)
          .groupBy($"asset_id".as("doc_id"))
          .agg(count(lit(1)).as("n_sampled"))
        val hists = assets.map { a =>
          graft.multimodal.Multimodal.unitHistogram(a) match {
            case Some(h) =>
              (a.asset_id, false, h(0), h(1), h(2), h(3),
                math.sqrt(h.map(x => x.toDouble * x).sum))
            case None => (a.asset_id, true, -1L, -1L, -1L, -1L, 0.0)
          }
        }.toDF("doc_id", "failed", "h0", "h1", "h2", "h3", "nrm")
        // Drive from `hists` (one row per asset): a failed container
        // decode has no sampled frames — an inner join would silently drop
        // it instead of surfacing the -1 row. The nrm=0 guard pins the
        // empty-histogram case to 0.0 in BOTH engines (Spark 0/0 is NaN,
        // DuckDB division by zero is NULL — neither is comparable).
        val feat = (h: org.apache.spark.sql.Column) =>
          when($"failed", lit(-1.0d))
            .when($"nrm" === 0.0d, lit(0.0d))
            .otherwise(round(h / $"nrm", 4))
        hists.join(sampled, Seq("doc_id"), "left_outer")
          .select($"doc_id",
            when($"failed", lit(-1L)).otherwise(coalesce($"n_sampled", lit(0L))).as("n_sampled"),
            feat($"h0").as("f0"), feat($"h1").as("f1"),
            feat($"h2").as("f2"), feat($"h3").as("f3"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS ns FROM documents),
             |s AS (SELECT doc_id, ns, unnest(range(ns)) AS k FROM d),
             |sz AS (SELECT doc_id, ns, k, 8 + (doc_id + k) % 9 AS sk FROM s),
             |bj AS (SELECT doc_id, ns, k, unnest(range(sk)) AS j FROM sz),
             |v AS (SELECT doc_id, (doc_id * 31 + k * 17 + j * 7) % 256 AS b FROM bj),
             |hist AS (SELECT doc_id, b % 64 AS bin, CAST(COUNT(*) AS DOUBLE) AS c
             |  FROM v GROUP BY doc_id, bin),
             |nrm AS (SELECT doc_id, sqrt(SUM(c * c)) AS nrm FROM hist GROUP BY doc_id),
             |fk AS (
             |  SELECT doc_id,
             |    COALESCE(MAX(CASE WHEN bin = 0 THEN c END), 0) AS c0,
             |    COALESCE(MAX(CASE WHEN bin = 1 THEN c END), 0) AS c1,
             |    COALESCE(MAX(CASE WHEN bin = 2 THEN c END), 0) AS c2,
             |    COALESCE(MAX(CASE WHEN bin = 3 THEN c END), 0) AS c3
             |  FROM hist GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(CASE WHEN d.doc_id % 89 = 0 THEN -1 ELSE (d.ns + 1) // 2 END AS BIGINT) AS n_sampled,
             |  CASE WHEN d.doc_id % 89 = 0 THEN -1.0 ELSE ROUND(c0 / nrm, 4) END AS f0,
             |  CASE WHEN d.doc_id % 89 = 0 THEN -1.0 ELSE ROUND(c1 / nrm, 4) END AS f1,
             |  CASE WHEN d.doc_id % 89 = 0 THEN -1.0 ELSE ROUND(c2 / nrm, 4) END AS f2,
             |  CASE WHEN d.doc_id % 89 = 0 THEN -1.0 ELSE ROUND(c3 / nrm, 4) END AS f3
             |FROM d JOIN fk USING (doc_id) JOIN nrm USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)
    ),

    "q_multimodal_codec" -> QueryDef(
      // REAL media bytes through REAL decoders (the r11 "resolve the stub"
      // item): every document is ENCODED as an actual media file — even
      // doc_ids an 8×8 P6 PPM (pixel payload = text bytes zero-padded to
      // 192), odd doc_ids an 8 kHz mono PCM-16 RIFF/WAVE — and the map-only
      // decode pass parses them back with the pure-JVM codecs (PPM header
      // grammar incl. comments; WAV chunk walk): dim1 comes from the PARSED
      // header (width / sample rate), and the unit stream is the decoded
      // payload (pixels as unsigned bytes; samples mapped back exactly via
      // s/256+128 — the encode multiples make the division lossless). The
      // construction is deterministic, so DuckDB reconstructs every value
      // from `text` (byte == codepoint on this pure-ASCII corpus) — a wrong
      // header parse, off-by-one payload offset, endianness or padding slip
      // breaks the hash. A decode failure surfaces as kind='error' (never
      // silently dropped) and would row-count against the oracle.
      // Scale shape: map-only (mapPartitions batches, the mapInPandas
      // shape); no shuffle but the output sort. JPEG joined the real-codec
      // family in round 13 (q_multimodal_jpeg below); the MP4 CONTAINER
      // parse is real as of round 13 (q_multimodal_mp4) and feeds the
      // frame/feature pipeline since round 14 — only the H.264 codec-
      // PAYLOAD decode (entropy+transform) stays out of scope.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsCodec(s, documents(s, d))
        assets.mapPartitions(_.map { a =>
          if (a.meta.kind == "image") {
            graft.multimodal.PpmCodec.decode(a.content) match {
              case Some(img) =>
                val units = img.pixels.map(_ & 0xff)
                (a.asset_id, "image", img.width.toLong, units.length.toLong,
                  units.foldLeft(0L)(_ + _), units.count(_ >= 96).toLong)
              case None => (a.asset_id, "error", -1L, -1L, -1L, -1L)
            }
          } else {
            graft.multimodal.WavCodec.decode(a.content) match {
              case Some(wav) =>
                val units = wav.samples.map(v => v / 256 + 128)
                (a.asset_id, "audio", wav.sampleRate.toLong, units.length.toLong,
                  units.foldLeft(0L)(_ + _), units.count(_ >= 96).toLong)
              case None => (a.asset_id, "error", -1L, -1L, -1L, -1L)
            }
          }
        }).toDF("doc_id", "kind", "dim1", "n_units", "unit_sum", "n_high")
          .orderBy($"doc_id")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, length(text) AS n,
             |    list_transform(range(1, length(text) + 1), i -> ascii(substring(text, i, 1))) AS bytes
             |  FROM documents),
             |img AS (
             |  SELECT doc_id, 'image' AS kind, 8::BIGINT AS dim1, 192::BIGINT AS n_units,
             |    COALESCE(CAST(list_sum(bytes[1 : LEAST(n, 192)]) AS BIGINT), 0) AS unit_sum,
             |    CAST(len(list_filter(bytes[1 : LEAST(n, 192)], x -> x >= 96)) AS BIGINT) AS n_high
             |  FROM b WHERE doc_id % 2 = 0),
             |aud AS (
             |  SELECT doc_id, 'audio' AS kind, 8000::BIGINT AS dim1, CAST(n AS BIGINT) AS n_units,
             |    COALESCE(CAST(list_sum(bytes) AS BIGINT), 0) AS unit_sum,
             |    CAST(len(list_filter(bytes, x -> x >= 96)) AS BIGINT) AS n_high
             |  FROM b WHERE doc_id % 2 = 1)
             |SELECT * FROM img UNION ALL SELECT * FROM aud ORDER BY doc_id""".stripMargin)
    ),

    "q_multimodal_jpeg" -> QueryDef(
      // The LOSSY real-codec member (round 13 — closes the multimodal
      // family outright): every document becomes a genuine baseline JFIF
      // file (grayscale, Annex-K Huffman tables, dims/content derived from
      // doc_id — see Multimodal.assetsFromDocumentsJpeg), and the map-only
      // decode pass runs the REAL baseline pipeline: marker segment walk,
      // canonical Huffman decode, dequantization, double-precision IDCT,
      // level shift. The DC-only constant-block construction makes the
      // lossy decode EXACT integer arithmetic (JpegCodec scaladoc), so
      // DuckDB reconstructs dims and exact pixel statistics from doc_id —
      // one wrong Huffman bit, zigzag slot, quant multiply or IDCT
      // constant breaks the hash. Every 97th document is truncated
      // mid-header; its decode failure must surface as the -1 row (never
      // silently dropped). The general decoder (AC coefficients, 4:2:0
      // chroma, restart markers) is pinned against the JDK's independent
      // libjpeg-based reader in JpegCodecSpec — both directions.
      // Scale shape: map-only (mapPartitions batches, the mapInPandas
      // shape); no shuffle but the output sort.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsJpeg(s, documents(s, d))
        assets.mapPartitions(_.map { a =>
          graft.multimodal.JpegCodec.decode(a.content) match {
            case Some(img) =>
              val px = img.pixels.map(_ & 0xff)
              (a.asset_id, img.width.toLong, img.height.toLong, px.length.toLong,
                px.foldLeft(0L)(_ + _), px.min.toLong, px.max.toLong)
            case None => (a.asset_id, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }).toDF("doc_id", "width", "height", "px_n", "px_sum", "px_min", "px_max")
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + (doc_id // 3) % 2) AS h
             |  FROM documents),
             |blocks AS (
             |  SELECT doc_id, w, h, unnest(range((w // 8) * (h // 8))) AS b FROM dims),
             |pb AS (
             |  SELECT doc_id, w, h, 2 * ((doc_id * 13 + 29 * b) % 128) AS p FROM blocks),
             |agg AS (
             |  SELECT doc_id, MAX(w) AS w, MAX(h) AS h, 64 * SUM(p) AS px_sum,
             |    MIN(p) AS px_min, MAX(p) AS px_max
             |  FROM pb GROUP BY doc_id)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE w END AS BIGINT) AS width,
             |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE h END AS BIGINT) AS height,
             |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE w * h END AS BIGINT) AS px_n,
             |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE px_sum END AS BIGINT) AS px_sum,
             |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE px_min END AS BIGINT) AS px_min,
             |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE px_max END AS BIGINT) AS px_max
             |FROM agg ORDER BY doc_id""".stripMargin)
    ),

    "q_multimodal_audit" -> QueryDef(
      // MEDIA RELEASE AUDIT (round 16 — wires DecodeResult.Oversized
      // through a query surface): the dataset-card split a 100 TB media
      // curation publishes — per bucket, how many assets DECODED, how many
      // were structurally valid but past the decode allocation envelope
      // (OVERSIZED — the big-asset lane, retried with a bigger budget, NOT
      // discarded), and how many were corrupt (INVALID, the discard lane).
      // Assets come from assetsFromDocumentsJpegAudit, which plants all
      // three outcomes deterministically (id%7==0 truncated; id%7==1 a
      // VALID 80×64 = 5120-plane-int image vs the 4096-int envelope forced
      // here; else the exact-decode small construction), so the oracle
      // certifies the split per bucket — including the decoded-lane pixel
      // checksum (proving oversized assets never leak pixels into the
      // decoded stats) and the total declared plane ints riding the
      // Oversized outcome (what a big-asset lane budgets its retry from).
      // Scale shape: map-only decode, partial-aggregable count/sum per
      // bucket — ONE exchange carrying 4 audit rows.
      (s, d) => {
        import s.implicits._
        import graft.multimodal.JpegCodec
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsJpegAudit(s, documents(s, d))
        assets.mapPartitions(_.map { a =>
          JpegCodec.decodeDetailed(a.content, maxPlaneInts = 4096L) match {
            case JpegCodec.DecodeResult.Decoded(img) =>
              val px = img.pixels.map(_ & 0xff)
              (a.asset_id, "decoded", px.foldLeft(0L)(_ + _), 0L)
            case JpegCodec.DecodeResult.Oversized(declared, _) =>
              (a.asset_id, "oversized", 0L, declared)
            case JpegCodec.DecodeResult.Invalid =>
              (a.asset_id, "invalid", 0L, 0L)
          }
        }).toDF("doc_id", "lane", "px", "declared")
          .groupBy(($"doc_id" % 4).as("bucket"))
          .agg(
            count(lit(1)).as("n_assets"),
            sum(when($"lane" === "decoded", 1L).otherwise(0L)).as("n_decoded"),
            sum(when($"lane" === "oversized", 1L).otherwise(0L)).as("n_oversized"),
            sum(when($"lane" === "invalid", 1L).otherwise(0L)).as("n_invalid"),
            sum($"px").as("px_sum"),
            sum($"declared").as("declared_ints"))
          .orderBy($"bucket")
      },
      Some("""WITH cls AS (
             |  SELECT doc_id, doc_id % 7 AS c,
             |    8 * (1 + doc_id % 3) AS w, 8 * (1 + (doc_id // 3) % 2) AS h
             |  FROM documents),
             |blocks AS (
             |  SELECT doc_id, unnest(range((w // 8) * (h // 8))) AS b
             |  FROM cls WHERE c NOT IN (0, 1)),
             |px AS (
             |  SELECT doc_id, CAST(64 * SUM(2 * ((doc_id * 13 + 29 * b) % 128)) AS BIGINT) AS px_sum
             |  FROM blocks GROUP BY doc_id),
             |au AS (
             |  SELECT cls.doc_id, cls.c, COALESCE(px.px_sum, 0) AS px_sum
             |  FROM cls LEFT JOIN px ON cls.doc_id = px.doc_id)
             |SELECT CAST(doc_id % 4 AS BIGINT) AS bucket,
             |  COUNT(*) AS n_assets,
             |  CAST(SUM(CASE WHEN c NOT IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded,
             |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversized,
             |  CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
             |  CAST(SUM(CASE WHEN c NOT IN (0, 1) THEN px_sum ELSE 0 END) AS BIGINT) AS px_sum,
             |  CAST(SUM(CASE WHEN c = 1 THEN 5120 ELSE 0 END) AS BIGINT) AS declared_ints
             |FROM au GROUP BY 1 ORDER BY bucket""".stripMargin)
    ),

    "q_multimodal_jpeg420" -> QueryDef(
      // The GENERAL-path JPEG arm (round 14 — closes the r13 verdict's
      // oracle-coverage gap): the DC-only gray arm above never drives AC
      // coefficients, 4:2:0 chroma upsampling or YCbCr→RGB through a
      // CORRECTNESS hash (they were pinned only by JpegCodecSpec vs the
      // JDK). Each document is a 32×16 two-MCU COLOR 4:2:0 JPEG with a
      // slot-(4,4) AC coefficient in every component: that basis is ±1/2
      // exactly, so the decode lands on 128 + 2t + 2a·s(x)s(y) per plane
      // (JpegCodec.encodeColor420Ac exactness contract), chroma varies
      // WITHIN each block (a box-upsampling index slip reads a different
      // chroma sample → different RGB → broken hash), and the color
      // convert is mirrored bit-for-bit in SQL as FLOOR(x + 0.5) over the
      // identical IEEE products (Math.round's definition). Every 101st
      // document is truncated mid-header → the -1 row.
      // Scale shape: map-only decode; no shuffle but the output sort.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsJpeg420(s, documents(s, d))
        assets.mapPartitions(_.map { a =>
          graft.multimodal.JpegCodec.decode(a.content) match {
            case Some(img) =>
              val px = img.pixels
              var sr = 0L; var sg = 0L; var sb = 0L; var mr = 0L; var mb = 255L
              var i = 0
              while (i < px.length) {
                val r = px(i) & 0xff; val g = px(i + 1) & 0xff; val b = px(i + 2) & 0xff
                sr += r; sg += g; sb += b
                if (r > mr) mr = r
                if (b < mb) mb = b
                i += 3
              }
              (a.asset_id, img.width.toLong, img.height.toLong, sr, sg, sb, mr, mb)
            case None => (a.asset_id, -1L, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }).toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b", "max_r", "min_b")
          .orderBy($"doc_id")
      },
      Some("""WITH px AS (
             |  SELECT doc_id, unnest(range(512)) AS p FROM documents),
             |c AS (SELECT doc_id, p % 32 AS x, p // 32 AS y FROM px),
             |f AS (
             |  SELECT doc_id, x, y,
             |    (y // 8) * 4 + (x // 8) AS g,
             |    x // 16 AS m,
             |    (CASE WHEN (x % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
             |      * (CASE WHEN (y % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END) AS ss,
             |    (CASE WHEN ((x // 2) % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END)
             |      * (CASE WHEN ((y // 2) % 8) IN (0, 3, 4, 7) THEN 1 ELSE -1 END) AS ssc
             |  FROM c),
             |v AS (
             |  SELECT doc_id,
             |    128 + 2 * ((doc_id * 7 + 11 * g) % 33 - 16)
             |        + 2 * ((doc_id * 5 + 13 * g) % 9 - 4) * ss AS yy,
             |    2 * ((doc_id * 3 + 5 * m) % 21 - 10) + 2 * ((doc_id + m) % 7 - 3) * ssc AS cb,
             |    2 * ((doc_id * 9 + 4 + 3 * m) % 21 - 10) + 2 * ((doc_id * 11 + 2 + m) % 7 - 3) * ssc AS cr
             |  FROM f),
             |rgb AS (
             |  SELECT doc_id,
             |    CAST(FLOOR(yy + 1.402 * cr + 0.5) AS BIGINT) AS r,
             |    CAST(FLOOR(yy - 0.344136 * cb - 0.714136 * cr + 0.5) AS BIGINT) AS gg,
             |    CAST(FLOOR(yy + 1.772 * cb + 0.5) AS BIGINT) AS b
             |  FROM v),
             |agg AS (
             |  SELECT doc_id, SUM(r) AS sum_r, SUM(gg) AS sum_g, SUM(b) AS sum_b,
             |    MAX(r) AS max_r, MIN(b) AS min_b
             |  FROM rgb GROUP BY doc_id)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 101 = 0 THEN -1 ELSE 32 END AS BIGINT) AS width,
             |  CAST(CASE WHEN doc_id % 101 = 0 THEN -1 ELSE 16 END AS BIGINT) AS height,
             |  CAST(CASE WHEN doc_id % 101 = 0 THEN -1 ELSE sum_r END AS BIGINT) AS sum_r,
             |  CAST(CASE WHEN doc_id % 101 = 0 THEN -1 ELSE sum_g END AS BIGINT) AS sum_g,
             |  CAST(CASE WHEN doc_id % 101 = 0 THEN -1 ELSE sum_b END AS BIGINT) AS sum_b,
             |  CAST(CASE WHEN doc_id % 101 = 0 THEN -1 ELSE max_r END AS BIGINT) AS max_r,
             |  CAST(CASE WHEN doc_id % 101 = 0 THEN -1 ELSE min_b END AS BIGINT) AS min_b
             |FROM agg ORDER BY doc_id""".stripMargin)
    ),

    "q_multimodal_resize" -> QueryDef(
      // REAL resize (round 13 — the last named multimodal op to leave the
      // stub: decode ✓ / feature-extract ✓ / frame-sample ✓ / resize was
      // metadata-only). Full media cycle per document: decode the genuine
      // PPM/WAV bytes (assetsFromDocumentsCodec), apply the real transform
      // — area-average 2× image downscale (floor of each 2×2 block, per
      // channel) / 2× audio decimation with pair averaging (rate 8000 →
      // 4000) — re-ENCODE, re-DECODE, and emit stats of the final decode:
      // a slip anywhere in encoder, decoder or kernel (index arithmetic,
      // channel interleave, floor vs round, odd-tail handling) breaks the
      // oracle, which reconstructs every output unit from `text` in pure
      // integer arithmetic (image sums are non-negative so // is
      // truncation-safe; audio pair sums are multiples of 512 so the
      // halving is exact for both signs).
      // Scale shape: map-only; no shuffle but the output sort.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsCodec(s, documents(s, d))
        assets.mapPartitions(_.map { a =>
          if (a.meta.kind == "image") {
            graft.multimodal.PpmCodec.decode(a.content) match {
              case Some(img) =>
                val small = graft.multimodal.PpmCodec.downscale2x(img)
                graft.multimodal.PpmCodec.decode(graft.multimodal.PpmCodec.encode(small)) match {
                  case Some(back) =>
                    val units = back.pixels.map(_ & 0xff)
                    (a.asset_id, "image", back.width.toLong, units.length.toLong,
                      units.foldLeft(0L)(_ + _))
                  case None => (a.asset_id, "error", -1L, -1L, -1L)
                }
              case None => (a.asset_id, "error", -1L, -1L, -1L)
            }
          } else {
            graft.multimodal.WavCodec.decode(a.content) match {
              case Some(wav) =>
                val small = graft.multimodal.WavCodec.downsample2x(wav)
                graft.multimodal.WavCodec.decode(graft.multimodal.WavCodec.encode(small)) match {
                  case Some(back) =>
                    (a.asset_id, "audio", back.sampleRate.toLong,
                      back.samples.length.toLong,
                      back.samples.foldLeft(0L)(_ + _))
                  case None => (a.asset_id, "error", -1L, -1L, -1L)
                }
              case None => (a.asset_id, "error", -1L, -1L, -1L)
            }
          }
        }).toDF("doc_id", "kind", "dim_out", "n_units", "unit_sum")
          .orderBy($"doc_id")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, length(text) AS n,
             |    list_transform(range(0, 192),
             |      i -> CASE WHEN i < length(text) THEN ascii(substring(text, CAST(i + 1 AS INT), 1)) ELSE 0 END) AS pb
             |  FROM documents),
             |iu AS (
             |  SELECT doc_id, unnest(range(0, 48)) AS u, pb FROM b WHERE doc_id % 2 = 0),
             |ipx AS (
             |  SELECT doc_id,
             |    (pb[((u // 12) * 2 * 8 + (u % 12 // 3) * 2) * 3 + (u % 3) + 1]
             |     + pb[((u // 12) * 2 * 8 + (u % 12 // 3) * 2 + 1) * 3 + (u % 3) + 1]
             |     + pb[(((u // 12) * 2 + 1) * 8 + (u % 12 // 3) * 2) * 3 + (u % 3) + 1]
             |     + pb[(((u // 12) * 2 + 1) * 8 + (u % 12 // 3) * 2 + 1) * 3 + (u % 3) + 1]) // 4 AS px
             |  FROM iu),
             |img AS (
             |  SELECT doc_id, 'image' AS kind, 4::BIGINT AS dim_out, 48::BIGINT AS n_units,
             |    CAST(SUM(px) AS BIGINT) AS unit_sum
             |  FROM ipx GROUP BY doc_id),
             |aj AS (
             |  SELECT doc_id, n, unnest(range(0, (n + 1) // 2)) AS j FROM b WHERE doc_id % 2 = 1),
             |ad AS (
             |  SELECT aj.doc_id,
             |    CASE WHEN 2 * j + 1 < aj.n
             |      THEN 128 * (ascii(substring(t.text, CAST(2 * j + 1 AS INT), 1))
             |                + ascii(substring(t.text, CAST(2 * j + 2 AS INT), 1)) - 256)
             |      ELSE 256 * (ascii(substring(t.text, CAST(2 * j + 1 AS INT), 1)) - 128) END AS d
             |  FROM aj JOIN documents t USING (doc_id)),
             |aud AS (
             |  SELECT a.doc_id, 'audio' AS kind, 4000::BIGINT AS dim_out,
             |    CAST((a.n + 1) // 2 AS BIGINT) AS n_units,
             |    COALESCE(CAST(SUM(d.d) AS BIGINT), 0) AS unit_sum
             |  FROM (SELECT doc_id, n FROM b WHERE doc_id % 2 = 1) a
             |  LEFT JOIN ad d USING (doc_id)
             |  GROUP BY a.doc_id, a.n)
             |SELECT * FROM img UNION ALL SELECT * FROM aud ORDER BY doc_id""".stripMargin)
    ),

    "q_multimodal_audio_features" -> QueryDef(
      // Framewise audio analysis over the REAL WAV decode (round 13) —
      // the VAD-style gating a speech-data curation pipeline runs before
      // anything expensive: per 64-sample frame, short-time ENERGY
      // (Σ s², exact int64: |s| ≤ 32640 ⇒ frame energy ≤ 6.9e10) and
      // ZERO-CROSSING count (sign(s_i) ≠ sign(s_{i−1}) within the frame,
      // zero counted non-negative) — both pure integer, no float ever.
      // Only COMPLETE frames count (n // 64 — the streaming-window
      // convention; the tail remainder is next-buffer state). A frame is
      // "active" when energy > 64·1000² (a fixed 1000-amplitude RMS gate,
      // cross-multiplied so no division). The oracle replays sample
      // reconstruction s = (byte − 128)·256 and every frame statistic
      // from `text`.
      // Scale shape: map-only decode + per-doc loop; no shuffle but the
      // output sort.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsCodec(s, documents(s, d).filter($"doc_id" % 2 === 1))
        assets.mapPartitions(_.map { a =>
          val wav = graft.multimodal.WavCodec.decode(a.content)
            .getOrElse(throw new IllegalStateException(s"undecodable fixture ${a.asset_id}"))
          val n = wav.samples.length
          val nFrames = n / 64
          var zcr = 0L; var eSum = 0L; var eMax = 0L; var active = 0L
          var f = 0
          while (f < nFrames) {
            var e = 0L; var z = 0L
            var i = 0
            while (i < 64) {
              val v = wav.samples(f * 64 + i).toLong
              e += v * v
              if (i > 0 && ((v < 0) != (wav.samples(f * 64 + i - 1) < 0))) z += 1
              i += 1
            }
            zcr += z; eSum += e
            if (e > eMax) eMax = e
            if (e > 64L * 1000 * 1000) active += 1
            f += 1
          }
          (a.asset_id, nFrames.toLong, zcr, eSum, eMax, active)
        }).toDF("doc_id", "n_frames", "zcr_total", "energy_sum", "energy_max", "n_active")
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text, length(text) // 64 AS nf FROM documents WHERE doc_id % 2 = 1),
             |fr AS (SELECT doc_id, text, nf, unnest(range(nf)) AS f FROM d),
             |fs AS (
             |  SELECT doc_id, f,
             |    list_transform(range(0, 64),
             |      i -> (ascii(substring(text, CAST(f * 64 + i + 1 AS INT), 1)) - 128) * 256) AS s
             |  FROM fr),
             |fe AS (
             |  SELECT doc_id, f,
             |    CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS e,
             |    CAST(list_sum(list_transform(range(1, 64),
             |      i -> CASE WHEN (s[CAST(i + 1 AS INT)] < 0) <> (s[CAST(i AS INT)] < 0) THEN 1 ELSE 0 END)) AS BIGINT) AS z
             |  FROM fs),
             |agg AS (
             |  SELECT doc_id, COUNT(*) AS nf2, SUM(z) AS zcr, SUM(e) AS es, MAX(e) AS em,
             |    SUM(CASE WHEN e > 64000000 THEN 1 ELSE 0 END) AS act
             |  FROM fe GROUP BY doc_id)
             |SELECT d.doc_id, CAST(d.nf AS BIGINT) AS n_frames,
             |  COALESCE(CAST(zcr AS BIGINT), 0) AS zcr_total,
             |  COALESCE(CAST(es AS BIGINT), 0) AS energy_sum,
             |  COALESCE(CAST(em AS BIGINT), 0) AS energy_max,
             |  COALESCE(CAST(act AS BIGINT), 0) AS n_active
             |FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin)
    ),

    "q_dedup_image_phash_near" -> QueryDef(
      // NEAR-duplicate image dedup (round 14 — the Hamming≤k tier the
      // round-13 verdict asked for): aHash equality only collapses
      // near-exact duplicates; recompressed/slightly-edited images land a
      // few bits away. This key finds every pair of DISTINCT hashes within
      // Hamming distance 3 via a banded multi-index — the MinHash-banding
      // discipline applied to perceptual hashes: the 64-bit hash splits
      // into 4×16-bit bands, and by pigeonhole any pair with ≤3 differing
      // bits agrees exactly on ≥1 band, so an any-band EQUI-join recalls
      // ALL such pairs (recall floor 100% at d≤3 — proven on a planted
      // fixture AND against the brute-force pair set on the real corpus in
      // Round14OpsSpec), then the exact Hamming verify filters candidates.
      // Composition is the scale story: the exact tier (groupBy hash)
      // collapses first, so banding runs over DISTINCT-hash canonical
      // representatives — at sf16 that is 3,435 reps from 400k images, and
      // the band join shuffles 4 rows of 3 longs per rep, never pixels,
      // never the Hamming-0 cluster members (whose all-pairs would be
      // ~46M). d=0 pairs cannot appear by construction (reps have distinct
      // hashes); they are q_dedup_image_ahash's output.
      (s, d) => {
        import s.implicits._
        imagePhashNearPairs(s, d)
          .select($"doc_a", $"doc_b", $"hamming")
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH $imagePhashNearCtes
              |SELECT doc_a, doc_b, hamming FROM np ORDER BY doc_a, doc_b""".stripMargin)
    ),

    "q_dedup_image_phash_near_b8" -> QueryDef(
      // THE PRODUCTION NEAR TIER (round 17 — acting on the round-16
      // recall curve): q_dedup_image_recall measured that the original
      // 4×16 banding is pigeonhole-exact at d≤3 but silently decays to
      // 21.4% recall at d=10 at sf1 — real recompression perturbations
      // land at d=4–10 — while 8×8 banding holds ≥99.9% through the
      // whole range at ~2× candidate volume. This key ships that
      // measurement as behavior: 8 bands of 8 bits, any-band equi-join
      // (pigeonhole: ≤7 flips leave ≥1 band intact → TOTAL recall at
      // d≤7, proven on a planted d=7 Hamming-ball in Round17OpsSpec),
      // exact bit_count verify. Same scale shape as the b=4 tier: the
      // band join shuffles 8 rows of 3 longs per DISTINCT-hash rep
      // (3,435 at sf16), never pixels, never cluster members. The
      // cluster labeling (q_dedup_image_clusters) consumes THIS pair
      // graph now; the d≤3 key remains as the conservative tier.
      (s, d) => {
        import s.implicits._
        imagePhashNearPairs(s, d, nBands = 8, maxDist = 7)
          .select($"doc_a", $"doc_b", $"hamming")
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH $imagePhashNearB8Ctes
              |SELECT doc_a, doc_b, hamming FROM np8 ORDER BY doc_a, doc_b""".stripMargin)
    ),

    "q_dedup_image_recall" -> QueryDef(
      // BANDED-HAMMING RECALL CURVE (round 16 — the r14 verdict's
      // parameterized-band-width item): Hamming≤3 recall is exact by
      // pigeonhole, but real recompression perturbations land at d=4–10,
      // where banding decays SILENTLY. This is q_dedup_lsh_recall's
      // discipline applied to the image index: per Hamming distance
      // d ∈ [1,10], the true-pair count over the distinct-hash reps and
      // how many of those each band width recalls — b bands of 64/b bits
      // for b ∈ {2, 4, 8} (the production index is b=4). Two tricks keep
      // it equi-join only, no NLJ:
      //  - TRUTH arm: 16 bands of 4 bits — pigeonhole guarantees every
      //    pair with d ≤ 15 shares ≥1 band, so a band equi-join + exact
      //    bit_count verify enumerates EXACT truth over the whole d ≤ 10
      //    range being measured.
      //  - MEASURED arms need no join at all: whether a known pair agrees
      //    on ≥1 of b width-(64/b) bands is pure xor-slice arithmetic on
      //    the two hashes already riding the pair (a slice of a^b is zero
      //    iff that band matches) — monotone in b by nesting.
      // Scale story: candidates are quadratic in the 4-bit-band group
      // sizes BY DESIGN — this is the gate a pipeline runs over the
      // distinct-hash reps (3,435 at sf16, never raw images) or a rep
      // SAMPLE before trusting the index, exactly like the brute-force
      // recall baselines. Integers only; nothing float decides a row.
      (s, d) => {
        import s.implicits._
        imageRecallCurveOf(s, imageAhashes(s, d)
          .groupBy($"h_hi", $"h_lo")
          .agg(min($"doc_id").as("doc_id")))
      },
      Some(s"""WITH $imageAhashCtes,
              |hh AS (SELECT h_hi, h_lo, MIN(doc_id) AS doc_id FROM h GROUP BY h_hi, h_lo),
              |pr AS (
              |  SELECT xor(x.h_hi, y.h_hi) AS xhi, xor(x.h_lo, y.h_lo) AS xlo
              |  FROM hh x JOIN hh y ON x.doc_id < y.doc_id),
              |hd AS (
              |  SELECT xhi, xlo, bit_count(xhi) + bit_count(xlo) AS d FROM pr)
              |SELECT CAST(d AS BIGINT) AS hamming, COUNT(*) AS n_true,
              |  CAST(SUM(CASE WHEN xlo = 0 OR xhi = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rec_b2,
              |  CAST(SUM(CASE WHEN xlo % 65536 = 0 OR xlo // 65536 = 0
              |                  OR xhi % 65536 = 0 OR xhi // 65536 = 0
              |           THEN 1 ELSE 0 END) AS BIGINT) AS n_rec_b4,
              |  CAST(SUM(CASE WHEN (xlo // 1) % 256 = 0 OR (xlo // 256) % 256 = 0
              |                  OR (xlo // 65536) % 256 = 0 OR (xlo // 16777216) % 256 = 0
              |                  OR (xhi // 1) % 256 = 0 OR (xhi // 256) % 256 = 0
              |                  OR (xhi // 65536) % 256 = 0 OR (xhi // 16777216) % 256 = 0
              |           THEN 1 ELSE 0 END) AS BIGINT) AS n_rec_b8
              |FROM hd WHERE d BETWEEN 1 AND 10
              |GROUP BY 1 ORDER BY hamming""".stripMargin)
    ),

    "q_dedup_image_recall_sample" -> QueryDef(
      // The recall curve PAST the oracle's reach (round 17 — the r16
      // verdict's item #6): the full-corpus curve's truth arm is
      // quadratic in the rep count, so DuckDB cannot follow past sf1 and
      // the engine-side curve was unclaimed exactly where band-group
      // occupancy grows. This key bounds the curve with an ANCHOR
      // sample: 512 reps in deterministic (md5(doc_id), doc_id) order —
      // the semantic-decontamination needle-cap discipline — measured as
      // ORDERED (anchor, other) pairs against ALL reps. Anchoring, not
      // uniform pair-sampling, is what keeps the statistic alive: the
      // d ≤ 10 stratum is rare among random pairs, so thinning BOTH
      // endpoints by s keeps only s² of it (empty at sf4), while the
      // anchor design keeps each sampled rep's whole true neighborhood —
      // the per-item recall a production gate actually estimates. Cost
      // is linear in the corpus: the truth arm joins 512×16 anchor band
      // rows against the rep band table (equi-join, no NLJ), and the
      // oracle's brute arm is 512 × N xors — feasible in DuckDB at
      // every sf, so the POLICY (order, cap, and the curve itself) is
      // oracle-certified at the same scales the engine measures.
      (s, d) => {
        import s.implicits._
        val reps = imageAhashes(s, d)
          .groupBy($"h_hi", $"h_lo")
          .agg(min($"doc_id").as("doc_id"))
          .localCheckpoint() // band-exploded twice (anchor and corpus side)
        val anchors = reps
          .orderBy(md5($"doc_id".cast("string")), $"doc_id")
          .limit(512)
        def banded(df: DataFrame): DataFrame =
          df.select($"doc_id", $"h_hi", $"h_lo", explode(expr(
            """transform(sequence(0, 15), j -> struct(CAST(j AS BIGINT) AS band,
              |  CASE WHEN j < 8 THEN shiftright(h_lo, CAST(4 * j AS INT)) % 16
              |       ELSE shiftright(h_hi, CAST(4 * (j - 8) AS INT)) % 16 END AS v))""".stripMargin))
              .as("b"))
            .select($"doc_id", $"h_hi", $"h_lo", $"b.band".as("band"), $"b.v".as("v"))
        banded(anchors).as("x").join(banded(reps).as("y"),
            col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
              col("x.doc_id") =!= col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            col("x.h_hi").as("ahi"), col("x.h_lo").as("alo"),
            col("y.h_hi").as("bhi"), col("y.h_lo").as("blo"))
          .distinct() // a close pair shares many 4-bit bands
          .select($"doc_a", $"doc_b",
            expr("ahi ^ bhi").as("xhi"), expr("alo ^ blo").as("xlo"))
          .withColumn("hamming",
            expr("CAST(bit_count(xhi) + bit_count(xlo) AS BIGINT)"))
          .filter($"hamming".between(1, 10))
          .withColumn("r2", ($"xlo" === 0 || $"xhi" === 0).cast("long"))
          .withColumn("r4", expr(
            """CAST(xlo % 65536 = 0 OR shiftright(xlo, 16) = 0
              |  OR xhi % 65536 = 0 OR shiftright(xhi, 16) = 0 AS LONG)""".stripMargin))
          .withColumn("r8", expr(
            """CAST(exists(sequence(0, 3),
              |  j -> shiftright(xlo, CAST(8 * j AS INT)) % 256 = 0
              |    OR shiftright(xhi, CAST(8 * j AS INT)) % 256 = 0) AS LONG)""".stripMargin))
          .groupBy($"hamming")
          .agg(count(lit(1)).as("n_true"),
            sum($"r2").as("n_rec_b2"),
            sum($"r4").as("n_rec_b4"),
            sum($"r8").as("n_rec_b8"))
          .orderBy($"hamming")
      },
      Some(s"""WITH $imageAhashCtes,
              |hh AS (SELECT h_hi, h_lo, MIN(doc_id) AS doc_id FROM h GROUP BY h_hi, h_lo),
              |anc AS (SELECT h_hi, h_lo, doc_id FROM hh
              |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 512),
              |pr AS (
              |  SELECT xor(a.h_hi, y.h_hi) AS xhi, xor(a.h_lo, y.h_lo) AS xlo
              |  FROM anc a JOIN hh y ON a.doc_id <> y.doc_id),
              |hd AS (
              |  SELECT xhi, xlo, bit_count(xhi) + bit_count(xlo) AS d FROM pr)
              |SELECT CAST(d AS BIGINT) AS hamming, COUNT(*) AS n_true,
              |  CAST(SUM(CASE WHEN xlo = 0 OR xhi = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rec_b2,
              |  CAST(SUM(CASE WHEN xlo % 65536 = 0 OR xlo // 65536 = 0
              |                  OR xhi % 65536 = 0 OR xhi // 65536 = 0
              |           THEN 1 ELSE 0 END) AS BIGINT) AS n_rec_b4,
              |  CAST(SUM(CASE WHEN (xlo // 1) % 256 = 0 OR (xlo // 256) % 256 = 0
              |                  OR (xlo // 65536) % 256 = 0 OR (xlo // 16777216) % 256 = 0
              |                  OR (xhi // 1) % 256 = 0 OR (xhi // 256) % 256 = 0
              |                  OR (xhi // 65536) % 256 = 0 OR (xhi // 16777216) % 256 = 0
              |           THEN 1 ELSE 0 END) AS BIGINT) AS n_rec_b8
              |FROM hd WHERE d BETWEEN 1 AND 10
              |GROUP BY 1 ORDER BY hamming""".stripMargin)
    ),

    "q_dedup_image_clusters" -> QueryDef(
      // The image-dedup family's CANONICAL-selection close (round 14;
      // round 17 repointed the pair graph at the PRODUCTION 8×8-band
      // d≤7 tier — the recall curve proved the old d≤3 graph missed
      // ~79% of true near-dups at d=10, so clusters built on it split
      // recompressed variants into separate "canonical" images):
      // connected components over the Hamming≤7 near-dup pair graph, so
      // "keep one image per visual cluster" becomes a groupBy — the same
      // composition q_dedup_clusters runs over embedding pairs, here over
      // the perceptual-hash reps. Every IMAGE document gets a cluster id:
      // doc → its aHash → the hash's canonical rep (the exact tier) → the
      // rep's CC label over near-dup edges (the near tier); isolated reps
      // label themselves. Execution reuses the adaptive
      // ConnectedComponents operator (driver union-find below the
      // subcritical edge bound, Pregel-style min-label propagation above);
      // the oracle certifies the fixpoint with a recursive closure.
      // Scale shape: pairs live on distinct-hash reps (tiny), the label
      // table is bounded by the connected subgraph and broadcasts while it
      // fits, so the per-image side pays one hash-group shuffle and
      // map-side joins — images never pairwise-compare.
      (s, d) => {
        import s.implicits._
        val pairs = imagePhashNearPairs(s, d, nBands = 8, maxDist = 7)
          .select($"doc_a", $"doc_b")
        val nPairs = pairs.count() // bounded: materialized checkpoint, drives the CC mode
        val labels = graft.operators.ConnectedComponents.labels(
          s, pairs.select($"doc_a".as("id_a"), $"doc_b".as("id_b")),
          knownEdgeCount = Some(nPairs))
        val labelSide = if (nPairs < 1000000L) broadcast(labels) else labels
        val reps = imageAhashes(s, d)
          .groupBy($"h_hi", $"h_lo")
          .agg(min($"doc_id").as("rep"))
        imageAhashes(s, d)
          .join(reps, Seq("h_hi", "h_lo"))
          .join(labelSide.select($"id".as("rep"), $"lbl"), Seq("rep"), "left_outer")
          .select($"doc_id", coalesce($"lbl", $"rep").as("cluster_id"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $imagePhashNearB8Ctes,
              |edges AS (
              |  SELECT doc_a AS src, doc_b AS dst FROM np8
              |  UNION ALL SELECT doc_b, doc_a FROM np8),
              |reach(a, rb) AS (
              |  SELECT doc_id, doc_id FROM hh
              |  UNION
              |  SELECT r.a, ed.dst FROM reach r JOIN edges ed ON r.rb = ed.src),
              |lbl AS (SELECT a AS rep, MIN(rb) AS cluster_id FROM reach GROUP BY a),
              |m AS (
              |  SELECT h.doc_id, hh.doc_id AS rep
              |  FROM h JOIN hh USING (h_hi, h_lo))
              |SELECT m.doc_id, l.cluster_id FROM m JOIN lbl l ON m.rep = l.rep
              |ORDER BY doc_id""".stripMargin)
    ),

    "q_dedup_image_ahash" -> QueryDef(
      // The multimodal×dedup bridge (round 13): average-hash (aHash)
      // perceptual fingerprinting over the DECODED image pixels — the
      // first-pass image dedup every multimodal training pipeline runs
      // (hash-equality buckets; Hamming-ball widening would ride the
      // SimHash machinery if needed). Integer-exact by the family's
      // cross-multiplication discipline: luminance G_i = r+g+b per pixel,
      // bit_i = (64·G_i >= ΣG) — no division, no float — packed into two
      // BIGINT halves (the 1<<63 overflow trap: DuckDB checks, Spark
      // wraps; 32-bit halves keep both engines shift-safe). The engine
      // path hashes pixels from the REAL PPM decode, the oracle
      // reconstructs them from `text`, so a decode slip breaks every
      // hash. Exact-duplicate documents (the corpus plants them) encode
      // to identical images and must land in one cluster with the
      // smallest doc_id canonical.
      // Scale shape: map-side hash, ONE shuffle on the 16-byte hash pair
      // (groupBy) — the linear dedup tier, same as q_dedup_exact.
      (s, d) => {
        import s.implicits._
        imageAhashes(s, d)
          .groupBy($"h_hi", $"h_lo")
          .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_images"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH $imageAhashCtes
              |SELECT h_hi, h_lo, MIN(doc_id) AS doc_id, COUNT(*) AS n_images
              |FROM h GROUP BY h_hi, h_lo ORDER BY doc_id""".stripMargin)
    ),

    "q_dedup_audio_fp" -> QueryDef(
      // The AUDIO member of the perceptual-dedup family (round 17 —
      // images had aHash + banded tiers; audio had features but no dedup
      // fingerprint): 64-bin energy-profile fingerprint over the REAL
      // WAV decode (contract at [[audioFps]] — the loudness contour as a
      // 64-bit signature, integer cross-multiplied like the image aHash),
      // then the exact tier: hash-equality clusters with the smallest
      // doc_id canonical. The oracle rebuilds every decoded sample from
      // `text`, so a chunk-walk or sample-decode slip breaks every hash.
      // Scale shape: map-side decode+hash, ONE shuffle on the 16-byte
      // fingerprint — the linear dedup tier, same as q_dedup_image_ahash.
      (s, d) => {
        import s.implicits._
        audioFps(s, d)
          .groupBy($"h_hi", $"h_lo")
          .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_clips"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH $audioFpCtes
              |SELECT h_hi, h_lo, MIN(doc_id) AS doc_id, COUNT(*) AS n_clips
              |FROM h GROUP BY h_hi, h_lo ORDER BY doc_id""".stripMargin)
    ),

    "q_dedup_audio_fp_near" -> QueryDef(
      // NEAR-duplicate audio (round 17): Hamming≤7 pairs between DISTINCT
      // energy-profile fingerprints via the SAME production 8×8-band
      // machinery as the image tier — [[bandedHammingPairs]] verbatim on
      // the engine side, [[bandedB8CtesOver]] on the oracle side — the
      // proof that the banded near-dup tier is modality-agnostic: any
      // 64-bit perceptual hash plugs in with its recall floor (d≤7 exact
      // by pigeonhole) intact. Two re-encodings of the same recording
      // perturb a few envelope bins; the band join recalls them without
      // an all-pairs scan over the clip population.
      (s, d) => {
        import s.implicits._
        bandedHammingPairs(s,
          audioFps(s, d)
            .groupBy($"h_hi", $"h_lo")
            .agg(min($"doc_id").as("doc_id"))
            .localCheckpoint(), // the band explode self-joins this
          nBands = 8, maxDist = 7)
          .select($"doc_a", $"doc_b", $"hamming")
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH ${bandedB8CtesOver(audioFpCtes)}
              |SELECT doc_a, doc_b, hamming FROM np8 ORDER BY doc_a, doc_b""".stripMargin)
    ),

    "q_dedup_video_fp" -> QueryDef(
      // The VIDEO member of the perceptual-dedup triple (round 18 —
      // completes image/audio/video): 64-bin temporal energy-profile
      // fingerprint over the REAL MJPEG-in-MP4 decode — container box
      // walk × per-frame JPEG decode × the audio tier's exact binning
      // discipline on the concatenated pixel timeline (contract at
      // [[videoFps]]) — then the exact tier: hash-equality clusters with
      // the smallest doc_id canonical. Undecodable assets (both planted
      // corruption lanes) are quarantined by the DECODE RESULT, not an id
      // rule — the oracle replays the rules and so certifies the
      // quarantine's membership too. Scale shape: map-side decode+hash,
      // ONE shuffle on the 16-byte fingerprint — the linear dedup tier.
      (s, d) => {
        import s.implicits._
        videoFps(s, d)
          .groupBy($"h_hi", $"h_lo")
          .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_videos"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH $videoFpCtes
              |SELECT h_hi, h_lo, MIN(doc_id) AS doc_id, COUNT(*) AS n_videos
              |FROM h GROUP BY h_hi, h_lo ORDER BY doc_id""".stripMargin)
    ),

    "q_dedup_video_fp_near" -> QueryDef(
      // NEAR-duplicate video (round 18): Hamming≤7 pairs between DISTINCT
      // temporal fingerprints via the SAME production 8×8-band machinery
      // as the image and audio tiers — [[bandedHammingPairs]] verbatim on
      // the engine side, [[bandedB8CtesOver]] on the oracle side — the
      // triple's closing proof that the banded near-dup tier is
      // modality-agnostic: ANY 64-bit perceptual hash plugs in with the
      // d≤7 pigeonhole recall floor intact. A re-encoded or lightly
      // re-edited video perturbs a few timeline bins; the band join
      // recalls it without an all-pairs scan over the asset population.
      (s, d) => {
        import s.implicits._
        bandedHammingPairs(s,
          videoFps(s, d)
            .groupBy($"h_hi", $"h_lo")
            .agg(min($"doc_id").as("doc_id"))
            .localCheckpoint(), // the band explode self-joins this
          nBands = 8, maxDist = 7)
          .select($"doc_a", $"doc_b", $"hamming")
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH ${bandedB8CtesOver(videoFpCtes)}
              |SELECT doc_a, doc_b, hamming FROM np8 ORDER BY doc_a, doc_b""".stripMargin)
    ),

    "q_multimodal_mp4" -> QueryDef(
      // The VIDEO member of the real-codec family (round 13): every
      // document becomes a genuine ISO-BMFF container (ftyp/mdat/moov with
      // the full stbl chain — see Multimodal.assetsFromDocumentsMp4), and
      // the map-only parse runs the real box walk: nested box headers
      // (32/64-bit sizes), mvhd/mdhd versions, hdlr, stsd fourcc, full
      // stsc chunk-run expansion, stsz/stco, and ACTUAL sample-byte reads
      // via the chunk offsets (samples deliberately split across two
      // chunks so the stsc walk is exercised on every file). Codec-payload
      // decode (H.264 entropy+transform) is the family's one documented
      // out-of-scope layer; container work — what a 100 TB video pipeline
      // does for sharding/striping — is fully real. DuckDB reconstructs
      // timescale/duration/sample stats from doc_id; every 89th document
      // is truncated before moov and must surface as the -1 row.
      // Scale shape: map-only; no shuffle but the output sort.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsMp4(s, documents(s, d))
        assets.mapPartitions(_.map { a =>
          graft.multimodal.Mp4Codec.decode(a.content) match {
            case Some(m) =>
              val bs = m.samples.flatMap(_.map(_ & 0xff))
              (a.asset_id, m.timescale, m.duration, m.sampleSizes.length.toLong,
                bs.length.toLong, bs.foldLeft(0L)(_ + _), bs.max.toLong)
            case None => (a.asset_id, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }).toDF("doc_id", "timescale", "duration", "n_samples", "payload_n",
          "payload_sum", "payload_max")
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS ns FROM documents),
             |s AS (SELECT doc_id, ns, unnest(range(ns)) AS k FROM d),
             |sz AS (SELECT doc_id, ns, k, 8 + (doc_id + k) % 9 AS sk FROM s),
             |bj AS (SELECT doc_id, ns, k, unnest(range(sk)) AS j FROM sz),
             |v AS (SELECT doc_id, ns, (doc_id * 31 + k * 17 + j * 7) % 256 AS b FROM bj),
             |agg AS (
             |  SELECT doc_id, MAX(ns) AS ns, COUNT(*) AS pn, SUM(b) AS psum, MAX(b) AS pmax
             |  FROM v GROUP BY doc_id)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE 1000 + doc_id % 100 END AS BIGINT) AS timescale,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE ns * (10 + doc_id % 50) END AS BIGINT) AS duration,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE ns END AS BIGINT) AS n_samples,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE pn END AS BIGINT) AS payload_n,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE psum END AS BIGINT) AS payload_sum,
             |  CAST(CASE WHEN doc_id % 89 = 0 THEN -1 ELSE pmax END AS BIGINT) AS payload_max
             |FROM agg ORDER BY doc_id""".stripMargin)
    ),

    "q_multimodal_video_frames" -> QueryDef(
      // DECODE A VIDEO'S FRAMES, end to end (round 17 — closes the video
      // family's payload layer the r16 verdict named): real container
      // walk × real image decode. Every document is an MJPEG-in-MP4 — a
      // genuine ISO-BMFF container whose sample payloads are genuine
      // baseline-JFIF frames (Multimodal.assetsFromDocumentsMjpeg; the
      // DC-only 16×8 two-block construction pins frame decode to EXACT
      // integer arithmetic) — and the query runs the full pipeline per
      // asset: box walk, stsc/stco chunk expansion, sample extraction,
      // then per-frame marker walk / Huffman / dequant / IDCT, emitting
      // per-frame pixel statistics. Three lanes, all planted: decoded
      // frames (exact stats, DuckDB-reconstructed from doc_id), a
      // frame-level corruption (every 97th doc's LAST frame cut mid-file
      // → that frame routes to -1 without discarding the container), and
      // the container-level truncation (every 89th doc cut before moov →
      // one frame=-1 row). H.264 entropy/transform decode remains the
      // documented out-of-scope layer; this key proves the claim that
      // matters at 100 TB — the engine decodes real video frame payloads
      // through the real container, map-only, no shuffle but the sort.
      (s, d) => {
        import s.implicits._
        val assets = graft.multimodal.Multimodal
          .assetsFromDocumentsMjpeg(s, documents(s, d))
        assets.flatMap { a =>
          graft.multimodal.Mp4Codec.decode(a.content) match {
            case None => Seq((a.asset_id, -1L, -1L, -1L, -1L, -1L))
            case Some(m) =>
              m.samples.zipWithIndex.map { case (sb, k) =>
                graft.multimodal.JpegCodec.decode(sb) match {
                  case Some(j) =>
                    val px = j.pixels.map(_ & 0xff)
                    (a.asset_id, k.toLong, px.length.toLong,
                      px.foldLeft(0L)(_ + _.toLong), px.min.toLong, px.max.toLong)
                  case None => (a.asset_id, k.toLong, -1L, -1L, -1L, -1L)
                }
              }.toSeq
          }
        }.toDF("doc_id", "frame", "n_px", "px_sum", "px_min", "px_max")
          .orderBy($"doc_id", $"frame")
      },
      // the oracle rebuilds every decoded pixel from doc_id alone: block b
      // of frame k holds constant 128 + 2·t with t = ((id·7 + k·13 + b·29)
      // mod 128) − 64 — a wrong Huffman bit, zigzag slot, quant multiply,
      // IDCT constant, stsc run, OR chunk offset breaks the hash
      Some("""WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS nf FROM documents),
             |fr AS (SELECT doc_id, nf, unnest(range(nf)) AS k FROM d),
             |tv AS (SELECT doc_id, nf, k,
             |    128 + 2 * (((doc_id * 7 + k * 13) % 128) - 64) AS p0,
             |    128 + 2 * (((doc_id * 7 + k * 13 + 29) % 128) - 64) AS p1
             |  FROM fr),
             |lanes AS (
             |  SELECT doc_id, CAST(k AS BIGINT) AS frame,
             |    CAST(CASE WHEN doc_id % 97 = 0 AND k = nf - 1 THEN -1 ELSE 128 END AS BIGINT) AS n_px,
             |    CAST(CASE WHEN doc_id % 97 = 0 AND k = nf - 1 THEN -1 ELSE 64 * p0 + 64 * p1 END AS BIGINT) AS px_sum,
             |    CAST(CASE WHEN doc_id % 97 = 0 AND k = nf - 1 THEN -1 ELSE LEAST(p0, p1) END AS BIGINT) AS px_min,
             |    CAST(CASE WHEN doc_id % 97 = 0 AND k = nf - 1 THEN -1 ELSE GREATEST(p0, p1) END AS BIGINT) AS px_max
             |  FROM tv WHERE doc_id % 89 <> 0
             |  UNION ALL
             |  SELECT doc_id, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
             |    CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
             |  FROM documents WHERE doc_id % 89 = 0)
             |SELECT doc_id, frame, n_px, px_sum, px_min, px_max
             |FROM lanes ORDER BY doc_id, frame""".stripMargin)
    ),

    // ---------------------------------------------------------- text analysis
    "q_text_analysis" -> QueryDef(
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("total_tokens"),
            countDistinct($"source").as("n_sources"),
            (sum($"n_tokens").cast("double") / count(lit(1))).as("avg_tokens"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             |  COUNT(DISTINCT source) AS n_sources,
             |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    ),

    "q_text_quality" -> QueryDef(
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", $"n_chars", split($"text", " ").as("tok"))
          .select(
            $"doc_id",
            size($"tok").cast("long").as("n_tokens"),
            $"n_chars",
            // fused occurrence count (value-identical to the filter HOF —
            // Round11OpsSpec)
            (graft.functions.GopherKernels.tokenSetCount(
              s, $"tok", graft.functions.GopherKernels.Stopwords).cast("double")
              / size($"tok")).as("stop_ratio"),
            ($"n_chars".cast("double") / size($"tok")).as("avg_token_len"))
          .withColumn("is_quality",
            $"n_tokens".between(10, 2000) && $"stop_ratio" <= 0.5)
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens, n_chars,
             |  CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / len(tok) AS stop_ratio,
             |  CAST(n_chars AS DOUBLE) / len(tok) AS avg_token_len,
             |  (len(tok) BETWEEN 10 AND 2000
             |   AND CAST(len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / len(tok) <= 0.5) AS is_quality
             |FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS tok FROM documents) t
             |ORDER BY doc_id""".stripMargin)
    ),

    "q_text_langid" -> QueryDef(
      // Marker-token language-ID heuristic: score = stopword hits per lang
      // wordlist, argmax with 'und' fallback; reported against the labeled
      // lang column as a per-lang confusion summary.
      (s, d) => {
        import s.implicits._
        val scored = documents(s, d)
          .select($"doc_id", $"lang", split($"text", " ").as("tok"))
          // fused occurrence counts, one compiled pass per wordlist
          // (value-identical to the filter HOFs — Round11OpsSpec)
          .withColumn("en_score", graft.functions.GopherKernels.tokenSetCount(
            s, $"tok", Seq("the", "a", "of", "and", "to", "in", "is")))
          .withColumn("es_score", graft.functions.GopherKernels.tokenSetCount(
            s, $"tok", Seq("el", "la", "de", "que", "los", "una")))
          .withColumn("fr_score", graft.functions.GopherKernels.tokenSetCount(
            s, $"tok", Seq("le", "la", "de", "et", "les", "une")))
          .withColumn("pred",
            when(greatest($"en_score", $"es_score", $"fr_score") === 0, "und")
              .when($"en_score" >= $"es_score" && $"en_score" >= $"fr_score", "en")
              .when($"es_score" >= $"fr_score", "es")
              .otherwise("fr"))
        scored.groupBy($"lang", $"pred")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy($"lang", $"pred")
      },
      Some("""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents),
             |scored AS (
             |  SELECT doc_id, lang,
             |    len(list_filter(tok, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS en_score,
             |    len(list_filter(tok, x -> x IN ('el', 'la', 'de', 'que', 'los', 'una'))) AS es_score,
             |    len(list_filter(tok, x -> x IN ('le', 'la', 'de', 'et', 'les', 'une'))) AS fr_score
             |  FROM t),
             |pred AS (
             |  SELECT lang,
             |    CASE WHEN GREATEST(en_score, es_score, fr_score) = 0 THEN 'und'
             |         WHEN en_score >= es_score AND en_score >= fr_score THEN 'en'
             |         WHEN es_score >= fr_score THEN 'es'
             |         ELSE 'fr' END AS pred
             |  FROM scored)
             |SELECT lang, pred, COUNT(*) AS n_docs FROM pred
             |GROUP BY lang, pred ORDER BY lang, pred""".stripMargin)
    ),

    "q_text_ngrams" -> QueryDef(
      // Top-5 bigrams per language: explode → two-key count → windowed top-k
      // with deterministic tiebreak. The n-gram frequency shape behind
      // tokenizer/vocab builds; partial-aggregatable counts, k rows per group
      // out.
      (s, d) => {
        import s.implicits._
        val bi = documents(s, d)
          .select($"lang", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 2)
          // fused occurrence-level bigram assembly (Round11OpsSpec)
          .select($"lang",
            explode(graft.functions.GramsJoin.gramsJoin(s, $"tok", 2)).as("bigram"))
        val counts = bi.groupBy($"lang", $"bigram").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy($"lang").orderBy($"n".desc, $"bigram")
        counts.withColumn("rnk", row_number().over(w).cast("long"))
          .filter($"rnk" <= 5)
          .select($"lang", $"rnk", $"bigram", $"n")
          .orderBy($"lang", $"rnk")
      },
      Some("""WITH bi AS (
             |  SELECT lang, unnest(list_transform(range(0, len(tok)-1),
             |    i -> tok[i+1] || ' ' || tok[i+2])) AS bigram
             |  FROM (SELECT lang, string_split(text, ' ') AS tok FROM documents)
             |  WHERE len(tok) >= 2),
             |counts AS (SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY lang, bigram)
             |SELECT lang, rnk, bigram, n FROM (
             |  SELECT lang, bigram, n,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS BIGINT) AS rnk
             |  FROM counts) t
             |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin)
    ),

    "q_token_count" -> QueryDef(
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select(
            $"doc_id",
            size(split($"text", " ")).cast("long").as("n_ws_tokens"),
            $"n_chars",
            ceil($"n_chars" / 4.0).cast("long").as("n_bpe_est"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             |  n_chars, CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_bpe_est
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    "q_text_redact" -> QueryDef(
      // PII-shaped redaction: regex-mask email-like and long-digit tokens,
      // report per-doc redaction counts — the masking pre-pass every
      // training corpus runs. Map-only, composes with pushdown; no shuffle.
      // The fused RedactCounts kernel replaces+counts in one matcher pass
      // per pattern (two total) where the composed regexp_replace/split
      // form re-scanned the text five times (value-identity pinned in
      // Round11OpsSpec; the two-level select keeps CollapseProject from
      // re-inlining the non-cheap kernel per consumer).
      (s, d) => {
        import s.implicits._
        val emailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
        val digitRe = "[0-9]{6,}"
        documents(s, d)
          .select($"doc_id",
            graft.functions.RedactCounts.redactCounts(
              s, $"text", emailRe, "<EMAIL>", digitRe, "<NUM>").as("r"))
          .select($"doc_id", md5($"r.clean").as("clean_fp"),
            $"r.n1".as("n_emails"), $"r.n2".as("n_nums"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             |      '[0-9]{6,}', '<NUM>', 'g')) AS clean_fp,
             |  CAST(len(string_split_regex(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) - 1 AS BIGINT) AS n_emails,
             |  CAST(len(string_split_regex(regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             |      '[0-9]{6,}')) - 1 AS BIGINT) AS n_nums
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    "q_text_repetition" -> QueryDef(
      // Intra-document repetition scoring (a standard corpus-quality
      // signal: templated/boilerplate text repeats n-grams). Per doc:
      // total vs distinct bigram counts; the repetitive flag is decided by
      // exact integer cross-multiplication ((total−unique)·20 > total ⇔
      // ratio > 5%) so no float rounding can diverge between engines.
      // Map-only — composes with pushdown, no shuffle at any scale.
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 2)
          .select($"doc_id",
            (size($"tok") - 1).cast("long").as("n_bigrams"),
            // fused distinct-bigram count (value-identical to the
            // concat_ws HOF chain — Round11OpsSpec)
            graft.functions.GramsDistinctCount
              .gramsDistinctCount(s, $"tok", 2).as("n_unique"))
          .withColumn("is_repetitive",
            ($"n_bigrams" - $"n_unique") * 20 > $"n_bigrams")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |b AS (
             |  SELECT doc_id, CAST(len(tok) - 1 AS BIGINT) AS n_bigrams,
             |    CAST(len(list_distinct(list_transform(range(0, len(tok)-1),
             |      i -> array_to_string(tok[i+1:i+2], ' ')))) AS BIGINT) AS n_unique
             |  FROM t WHERE len(tok) >= 2)
             |SELECT doc_id, n_bigrams, n_unique,
             |  (n_bigrams - n_unique) * 20 > n_bigrams AS is_repetitive
             |FROM b ORDER BY doc_id""".stripMargin)
    ),

    "q_decontaminate" -> QueryDef(
      // Train/test decontamination: flag corpus docs sharing any 5-gram
      // with a benchmark set (docs with doc_id % 31 = 0 stand in for the
      // eval suite). The benchmark side is SMALL AND FIXED by construction
      // — explode its distinct 5-grams and broadcast them; the corpus side
      // is a map-only explode into a broadcast hash join, so the 100 TB
      // corpus never shuffles and no all-pairs comparison exists.
      // Self-matches are excluded; hit count per contaminated doc.
      (s, d) => {
        import s.implicits._
        val needles = grams5(documents(s, d).filter(pmod($"doc_id", lit(31)) === 0))
          .select($"doc_id".as("bench_id"), $"g")
        grams5(documents(s, d))
          .join(broadcast(needles), Seq("g"))
          .filter($"doc_id" =!= $"bench_id")
          .groupBy($"doc_id")
          .agg(countDistinct($"bench_id").as("n_bench_hits"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |g AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' ')))) AS g
             |  FROM t WHERE len(tok) >= 5),
             |needles AS (SELECT doc_id AS bench_id, g FROM g WHERE doc_id % 31 = 0)
             |SELECT c.doc_id, COUNT(DISTINCT n.bench_id) AS n_bench_hits
             |FROM g c JOIN needles n USING (g)
             |WHERE c.doc_id != n.bench_id
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)
    ),

    "q_dedup_incremental" -> QueryDef(
      // Incremental-ingest dedup: a new shard (doc_id % 5 = 0 stands in
      // for today's crawl) keeps only docs whose word-set fingerprint is
      // absent from the existing corpus — LEFT ANTI join on the
      // fingerprint, the shape that lets a 100 TB corpus absorb daily
      // shards by shuffling fingerprints (16 bytes/doc), never documents.
      // Fingerprint = q_dedup_fuzzy's order/multiplicity-insensitive key.
      (s, d) => {
        import s.implicits._
        val fp = documents(s, d).withColumn("fp",
          md5(array_join(array_sort(array_distinct(split($"text", " "))), " ")))
        val corpus = fp.filter(pmod($"doc_id", lit(5)) =!= 0).select($"fp")
        fp.filter(pmod($"doc_id", lit(5)) === 0)
          .join(corpus, Seq("fp"), "left_anti")
          .select($"doc_id", $"fp")
          .orderBy($"doc_id")
      },
      Some("""WITH fp AS (
             |  SELECT doc_id,
             |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
             |  FROM documents)
             |SELECT doc_id, fp FROM fp n
             |WHERE doc_id % 5 = 0 AND NOT EXISTS (
             |  SELECT 1 FROM fp c WHERE c.doc_id % 5 != 0 AND c.fp = n.fp)
             |ORDER BY doc_id""".stripMargin)
    ),

    "q_embedding_quantize" -> QueryDef(
      // Scalar int8 quantization of the embedding column — the storage/
      // serving compression every 100 TB vector store runs (4× smaller
      // than float32 before ANN). Per-dim min/max from ONE pass (64-row
      // stats table, broadcast back), then a map-only quantize; at scale
      // the stats pass is a partial-aggregable shuffle of 64 keys and the
      // quantize never shuffles. Cross-engine parity is exact: both
      // engines widen the same parquet floats to identical doubles, apply
      // the same IEEE (x−mn)·255/(mx−mn) and FLOOR, and the output folds
      // the codes into integer checksums (count/sum/min/max) so no float
      // column rides the hash compare.
      (s, d) => {
        import s.implicits._
        val e = embeddings(s, d)
          .select($"vec_id",
            posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
              .as(Seq("dim", "x")))
        val stats = e.groupBy($"dim").agg(min($"x").as("mn"), max($"x").as("mx"))
        e.join(broadcast(stats), Seq("dim"))
          .withColumn("q",
            when($"mx" === $"mn", lit(0L))
              .otherwise(least(lit(255L),
                floor(($"x" - $"mn") * 255.0 / ($"mx" - $"mn")))))
          .groupBy($"vec_id")
          .agg(count(lit(1)).as("n_dims"), sum($"q").as("q_sum"),
            min($"q").as("q_min"), max($"q").as("q_max"))
          .orderBy($"vec_id")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, r.i AS dim, CAST(embedding[r.i + 1] AS DOUBLE) AS x
             |  FROM embeddings, range(0, 64) r(i)),
             |s AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim),
             |q AS (
             |  SELECT vec_id,
             |    CASE WHEN mx = mn THEN 0
             |         ELSE LEAST(255, CAST(FLOOR((x - mn) * 255.0 / (mx - mn)) AS BIGINT))
             |    END AS q
             |  FROM e JOIN s USING (dim))
             |SELECT vec_id, COUNT(*) AS n_dims, CAST(SUM(q) AS BIGINT) AS q_sum,
             |  MIN(q) AS q_min, MAX(q) AS q_max
             |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin)
    ),

    "q_doc_chunks" -> QueryDef(
      // Training-window chunking: fixed 32-token windows with stride 24
      // (8-token overlap) per document — the context-window packing shape.
      // posexplode of a per-doc window index sequence; map-only, chunk count
      // carried per row so downstream token budgeting needs no re-scan.
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", split($"text", " ").as("tok"))
          // fused window assembly (element-identical to the transform/
          // slice/concat_ws HOF — Round11OpsSpec)
          .select($"doc_id", posexplode(
            graft.functions.ChunkTexts.chunkTexts(s, $"tok", 32, 24)))
          .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
            md5($"col").as("chunk_fp"),
            size(split($"col", " ")).cast("long").as("chunk_tokens"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |w AS (
             |  SELECT doc_id, unnest(range(0, CAST(GREATEST(CEIL((len(tok) - 32) / 24.0), 0) AS BIGINT) + 1)) AS w,
             |    tok
             |  FROM t)
             |SELECT doc_id, w AS chunk_idx,
             |  md5(array_to_string(tok[w*24+1 : w*24+32], ' ')) AS chunk_fp,
             |  CAST(len(tok[w*24+1 : w*24+32]) AS BIGINT) AS chunk_tokens
             |FROM w ORDER BY doc_id, chunk_idx""".stripMargin)
    ),

    "q_text_tfidf" -> QueryDef(
      // Top-3 tf-idf terms per document (first 50 docs): tf from per-doc
      // term counts, idf = ln(N / df) over the corpus — the vocabulary-
      // weighting shape behind keyword extraction and sparse retrieval.
      // Two partial-aggregatable counts + a broadcast-sized df join; the
      // per-doc top-k is a bounded window. ln() is correctly-rounded IEEE
      // in both engines; scores round to 6 dp with term tiebreak.
      (s, d) => {
        import s.implicits._
        val docsAll = documents(s, d)
        // corpus size: one scalar count to the driver (same class as the
        // IVF seed collect — a literal in the plan, not per-row state)
        val n = docsAll.count()
        val terms = docsAll
          .select($"doc_id", explode(split($"text", " ")).as("term"))
        val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        val dfreq = terms.select($"doc_id", $"term").distinct()
          .groupBy($"term").agg(count(lit(1)).as("df"))
        val scored = tf.join(dfreq, Seq("term"))
          .filter($"doc_id" < 50)
          .withColumn("tfidf", round($"tf" * log(lit(n.toDouble) / $"df"), 6))
        val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term")
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter($"rnk" <= 3)
          .select($"doc_id", $"rnk", $"term", $"tfidf")
          .orderBy($"doc_id", $"rnk")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
             |dfreq AS (
             |  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms)
             |  GROUP BY term),
             |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
             |scored AS (
             |  SELECT doc_id, term, ROUND(tf * ln(n.n / df), 6) AS tfidf
             |  FROM tf JOIN dfreq USING (term), n WHERE doc_id < 50)
             |SELECT doc_id, rnk, term, tfidf FROM (
             |  SELECT doc_id, term, tfidf,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
             |  FROM scored) t
             |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)
    ),

    "q_doc_fingerprint" -> QueryDef(
      // Chunked rolling fingerprint: md5 per 16-token window — the shape used
      // for shard-level dedup manifests. posexplode keeps (chunk_idx, fp).
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", split($"text", " ").as("tok"))
          // fused tiling (same 16/16 chunk texts — for width = stride the
          // kernel's window count equals ceil(n/16) at every n >= 1); md5
          // moves OUT of the interpreted lambda to a post-explode
          // codegen'd call over the identical strings
          .select($"doc_id", posexplode(
            graft.functions.ChunkTexts.chunkTexts(s, $"tok", 16, 16)))
          .select($"doc_id", $"pos".cast("long").as("chunk_idx"), md5($"col").as("fp"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |fps AS (
             |  SELECT doc_id, unnest(list_transform(range(0, CAST(CEIL(len(tok) / 16.0) AS BIGINT)),
             |    i -> {'i': i, 'fp': md5(array_to_string(tok[i*16+1 : i*16+16], ' '))})) AS c
             |  FROM t)
             |SELECT doc_id, CAST(c.i AS BIGINT) AS chunk_idx, c.fp AS fp
             |FROM fps ORDER BY doc_id, chunk_idx""".stripMargin)
    ),

    "q_heavy_hitters" -> QueryDef(
      // Frequent items over a high-cardinality key (corpus tokens) via the
      // mergeable SpaceSaving aggregate: k counters per partition, k-sized
      // summary merge — the shuffle is O(k × partitions) where an exact
      // groupBy ships one row per DISTINCT token. Counter contents ride
      // partition arrival order, so the DRIVER-VERIFIED contract is the
      // Metwally THEOREM on the exact top-10 tokens, stated with its real
      // precondition: any item with true count STRICTLY ABOVE the n/k
      // coverage threshold must be present in the k=32 summary with
      // est − err ≤ true ≤ est; below the threshold the theorem promises
      // nothing and `sketch_ok` is vacuously true. (The earlier unguarded
      // form silently assumed every top-10 token cleared the threshold —
      // true of the small corpora, false at the sf1 scale point, where the
      // vocabulary grows 10× and top counts do not.) The exact count side
      // exists only to certify the sketch (the oracle states it, plus
      // TRUE); production reads the summary alone. Per-estimate error
      // bounds and arbitrary-split merge invariance stay property-tested
      // in FreqSketchSpec.
      (s, d) => {
        import s.implicits._
        val toks = documents(s, d).select(explode(split($"text", " ")).as("token"))
        // ONE pass builds the sketch AND the exact token total for n/k;
        // the 1-row result is localCheckpointed so the driver-read total
        // and the broadcast sketch rows share a single execution, and the
        // threshold rides the plan as a literal (a joined n_total column
        // would go NULL exactly for summary-MISSING tokens — the case the
        // guard must classify)
        val agg = toks
          .agg(graft.functions.FreqSketch.freqSketch(s, $"token", 32).as("hh"),
            count(lit(1)).as("n_total"))
          .localCheckpoint()
        val nTotal = agg.select($"n_total").head().getLong(0)
        val sketch = agg
          .select(explode($"hh").as("e"))
          .select($"e.item".as("token"), $"e.est".as("est"), $"e.err".as("err"))
        // exact top-10 via TakeOrderedAndProject (ties broken by token)
        val top10 = toks.groupBy($"token").agg(count(lit(1)).as("n_true"))
          .orderBy($"n_true".desc, $"token").limit(10)
        top10.join(broadcast(sketch), Seq("token"), "left_outer")
          .select($"token", $"n_true",
            (!($"n_true" > lit(nTotal) / 32L) ||
              ($"est".isNotNull && $"est" - $"err" <= $"n_true" &&
                $"n_true" <= $"est")).as("sketch_ok"))
          .orderBy($"n_true".desc, $"token")
      },
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
             |c AS (
             |  SELECT token, COUNT(*) AS n_true FROM tok GROUP BY token
             |  ORDER BY n_true DESC, token LIMIT 10)
             |SELECT token, n_true, TRUE AS sketch_ok
             |FROM c ORDER BY n_true DESC, token""".stripMargin)
    ),

    "q_cluster_canonical" -> QueryDef(
      // The step dedup pipelines actually ship: pick ONE representative per
      // near-dup cluster (longest text wins, lowest doc_id breaks ties) so
      // downstream training reads canonical docs only. Composes the shared
      // pair generation + adaptive connected components with a per-cluster
      // top-1 window; only multi-member clusters surface (singletons pass
      // through unchanged in a real pipeline). Label and size tables are
      // bounded by the connected subgraph — broadcast while the edge count
      // says they fit — so the corpus never reshuffles on healthy data.
      (s, d) => {
        import s.implicits._
        // already materialized (checkpointed) inside embeddingDupPairs
        val pairs = embeddingDupPairs(s, d).select($"id_a", $"id_b")
        val nPairs = pairs.count()
        val labels = graft.operators.ConnectedComponents.labels(
          s, pairs, knownEdgeCount = Some(nPairs))
        // label/size tables are bounded by the connected subgraph —
        // broadcast only while the edge count says they fit (same gate as
        // q_dedup_clusters; past it the joins fall back to shuffles on id)
        def gated(df: DataFrame) = if (nPairs < 1000000L) broadcast(df) else df
        val lbl = embeddings(s, d).select($"vec_id".as("id"))
          .join(gated(labels), Seq("id"), "left_outer")
          .select($"id".as("doc_id"), coalesce($"lbl", $"id").as("cluster_id"))
        val sized = lbl.groupBy($"cluster_id")
          .agg(count(lit(1)).as("n_members"))
          .filter($"n_members" >= 2)
        val members = lbl.join(gated(sized), Seq("cluster_id"))
          .join(documents(s, d).select($"doc_id", $"n_chars"), Seq("doc_id"))
        val w = Window.partitionBy($"cluster_id").orderBy($"n_chars".desc, $"doc_id")
        members.withColumn("rk", row_number().over(w))
          .filter($"rk" === 1)
          .select($"cluster_id", $"doc_id".as("canonical_doc"),
            $"n_members", $"n_chars".as("canonical_chars"))
          .orderBy($"cluster_id")
      },
      Some(s"""WITH RECURSIVE $embPairsCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE cos4 >= 0.45),
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs),
              |reach(a, rb) AS (
              |  SELECT vec_id, vec_id FROM e
              |  UNION
              |  SELECT r.a, ed.dst FROM reach r JOIN edges ed ON r.rb = ed.src),
              |lbl AS (SELECT a AS doc_id, MIN(rb) AS cluster_id FROM reach GROUP BY a),
              |sized AS (
              |  SELECT cluster_id, COUNT(*) AS n_members FROM lbl
              |  GROUP BY 1 HAVING COUNT(*) >= 2),
              |memb AS (
              |  SELECT l.doc_id, l.cluster_id, s.n_members, d.n_chars
              |  FROM lbl l JOIN sized s USING (cluster_id) JOIN documents d USING (doc_id))
              |SELECT cluster_id, doc_id AS canonical_doc, n_members, n_chars AS canonical_chars
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
              |    ORDER BY n_chars DESC, doc_id) AS rk
              |  FROM memb) t
              |WHERE rk = 1 ORDER BY cluster_id""".stripMargin)
    ),

    "q_pack_batches" -> QueryDef(
      // Token-budget macro-batching (context-window packing at corpus
      // granularity): within each language shard, docs in doc_id order pack
      // into batches by cumulative-token floor — a single window pass, no
      // sequential scan; a batch overshoots its 2048-token budget by at most
      // one document, the standard price for a parallelizable packer. The
      // window partitions by lang, so shards pack independently — exactly
      // how a 100 TB corpus packs per shard/worker without any global
      // coordination.
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"lang").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        documents(s, d)
          .withColumn("n_tok", size(split($"text", " ")).cast("long"))
          .withColumn("cum", sum($"n_tok").over(w))
          .withColumn("batch_id", expr("(cum - n_tok) div 2048"))
          .groupBy($"lang", $"batch_id")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("batch_tokens"),
            min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
          .orderBy($"lang", $"batch_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, lang, n_tok,
             |    CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM t)
             |SELECT lang, CAST((cum - n_tok) // 2048 AS BIGINT) AS batch_id,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS batch_tokens,
             |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
             |FROM c GROUP BY 1, 2 ORDER BY lang, batch_id""".stripMargin)
    ),

    "q_decontaminate_semantic" -> QueryDef(
      // Semantic (embedding-space) decontamination — the decontamination
      // family's third mechanism: q_decontaminate / q_decontaminate_bloom
      // flag VERBATIM 5-gram overlap with the benchmark needles; this one
      // flags PARAPHRASED contamination — for every corpus embedding, its
      // nearest benchmark embedding (vec_id % 31 = 0, the family's needle
      // convention) by EXACT cosine, plus contam = sim4 >= tau. Like
      // q_dedup_embedding, tau is tuned to this corpus (no planted
      // cross-needle dups; the max needle-corpus pair is ~0.40 at sf0.01,
      // ~0.52 at sf0.1) so BOTH flag branches exercise at every gated sf —
      // a production deployment sets tau at its embedding model's
      // paraphrase operating point (typically ~0.95). The full
      // per-vector audit row is emitted (not just the flagged minority) so
      // a release can also see how close its near-misses run.
      // Scale shape: MAP-ONLY. The needle MATRIX rides a TorrentBroadcast
      // — benchmark suites are bounded the same way the 5-gram needle set
      // is (the collect below is |benchmark|×64 doubles, ~5 MB at the sf16
      // composed point, the same documented bound as collectBloomWords) —
      // and the corpus projects through ONE fused codegen'd expression
      // (graft.functions.NeedleArgmaxPacked): the per-needle cosine loop,
      // the exact HALF_UP 4-dp round (run once on the raw max — rounding
      // is monotone — with only near-ties re-rounded for the min-id rule)
      // and the family packing all happen per ROW, so the corpus × needles
      // pair stream never materializes, no aggregate runs, and the only
      // exchange in the whole query is the scan-parallelizing repartition
      // plus the output sort (plan-gated). The first cut was a broadcast
      // NLJ + packed-long HashAggregate argmax — row-identical
      // (Round11OpsSpec pins fused-vs-naive equality on a crafted
      // fixture) but it materializes the n×m pair stream as rows; it also
      // exposed a BENCH methodology bug (count()-forcing let column
      // pruning delete the probe entirely — see BENCH_SCALING's
      // forcing-fix section for the real, rows-forced figures). A needle
      // set past broadcast scale composes with the library's IVF quantizer
      // at the cost of exact recall — no longer prose: that tier is CODE,
      // forced at every sf as q_decontaminate_semantic_ivf (cell-route
      // shuffle-hash equi-join, see semanticDecontamIvf), with the recall
      // loss MEASURED against this exact arm by
      // q_decontaminate_semantic_recall.
      // Packing: s = round(sim4·10^4)+10^4 ∈ [0,20000] in the high bits,
      // (2^41−1−n_id) in the low 41 (ids < 2^41: exabyte-corpus headroom);
      // larger packed = (better sim, then SMALLER needle id), and
      // k/10000.0 reconstructs round(x,4) bit-identically — both are the
      // correctly-rounded double of k/10^4.
      (s, d) => semanticDecontamExact(s, d),
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |n AS (
             |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
             |p AS (
             |  SELECT c.vec_id, q.vec_id AS n_id,
             |    ROUND(list_sum(list_transform(range(1, 65), i -> c.v[i] * q.v[i])) / (c.nrm * q.nrm), 4) + 0.0 AS sim4
             |  FROM n c JOIN n q ON c.vec_id % 31 <> 0 AND q.vec_id % 31 = 0)
             |SELECT vec_id, n_id, sim4, sim4 >= 0.40 AS contam FROM (
             |  SELECT vec_id, n_id, sim4,
             |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim4 DESC, n_id) AS rn
             |  FROM p) t
             |WHERE rn = 1 ORDER BY vec_id""".stripMargin)
    ),

    "q_decontaminate_semantic_ivf" -> QueryDef(
      // The past-broadcast tier of semantic decontamination, FORCED through
      // the cell route at every sf (no auto-switching — this key exists to
      // keep the scale branch oracle-gated, exactly as q_semdedup_table
      // forces the broadcast-kernel tier and q_stream_decontaminate_bc
      // forces the TorrentBroadcast Bloom). Same audit schema as the exact
      // arm; results differ only where the true nearest needle hides in an
      // unprobed cell — the loss q_decontaminate_semantic_recall measures.
      // Full mechanism + policy scaladoc: semanticDecontamIvf above.
      (s, d) => semanticDecontamIvf(s, d),
      Some(s"""WITH ${semanticIvfCtes()}
              |SELECT vec_id, n_id, sim4, contam FROM ivf ORDER BY vec_id""".stripMargin)
    ),

    "q_decontaminate_semantic_ivf_adaptive" -> QueryDef(
      // The PRODUCTION probe-width policy the round-13 recall curve
      // prescribes, forced as its own oracle-gated key (the
      // q_semdedup_table discipline — no prose-only production tiers):
      // constant nprobe=2 collapses to 53.8% flag agreement at the seed
      // policy's worst case (0.6% of K=323 cells probed at sf4), so the
      // engine takes a POLICY — nprobe = max(2, ⌈K/8⌉), a fixed probed
      // FRACTION ([[graft.operators.IvfKMeans.adaptiveNprobe]]) — and this
      // key runs the full IVF tier through it. The needle set is denser
      // (every 3rd vector) so K at the oracle scale is already large
      // enough that the adaptive width genuinely exceeds the legacy
      // constant (sf0.01: 167 needles → K=21 → nprobe=3; sf0.1: K≈84 →
      // nprobe=11) — the policy branch is exercised, not just compiled.
      // The DuckDB oracle derives the SAME width from the SAME trained
      // centroid table (npol CTE: GREATEST(2, CEIL(COUNT(*)/8)) over c2),
      // so any drift between engine policy and published policy breaks
      // the hash. Recall delivered by the policy is measured at the
      // forced scales by tools/IvfRecallCurve (BENCH_SCALING round 14).
      (s, d) => semanticDecontamIvf(
        s, d, graft.operators.IvfKMeans.adaptiveNprobe, 3L, Long.MaxValue),
      Some(s"""WITH ${semanticIvfCtes(3,
                 "SELECT GREATEST(2, CAST(ceil(COUNT(*) / 8.0) AS BIGINT)) AS np FROM c2")}
              |SELECT vec_id, n_id, sim4, contam FROM ivf ORDER BY vec_id""".stripMargin)
    ),

    "q_decontaminate_semantic_budget" -> QueryDef(
      // The NEEDLE-BUDGET policy arm (round 16 — the r14 verdict's
      // cost-linearity item): the mod-rule needle set GROWS with the
      // corpus, so the adaptive tier's pair work is quadratic-over-8
      // (corpus × needles/8 — measured 4.06× per 4× at sf16); a real
      // benchmark suite is fixed-size. This key runs the full adaptive
      // IVF tier over a suite CAPPED at 64 needles in deterministic md5
      // order (ties by vec_id), applied BEFORE quantizer training — K,
      // the probe width and the per-vector work become constants and the
      // corpus pass is linear at every scale. The budget BINDS at the
      // oracle scale (sf0.01: 64 of 167 mod-3 needles survive), so the
      // cap path — not a pass-through — is what the hash certifies: the
      // DuckDB oracle replays the same ORDER BY md5 LIMIT cap, the
      // count-driven stride over the capped suite, both Lloyd iterations,
      // and the adaptive width from the capped-trained centroid table.
      // Flag agreement vs the exact scan over the SAME suite is measured
      // by q_decontaminate_semantic_budget_recall.
      (s, d) => semanticDecontamIvf(
        s, d, graft.operators.IvfKMeans.adaptiveNprobe, 3L, needleBudget = 64L),
      Some(s"""WITH ${semanticIvfCtes(3,
                 "SELECT GREATEST(2, CAST(ceil(COUNT(*) / 8.0) AS BIGINT)) AS np FROM c2",
                 needleBudget = 64L)}
              |SELECT vec_id, n_id, sim4, contam FROM ivf ORDER BY vec_id""".stripMargin)
    ),

    "q_decontaminate_semantic_budget_recall" -> QueryDef(
      // Recall/agreement gate for the budgeted tier — the family rule: no
      // approximate (or capped) tier ships without its loss measured. The
      // comparison is IVF-vs-exact over the SAME budgeted suite (both arms
      // take the identical md5-order 64-needle cap), so the counters
      // isolate the IVF cell-route loss — the budget itself defines the
      // suite, it is not a loss to measure. Same integer-only audit row as
      // q_decontaminate_semantic_recall: corpus size, argmax agreement,
      // each arm's contamination count, flag agreement (the number a
      // release acts on).
      (s, d) => {
        import s.implicits._
        val ex = semanticDecontamExact(s, d, needleMod = 3L, needleBudget = 64L)
          .select($"vec_id", $"n_id".as("n_ex"), $"contam".as("c_ex"))
        val iv = semanticDecontamIvf(
            s, d, graft.operators.IvfKMeans.adaptiveNprobe, 3L, needleBudget = 64L)
          .select($"vec_id", $"n_id".as("n_iv"), $"contam".as("c_iv"))
        ex.join(iv, Seq("vec_id"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when($"n_ex" === $"n_iv", 1L).otherwise(0L)).as("n_argmax_match"),
            sum(when($"c_ex", 1L).otherwise(0L)).as("n_contam_exact"),
            sum(when($"c_iv", 1L).otherwise(0L)).as("n_contam_ivf"),
            sum(when($"c_ex" === $"c_iv", 1L).otherwise(0L)).as("n_flag_agree"))
      },
      Some(s"""WITH ${semanticIvfCtes(3,
                 "SELECT GREATEST(2, CAST(ceil(COUNT(*) / 8.0) AS BIGINT)) AS np FROM c2",
                 needleBudget = 64L)},
              |ex AS (
              |  SELECT vec_id, n_id, sim4 >= 0.40 AS contam FROM (
              |    SELECT c.vec_id, q.vec_id AS n_id,
              |      ROUND(list_sum(list_transform(range(1, 65), i -> c.v[i] * q.v[i])) / (c.nrm * q.nrm), 4) + 0.0 AS sim4,
              |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
              |        ROUND(list_sum(list_transform(range(1, 65), i -> c.v[i] * q.v[i])) / (c.nrm * q.nrm), 4) + 0.0 DESC,
              |        q.vec_id) AS rn
              |    FROM cor c, n q) t WHERE rn = 1)
              |SELECT COUNT(*) AS n_vecs,
              |  CAST(SUM(CASE WHEN ex.n_id = ivf.n_id THEN 1 ELSE 0 END) AS BIGINT) AS n_argmax_match,
              |  CAST(SUM(CASE WHEN ex.contam THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_exact,
              |  CAST(SUM(CASE WHEN ivf.contam THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_ivf,
              |  CAST(SUM(CASE WHEN ex.contam = ivf.contam THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_agree
              |FROM ex JOIN ivf USING (vec_id)""".stripMargin)
    ),

    "q_decontaminate_semantic_recall" -> QueryDef(
      // Recall measurement for the IVF decontamination tier — the
      // q_similarity_recall discipline: no approximate tier ships without
      // its loss measured against the exact arm. One integer-only row
      // (exact hash compare): corpus size, how many vectors' argmax needle
      // agrees between the arms (argmax recall@1), each arm's contamination
      // count, and how many vectors get the SAME contam flag — the number a
      // release actually acts on (an argmax miss that lands on an equally-
      // contaminated needle still flags correctly).
      (s, d) => {
        import s.implicits._
        val ex = semanticDecontamExact(s, d)
          .select($"vec_id", $"n_id".as("n_ex"), $"contam".as("c_ex"))
        val iv = semanticDecontamIvf(s, d)
          .select($"vec_id", $"n_id".as("n_iv"), $"contam".as("c_iv"))
        ex.join(iv, Seq("vec_id"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when($"n_ex" === $"n_iv", 1L).otherwise(0L)).as("n_argmax_match"),
            sum(when($"c_ex", 1L).otherwise(0L)).as("n_contam_exact"),
            sum(when($"c_iv", 1L).otherwise(0L)).as("n_contam_ivf"),
            sum(when($"c_ex" === $"c_iv", 1L).otherwise(0L)).as("n_flag_agree"))
      },
      Some(s"""WITH ${semanticIvfCtes()},
              |ex AS (
              |  SELECT vec_id, n_id, sim4 >= 0.40 AS contam FROM (
              |    SELECT c.vec_id, q.vec_id AS n_id,
              |      ROUND(list_sum(list_transform(range(1, 65), i -> c.v[i] * q.v[i])) / (c.nrm * q.nrm), 4) + 0.0 AS sim4,
              |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
              |        ROUND(list_sum(list_transform(range(1, 65), i -> c.v[i] * q.v[i])) / (c.nrm * q.nrm), 4) + 0.0 DESC,
              |        q.vec_id) AS rn
              |    FROM cor c, n q) t WHERE rn = 1)
              |SELECT COUNT(*) AS n_vecs,
              |  CAST(SUM(CASE WHEN ex.n_id = ivf.n_id THEN 1 ELSE 0 END) AS BIGINT) AS n_argmax_match,
              |  CAST(SUM(CASE WHEN ex.contam THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_exact,
              |  CAST(SUM(CASE WHEN ivf.contam THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_ivf,
              |  CAST(SUM(CASE WHEN ex.contam = ivf.contam THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_agree
              |FROM ex JOIN ivf USING (vec_id)""".stripMargin)
    ),

    "q_decontaminate_bloom" -> QueryDef(
      // Bloom-filter decontamination — the BOUNDED-broadcast variant of
      // q_decontaminate: benchmark 5-grams fold into a Bloom bitmap (k = 2
      // md5-derived hashes over 63-bit words — DuckDB overflow-checks
      // 1 << 63, and the oracle must rebuild the identical bitmap; md5 is
      // likewise the parity contract, not the fast choice: the
      // `fastHash = true` xxhash64 path measures 1.42× end-to-end at sf1
      // via graft.tools.BloomHashBench). The bitmap is sized by
      // the occupancy-adaptive policy and probed map-side via plan
      // literals (or broadcast word joins past the literal cap) — see
      // [[bloomDecontaminate]] for the policy, the saturation measurement
      // that forced it, and the mechanism switch. False negatives are
      // structurally impossible and the oracle proves it: DuckDB recomputes
      // the same sizing policy and bitmap from scratch in SQL at EVERY
      // scale, so any construction/probe/sizing bug breaks the hash
      // compare, and every exact_hit row must carry bloom_hit = true.
      (s, d) => bloomDecontaminate(s, d),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |g AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' ')))) AS g
             |  FROM t WHERE len(tok) >= 5),
             |bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 31 = 0),
             |p AS (
             |  SELECT CASE WHEN 64 * COUNT(*) <= 65536 THEN 65536::BIGINT
             |              WHEN CEIL(LOG2(64.0 * COUNT(*))) >= 32 THEN (1::BIGINT << 32)
             |              ELSE (1::BIGINT << CAST(CEIL(LOG2(64.0 * COUNT(*))) AS INT)) END AS mbits
             |  FROM bg),
             |bits AS (
             |  SELECT unnest([('0x' || substring(md5(g), 1, 8))::BIGINT % (SELECT mbits FROM p),
             |                 ('0x' || substring(md5(g), 9, 8))::BIGINT % (SELECT mbits FROM p)]) AS bit
             |  FROM bg),
             |words AS (
             |  SELECT bit // 63 AS w, bit_or(1::BIGINT << CAST(bit % 63 AS INT)) AS word
             |  FROM bits GROUP BY 1),
             |probe AS (
             |  SELECT doc_id, g,
             |    ('0x' || substring(md5(g), 1, 8))::BIGINT % (SELECT mbits FROM p) AS h1,
             |    ('0x' || substring(md5(g), 9, 8))::BIGINT % (SELECT mbits FROM p) AS h2
             |  FROM g WHERE doc_id % 31 != 0),
             |f AS (
             |  SELECT p.doc_id,
             |    (w1.word IS NOT NULL AND (w1.word & (1::BIGINT << CAST(p.h1 % 63 AS INT))) != 0
             |     AND w2.word IS NOT NULL AND (w2.word & (1::BIGINT << CAST(p.h2 % 63 AS INT))) != 0) AS bloom_g,
             |    EXISTS (SELECT 1 FROM bg WHERE bg.g = p.g) AS bench_g
             |  FROM probe p
             |  LEFT JOIN words w1 ON w1.w = p.h1 // 63
             |  LEFT JOIN words w2 ON w2.w = p.h2 // 63)
             |SELECT doc_id, CAST(SUM(CASE WHEN bloom_g THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_grams,
             |  bool_or(bloom_g) AS bloom_hit, bool_or(bench_g) AS exact_hit
             |FROM f GROUP BY doc_id
             |HAVING bool_or(bloom_g) OR bool_or(bench_g)
             |ORDER BY doc_id""".stripMargin)
    ),

    "q_sample_quota" -> QueryDef(
      // Per-source quota sampling (domain caps, the Gopher/C4-style "no
      // domain may dominate the corpus" rule): keep at most 15 docs per
      // source, selected by a deterministic md5 order so the sample is
      // reproducible across engines and runs. Uses the bounded_topk
      // partial-aggregable TypedImperativeAggregate, so map-side partials
      // carry ≤15 rows per source and only k×sources rows shuffle — a
      // row_number() window would shuffle and sort the ENTIRE corpus per
      // source (and a hot domain is precisely where quota sampling
      // matters). The 48-bit hash key fits a double exactly (< 2^53), so
      // the DESC-on-negated-hash order is bit-identical to the oracle's
      // ASC hash order.
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .withColumn("hkey",
            conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
              .cast("double"))
          .groupBy($"source")
          .agg(graft.functions.BoundedTopK
            .boundedTopK(s, -$"hkey", $"doc_id", 15).as("topk"))
          .select($"source", posexplode($"topk"))
          .select($"source", ($"pos" + 1).cast("long").as("rnk"),
            $"col.id".as("doc_id"))
          .orderBy($"source", $"rnk")
      },
      Some("""SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id FROM (
             |  SELECT source, doc_id,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
             |      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT,
             |      doc_id) AS rnk
             |  FROM documents) t
             |WHERE rnk <= 15 ORDER BY source, rnk""".stripMargin)
    ),

    "q_knn_graph" -> QueryDef(
      // k-NN graph construction (k = 2) over the WHOLE embedding corpus —
      // the precursor to semantic dedup / clustering (SemDeDup-style):
      // every vector's 2 nearest bucket-mates by exact cosine, candidates
      // bounded by the same 8-bit hyperplane-LSH bucketing as
      // q_similarity_ann_lsh. Unlike the query-side-broadcast ANN shapes,
      // BOTH sides are the full corpus: the self-join is a shuffle
      // equi-join on bucket (Σ occupancy² pairs, occupancy-bounded — never
      // all-pairs), and the top-2 window partitions by vector, so every
      // stage distributes. Because candidate pairs grow as Σ occupancy²,
      // the bucket width is occupancy-adaptive like embeddingDupPairs:
      // 8 bits up to 2^16 vectors, the full 16-bit signature beyond —
      // and the oracle computes the SAME count-driven policy in SQL (pol
      // CTE), so engine and oracle agree at every scale; past ~10^6
      // vectors the extension is a wider multi-word signature.
      (s, d) => {
        import s.implicits._
        val eraw = embeddings(s, d)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .withColumn("sig16", graft.functions.LshFunctions.hyperplaneSig(s, $"v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = eraw.count() // materializes the persist it would pay anyway
        val bits = if (n <= 65536L) 8 else 16
        val e = eraw.withColumn("bucket", pmod($"sig16", lit(1 << bits)))
        val scored = e.select($"vec_id", $"v", $"bucket")
          .join(e.select($"vec_id".as("nbr_id"), $"v".as("nv"), $"bucket"), Seq("bucket"))
          .filter($"vec_id" =!= $"nbr_id")
          // + 0.0: -0.0 parity normalization, same as the sim4 queries above
          .withColumn("sim4",
            round(graft.functions.CosineSimilarity.cosineSim(s, $"v", $"nv"), 4) + lit(0.0))
        val w = Window.partitionBy($"vec_id").orderBy($"sim4".desc, $"nbr_id")
        val out = scored.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 2)
          .select($"vec_id", $"rnk".cast("long").as("rnk"), $"nbr_id", $"sim4")
          .orderBy($"vec_id", $"rnk")
          // materialize the thin k-NN edge list (2 rows/vector, 4 cols),
          // then release the corpus-sized signature cache
          .localCheckpoint()
        eraw.unpersist(blocking = false)
        out
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |b AS (
              |  SELECT vec_id, v,
              |    CAST(list_sum(list_transform(range(0, 16), p ->
              |      CASE WHEN list_sum(list_transform(range(0, 64),
              |          i -> v[i + 1] * CAST((([${PipelineQueries.lshA.mkString(",")}]::BIGINT[])[p + 1] * (i + 1)
              |                              + ([${PipelineQueries.lshB.mkString(",")}]::BIGINT[])[p + 1]) % 1009 - 504 AS DOUBLE))) > 0
              |           THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS sig16
              |  FROM e),
              |pol AS (SELECT CASE WHEN COUNT(*) <= 65536 THEN 8 ELSE 16 END AS bits FROM e),
              |n AS (SELECT vec_id, v, sig16 % (1 << (SELECT bits FROM pol)) AS bucket,
              |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM b),
              |s AS (
              |  SELECT q.vec_id, c.vec_id AS nbr_id,
              |    ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) + 0.0 AS sim4
              |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
              |SELECT vec_id, rnk, nbr_id, sim4 FROM (
              |  SELECT vec_id, nbr_id, sim4,
              |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim4 DESC, nbr_id) AS BIGINT) AS rnk
              |  FROM s) t
              |WHERE rnk <= 2 ORDER BY vec_id, rnk""".stripMargin)
    ),

    "q_similarity_recall" -> QueryDef(
      // ANN quality evaluation — recall@3 of the LSH-bucketed index against
      // exact brute force for the 10 query vectors: the measurement every
      // production vector pipeline runs before trusting an approximate
      // index. Both retrievals are the library's own shapes (broadcast
      // query side; bucket equi-join for the ANN arm), the comparison is an
      // equi-join on (q_id, c_id) + counting — integers only, no float
      // ratio rides the hash compare. At 100 TB the exact arm runs on a
      // SAMPLED query set (recall estimation), which is exactly this plan
      // with a different query predicate.
      (s, d) => {
        import s.implicits._
        val e = embeddings(s, d)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .withColumn("bucket", graft.functions.LshFunctions.hyperplaneSig(s, $"v") % 256)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"v".as("qv"), $"bucket".as("qbucket"))
        def top3(joined: DataFrame): DataFrame = {
          val w = Window.partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")
          joined
            .withColumn("sim4",
              round(graft.functions.CosineSimilarity.cosineSim(s, $"qv", $"cv"), 4))
            .withColumn("rnk", row_number().over(w))
            .filter($"rnk" <= 3)
            .select($"q_id", $"c_id")
        }
        val cand = e.select($"vec_id".as("c_id"), $"v".as("cv"), $"bucket")
        val exact = top3(cand.join(broadcast(q), $"q_id" =!= $"c_id"))
        val ann = top3(cand.join(broadcast(q), $"qbucket" === $"bucket" && $"q_id" =!= $"c_id"))
        val nExact = exact.groupBy($"q_id").agg(count(lit(1)).as("n_exact"))
        val nAnn = ann.groupBy($"q_id").agg(count(lit(1)).as("n_ann"))
        val nHit = exact.join(ann, Seq("q_id", "c_id"))
          .groupBy($"q_id").agg(count(lit(1)).as("n_hit"))
        val out = nExact
          .join(nAnn, Seq("q_id"), "left_outer")
          .join(nHit, Seq("q_id"), "left_outer")
          .select($"q_id", $"n_exact",
            coalesce($"n_ann", lit(0L)).as("n_ann"),
            coalesce($"n_hit", lit(0L)).as("n_hit"))
          .orderBy($"q_id")
          // materialize the per-query recall counters (10 rows), then
          // release the corpus cache both arms read
          .localCheckpoint()
        e.unpersist(blocking = false)
        out
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |b AS (
              |  SELECT vec_id, v,
              |    CAST(list_sum(list_transform(range(0, 8), p ->
              |      CASE WHEN list_sum(list_transform(range(0, 64),
              |          i -> v[i + 1] * CAST((([${PipelineQueries.lshA.mkString(",")}]::BIGINT[])[p + 1] * (i + 1)
              |                              + ([${PipelineQueries.lshB.mkString(",")}]::BIGINT[])[p + 1]) % 1009 - 504 AS DOUBLE))) > 0
              |           THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS bucket
              |  FROM e),
              |n AS (SELECT vec_id, v, bucket, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM b),
              |ex AS (
              |  SELECT q_id, c_id FROM (
              |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              |        ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) DESC,
              |        c.vec_id) AS rnk
              |    FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id) t
              |  WHERE rnk <= 3),
              |an AS (
              |  SELECT q_id, c_id FROM (
              |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              |        ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 4) DESC,
              |        c.vec_id) AS rnk
              |    FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id) t
              |  WHERE rnk <= 3)
              |SELECT ex.q_id, COUNT(*) AS n_exact,
              |  COALESCE(MAX(a.n_ann), 0) AS n_ann,
              |  CAST(SUM(CASE WHEN an.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
              |FROM ex
              |LEFT JOIN an ON an.q_id = ex.q_id AND an.c_id = ex.c_id
              |LEFT JOIN (SELECT q_id, COUNT(*) AS n_ann FROM an GROUP BY q_id) a ON a.q_id = ex.q_id
              |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin)
    ),

    "q_corpus_profile" -> QueryDef(
      // Per-source corpus profiling — the dataset-card numbers every corpus
      // release publishes (docs, chars, tokens, languages, vocabulary per
      // domain). Two bounded-key aggregations: the scalar stats partial-
      // aggregate map-side; the vocabulary needs one (source, token)
      // distinct shuffle — cardinality-bounded by true vocab size, not
      // corpus size. Integer-only output, so the hash compare is exact.
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
        val base = docs.groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          countDistinct($"lang").as("n_langs"),
          sum(size(split($"text", " ")).cast("long")).as("total_tokens"))
        val vocab = docs
          .select($"source", explode(array_distinct(split($"text", " "))).as("tok"))
          .groupBy($"source").agg(countDistinct($"tok").as("vocab"))
        base.join(vocab, Seq("source")).orderBy($"source")
      },
      Some("""WITH base AS (
             |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |    COUNT(DISTINCT lang) AS n_langs,
             |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
             |  FROM documents GROUP BY source),
             |v AS (
             |  SELECT source, COUNT(DISTINCT tok) AS vocab FROM (
             |    SELECT source, unnest(list_distinct(string_split(text, ' '))) AS tok
             |    FROM documents) t
             |  GROUP BY source)
             |SELECT base.source, n_docs, total_chars, n_langs, total_tokens, vocab
             |FROM base JOIN v USING (source) ORDER BY source""".stripMargin)
    ),

    "q_dedup_substring" -> QueryDef(
      // Exact substring-level dedup (the Lee et al. 2021 "Deduplicating
      // Training Data" shape): any 20-token window appearing in ≥2 distinct
      // docs marks a substring-level duplication — catches boilerplate and
      // quotation overlap that document-level fingerprints miss (two docs
      // can share a 20-token run while their word SETS differ enough to
      // dodge MinHash). Windows fingerprint via codegen'd xxhash64 DIRECTLY
      // over the token-array slice — no per-window string rebuild, an
      // 8-byte shuffle key (array_distinct keeps within-doc repetition from
      // inflating counts). The dup test is a count-over-wfp WINDOW, not a
      // self-join back onto the window table: one exchange on the
      // fingerprint serves both the count and the flag (the join
      // formulation planned a BroadcastHashJoin over the full EXPLODED
      // window side at sf1 — post-explode cardinality is invisible to
      // plan-time stats, and shipping 1.75M rows as a broadcast benched
      // 19 s; the window form is 3.8 s, and at 100 TB it degrades
      // gracefully into exactly the shuffle the aggregate already pays).
      // The fingerprint never reaches the output (only equality-class
      // COUNTS do), so the oracle is free to group windows by md5 instead —
      // identical counts as long as neither hash collides (64-bit birthday
      // at sf1's 1.75M windows ≈ 1e-7; a 100 TB corpus would move to a
      // 128-bit fingerprint, e.g. two seeded xxhash64 words, same plan).
      // The fingerprint itself is the fused WindowHash64 kernel: each
      // token xxhash64'd ONCE and windows combined by 64-bit polynomial —
      // the HOF form re-hashed every token per covering window through a
      // fresh slice (O(n·20) string hashing, measured 2.5x the kernel).
      // Integer-only output, hash-exact across engines.
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 20)
          .select($"doc_id", explode(
            graft.functions.WindowHash64.windowHashes(s, $"tok", 20)).as("wfp"))
          // (doc_id, wfp) is distinct by construction → count counts docs
          .withColumn("nd", count(lit(1)).over(Window.partitionBy($"wfp")))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_windows"),
            sum(when($"nd" >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
          .withColumn("dup_flag", $"n_dup_windows" > 0)
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |w AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(tok)-19),
             |    i -> md5(array_to_string(tok[i+1:i+20], ' '))))) AS wfp
             |  FROM t WHERE len(tok) >= 20),
             |c AS (SELECT wfp, COUNT(*) AS nd FROM w GROUP BY wfp)
             |SELECT doc_id, COUNT(*) AS n_windows,
             |  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
             |  SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) > 0 AS dup_flag
             |FROM w JOIN c USING (wfp)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    "q_text_novelty" -> QueryDef(
      // Reference-corpus n-gram novelty scoring — the count-based skeleton
      // of KenLM-style quality filtering (CCNet/Gopher): build bigram
      // frequencies from the held-out reference split (doc_id % 31 = 0,
      // the same split decontamination treats as the benchmark), then
      // score every corpus doc by how familiar its bigrams are. The output
      // is the exact integer sufficient statistics (total bigrams, unseen
      // bigrams, summed reference frequency) — a downstream filter divides
      // and thresholds however it likes; keeping floats out of the result
      // makes the cross-engine hash exact. Scale shape: the reference
      // table is vocabulary-bounded (bigram TYPES, not tokens) and the
      // score is one equi-join on the bigram key + a per-doc partial
      // aggregate — corpus text never shuffles, only (doc_id, bg) pairs.
      (s, d) => {
        import s.implicits._
        val big = documents(s, d)
          .select($"doc_id", split($"text", " ").as("tok"))
          .filter(size($"tok") >= 2)
          // fused occurrence-level bigram assembly (element-identical to
          // the transform/concat_ws HOF — Round11OpsSpec)
          .select($"doc_id",
            explode(graft.functions.GramsJoin.gramsJoin(s, $"tok", 2)).as("bg"))
        val ref = big.filter(pmod($"doc_id", lit(31)) === 0)
          .groupBy($"bg").agg(count(lit(1)).as("ref_freq"))
        big.filter(pmod($"doc_id", lit(31)) =!= 0)
          .join(ref, Seq("bg"), "left_outer")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when($"ref_freq".isNull, 1L).otherwise(0L)).as("n_unseen"),
            sum(coalesce($"ref_freq", lit(0L))).as("ref_freq_sum"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
             |b AS (
             |  SELECT doc_id, unnest(list_transform(range(0, len(tok)-1),
             |    i -> tok[i+1] || ' ' || tok[i+2])) AS bg
             |  FROM t WHERE len(tok) >= 2),
             |r AS (SELECT bg, COUNT(*) AS ref_freq FROM b WHERE doc_id % 31 = 0 GROUP BY bg)
             |SELECT doc_id, COUNT(*) AS n_bigrams,
             |  CAST(SUM(CASE WHEN ref_freq IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
             |  CAST(SUM(COALESCE(ref_freq, 0)) AS BIGINT) AS ref_freq_sum
             |FROM b LEFT JOIN r USING (bg)
             |WHERE doc_id % 31 != 0
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    "q_source_overlap" -> QueryDef(
      // Cross-source duplication matrix — the provenance audit a dataset
      // card publishes: for every source pair, how many word-set
      // fingerprints (q_dedup_fuzzy's order/multiplicity-insensitive key)
      // appear in BOTH sources, and how many docs each side contributes to
      // the overlap. The self-join key is the fingerprint, whose per-key
      // fan-out is bounded by the number of SOURCES (a handful), never by
      // corpus size — so unlike a doc-level pair join this stays a
      // data-proportional shuffle at 100 TB with a #sources²-bounded
      // output. Integer-only result, hash-exact.
      (s, d) => {
        import s.implicits._
        val fpSrc = documents(s, d)
          .select(md5(array_join(array_sort(array_distinct(split($"text", " "))), " ")).as("fp"),
            $"source")
          .groupBy($"fp", $"source").agg(count(lit(1)).as("n_docs"))
        fpSrc.as("a").join(fpSrc.as("b"),
            col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared_fps"),
            sum(col("a.n_docs")).as("n_docs_a"),
            sum(col("b.n_docs")).as("n_docs_b"))
          .orderBy($"source_a", $"source_b")
      },
      Some("""WITH fs AS (
             |  SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             |    source, COUNT(*) AS n_docs
             |  FROM documents GROUP BY 1, 2)
             |SELECT a.source AS source_a, b.source AS source_b,
             |  COUNT(*) AS n_shared_fps,
             |  CAST(SUM(a.n_docs) AS BIGINT) AS n_docs_a,
             |  CAST(SUM(b.n_docs) AS BIGINT) AS n_docs_b
             |FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    "q_split_assign" -> QueryDef(
      // Deterministic train/val/test split assignment + stratification
      // audit: each doc hashes to a bucket in [0,100) via md5(doc_id) —
      // content-independent, so re-running over a grown corpus never
      // reassigns an existing doc (the property that keeps eval sets
      // frozen across releases) — with buckets 0 → val, 1 → test,
      // rest → train (~98/1/1). Output is the per-(source, split) audit
      // table a release publishes: map-only assignment, one bounded-key
      // aggregate, integer-only columns.
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .withColumn("bucket",
            conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
              .cast("long") % 100)
          .withColumn("split",
            when($"bucket" === 0, lit("val"))
              .when($"bucket" === 1, lit("test"))
              .otherwise(lit("train")))
          .groupBy($"source", $"split")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split($"text", " ")).cast("long")).as("n_tokens"),
            min($"doc_id").as("first_doc"))
          .orderBy($"source", $"split")
      },
      Some("""WITH a AS (
             |  SELECT source,
             |    CASE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
             |      WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END AS split,
             |    doc_id, len(string_split(text, ' ')) AS n_tok
             |  FROM documents)
             |SELECT source, split, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens, MIN(doc_id) AS first_doc
             |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    "q_corpus_curate" -> QueryDef(
      // The composed END-TO-END curation funnel — quality gate → exact
      // dedup → near-dup collapse → decontamination → split assignment —
      // as ONE query emitting the per-stage survivor audit every corpus
      // release publishes (the table that answers "where did my documents
      // go?"). Each stage reuses its standalone operator's EXACT semantics
      // (q_quality_gopher's four integer rules, q_dedup_exact's md5 key,
      // q_dedup_fuzzy's word-set fingerprint, q_decontaminate's benchmark
      // 5-gram needles, q_split_assign's md5 bucket), so the funnel is the
      // composition a user would actually run, not a new definition.
      // Scale shape: stage flags compute map-side in one pass; the two
      // dedup keep-first decisions are window-mins over the fingerprint
      // partitions (the same two shuffles the standalone dedups pay — no
      // per-stage recount/rescan); decontamination is the broadcast-needle
      // probe restricted to survivors; the funnel numbers come from ONE
      // single-row aggregate exploded into stage rows (no driver collect).
      // Integer-only output.
      (s, d) => {
        import s.implicits._
        val base = documents(s, d)
          .select($"doc_id", $"text", split($"text", " ").as("tok"))
          .withColumn("n_tokens", size($"tok").cast("long"))
          // fused gate kernels (value-identical to the HOF chains —
          // Round11OpsSpec; max_run_sorted sorts internally, so no st col)
          .withColumn("sum_len", graft.functions.GopherKernels.tokCharSum(s, $"tok"))
          .withColumn("top_cnt", graft.functions.GopherKernels.maxRunSorted(s, $"tok"))
          .withColumn("n_stop", graft.functions.GopherKernels.stopwordHits(s, $"tok"))
          .withColumn("q_ok",
            $"n_tokens".between(40L, 100000L) &&
              $"sum_len" >= $"n_tokens" * 3L && $"sum_len" <= $"n_tokens" * 10L &&
              $"top_cnt" * 5L <= $"n_tokens" &&
              $"n_stop" >= 2)
          .withColumn("fp_exact", md5(lower(trim($"text"))))
          .withColumn("fp_fuzzy", md5(array_join(array_sort(array_distinct($"tok")), " ")))
        val kept = base
          .withColumn("keep_exact", $"q_ok" &&
            $"doc_id" === min(when($"q_ok", $"doc_id")).over(Window.partitionBy($"fp_exact")))
          .withColumn("keep_fuzzy", $"keep_exact" &&
            $"doc_id" === min(when($"keep_exact", $"doc_id")).over(Window.partitionBy($"fp_fuzzy")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val needles = grams5(documents(s, d).filter(pmod($"doc_id", lit(31)) === 0))
          .select($"doc_id".as("bench_id"), $"g")
        val contaminated = grams5(kept.filter($"keep_fuzzy").select($"doc_id", $"text"))
          .join(broadcast(needles), Seq("g"))
          .filter($"doc_id" =!= $"bench_id")
          .select($"doc_id").distinct()
          .withColumn("contam", lit(1))
        val stats = kept
          .join(contaminated, Seq("doc_id"), "left_outer")
          .withColumn("keep_clean", $"keep_fuzzy" && $"contam".isNull)
          .withColumn("bucket",
            conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long") % 100)
          .agg(
            count(lit(1)).as("n0"),
            sum(when($"q_ok", 1L).otherwise(0L)).as("n1"),
            sum(when($"keep_exact", 1L).otherwise(0L)).as("n2"),
            sum(when($"keep_fuzzy", 1L).otherwise(0L)).as("n3"),
            sum(when($"keep_clean", 1L).otherwise(0L)).as("n4"),
            sum(when($"keep_clean" && $"bucket" === 0, 1L).otherwise(0L)).as("nval"),
            sum(when($"keep_clean" && $"bucket" === 1, 1L).otherwise(0L)).as("ntest"),
            sum(when($"keep_clean" && $"bucket" >= 2, 1L).otherwise(0L)).as("ntrain"))
        val out = stats.select(explode(array(
            struct(lit(1L).as("stage_id"), lit("corpus").as("stage"), $"n0".as("n_in"), $"n0".as("n_out")),
            struct(lit(2L).as("stage_id"), lit("quality_gate").as("stage"), $"n0".as("n_in"), $"n1".as("n_out")),
            struct(lit(3L).as("stage_id"), lit("exact_dedup").as("stage"), $"n1".as("n_in"), $"n2".as("n_out")),
            struct(lit(4L).as("stage_id"), lit("neardup_collapse").as("stage"), $"n2".as("n_in"), $"n3".as("n_out")),
            struct(lit(5L).as("stage_id"), lit("decontaminate").as("stage"), $"n3".as("n_in"), $"n4".as("n_out")),
            struct(lit(6L).as("stage_id"), lit("split_train").as("stage"), $"n4".as("n_in"), $"ntrain".as("n_out")),
            struct(lit(7L).as("stage_id"), lit("split_val").as("stage"), $"n4".as("n_in"), $"nval".as("n_out")),
            struct(lit(8L).as("stage_id"), lit("split_test").as("stage"), $"n4".as("n_in"), $"ntest".as("n_out"))
          )).as("r"))
          .select($"r.stage_id", $"r.stage", $"r.n_in", $"r.n_out")
          .orderBy($"stage_id")
          // 8 stage rows: materialize, then release the funnel cache —
          // a session-lifetime leak otherwise (ADVICE r10)
          .localCheckpoint()
        kept.unpersist(blocking = false)
        out
      },
      Some("""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tok FROM documents),
             |r AS (
             |  SELECT doc_id, text, tok,
             |    CAST(len(tok) AS BIGINT) AS n_tokens,
             |    CAST(list_sum(list_transform(tok, x -> len(x))) AS BIGINT) AS sum_len,
             |    CAST(list_max(list_transform(list_distinct(tok), w -> len(list_filter(tok, x -> x = w)))) AS BIGINT) AS top_cnt,
             |    len(list_filter(['the','a','of','and','to','in'], w -> list_contains(tok, w))) AS n_stop,
             |    md5(lower(trim(text))) AS fp_exact,
             |    md5(array_to_string(list_sort(list_distinct(tok)), ' ')) AS fp_fuzzy
             |  FROM t),
             |q AS (
             |  SELECT *, (n_tokens BETWEEN 40 AND 100000)
             |    AND sum_len >= n_tokens * 3 AND sum_len <= n_tokens * 10
             |    AND top_cnt * 5 <= n_tokens AND n_stop >= 2 AS q_ok
             |  FROM r),
             |e AS (
             |  SELECT *, q_ok AND doc_id = MIN(CASE WHEN q_ok THEN doc_id END)
             |    OVER (PARTITION BY fp_exact) AS keep_exact
             |  FROM q),
             |f AS (
             |  SELECT *, keep_exact AND doc_id = MIN(CASE WHEN keep_exact THEN doc_id END)
             |    OVER (PARTITION BY fp_fuzzy) AS keep_fuzzy
             |  FROM e),
             |g AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(tok)-4),
             |    i -> array_to_string(tok[i+1:i+5], ' ')))) AS g
             |  FROM t WHERE len(tok) >= 5),
             |needles AS (SELECT doc_id AS bench_id, g FROM g WHERE doc_id % 31 = 0),
             |contam AS (
             |  SELECT DISTINCT c.doc_id FROM g c JOIN needles n USING (g)
             |  WHERE c.doc_id != n.bench_id
             |    AND c.doc_id IN (SELECT doc_id FROM f WHERE keep_fuzzy)),
             |fin AS (
             |  SELECT f.q_ok, f.keep_exact, f.keep_fuzzy,
             |    f.keep_fuzzy AND contam.doc_id IS NULL AS keep_clean,
             |    ('0x' || substring(md5(CAST(f.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
             |  FROM f LEFT JOIN contam ON contam.doc_id = f.doc_id),
             |s AS (
             |  SELECT COUNT(*) AS n0,
             |    CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(SUM(CASE WHEN keep_exact THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(SUM(CASE WHEN keep_fuzzy THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             |    CAST(SUM(CASE WHEN keep_clean THEN 1 ELSE 0 END) AS BIGINT) AS n4,
             |    CAST(SUM(CASE WHEN keep_clean AND bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nval,
             |    CAST(SUM(CASE WHEN keep_clean AND bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ntest,
             |    CAST(SUM(CASE WHEN keep_clean AND bucket >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS ntrain
             |  FROM fin)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS stage_id, 'corpus' AS stage, n0 AS n_in, n0 AS n_out FROM s
             |  UNION ALL SELECT 2, 'quality_gate', n0, n1 FROM s
             |  UNION ALL SELECT 3, 'exact_dedup', n1, n2 FROM s
             |  UNION ALL SELECT 4, 'neardup_collapse', n2, n3 FROM s
             |  UNION ALL SELECT 5, 'decontaminate', n3, n4 FROM s
             |  UNION ALL SELECT 6, 'split_train', n4, ntrain FROM s
             |  UNION ALL SELECT 7, 'split_val', n4, nval FROM s
             |  UNION ALL SELECT 8, 'split_test', n4, ntest FROM s) u
             |ORDER BY stage_id""".stripMargin)
    ),

    "q_mix_weights" -> QueryDef(
      // Data-mixture reweighting — the per-domain sampling weights a
      // training run derives before drawing batches (the uniform-target
      // initialization DoReMi and "balanced mixture" ablations start
      // from): actual token share per source vs the uniform target,
      // weight = target/actual, epochs = ceil(weight) (how many passes of
      // an undersized domain the sampler needs), oversample flag for
      // sources that would repeat. Every ratio is EXACT integer division
      // in ppm — no float ever enters the result, so the hash compare is
      // exact by construction. Scale shape: one bounded-key (#sources)
      // partial aggregate; the one-row totals collect to the driver and
      // bake into the final projection as literals (the tf-idf scalar
      // pattern) — the corpus never shuffles and nothing joins. At 100 TB
      // the 1e6 * total_tokens product
      // approaches int64 range (~2e13 tokens × 1e6), so the production
      // variant lifts the three products to DECIMAL(38,0) — same plan,
      // same exact-integer semantics.
      (s, d) => {
        import s.implicits._
        val perSrc = documents(s, d)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
        // the totals are ONE row of exact longs — collect and bake as plan
        // literals (the suite's tf-idf corpus-count pattern) instead of
        // joining: the final pass stays a pure bounded-key aggregate with
        // no join of any shape. The #sources-row aggregate is materialized
        // once (localCheckpoint, not persist) so the totals pass and the
        // returned projection share it with no cache residue.
        val perSrcM = perSrc.localCheckpoint()
        val tot = perSrcM.agg(sum($"n_tokens"), count(lit(1))).head
        val totalTokens = tot.getLong(0)
        val nSources = tot.getLong(1)
        perSrcM
          .withColumn("share_ppm",
            expr(s"(1000000L * n_tokens) DIV ${totalTokens}L"))
          .withColumn("weight_ppm",
            expr(s"(1000000L * ${totalTokens}L) DIV (${nSources}L * n_tokens)"))
          .withColumn("epochs", expr("(weight_ppm + 999999L) DIV 1000000L"))
          .withColumn("oversample_flag", $"weight_ppm" > 1000000L)
          .select($"source", $"n_docs", $"n_tokens", $"share_ppm",
            $"weight_ppm", $"epochs", $"oversample_flag")
          .orderBy($"source")
      },
      Some("""WITH s AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY source),
             |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |  COUNT(*) AS n_sources FROM s),
             |w AS (
             |  SELECT source, n_docs, n_tokens,
             |    CAST((1000000 * n_tokens) // total_tokens AS BIGINT) AS share_ppm,
             |    CAST((1000000 * total_tokens) // (n_sources * n_tokens) AS BIGINT) AS weight_ppm
             |  FROM s, t)
             |SELECT source, n_docs, n_tokens, share_ppm, weight_ppm,
             |  CAST((weight_ppm + 999999) // 1000000 AS BIGINT) AS epochs,
             |  weight_ppm > 1000000 AS oversample_flag
             |FROM w ORDER BY source""".stripMargin)
    ),

    "q_corpus_integrity" -> QueryDef(
      // Referential-integrity / embedding-coverage audit — the release gate
      // that catches a half-built vector index before anything downstream
      // trusts it (at sf≥0.1 the corpus genuinely has docs without
      // embeddings, so the check is live, not vacuous): per source, doc
      // count, distinct-id count (dup-key detection), docs with and
      // without a vector; vectors matching no document surface on a
      // synthetic '~orphan_vecs' row (binary-collation '~' sorts it last
      // in both engines). Scale shape: one equi-join on the id (the vector
      // side carries ONLY the 8-byte id) + a bounded-key (#sources)
      // aggregate; countDistinct shuffles keyed (source, doc_id) partials.
      // Integer-only output, hash-exact.
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d).select($"doc_id", $"source")
        val vecs = embeddings(s, d).select($"vec_id")
        val j = docs.join(vecs, docs("doc_id") === vecs("vec_id"), "full_outer")
        val perSrc = j.filter($"doc_id".isNotNull)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"doc_id").as("n_unique_ids"),
            sum(when($"vec_id".isNotNull, 1L).otherwise(0L)).as("n_with_vec"),
            sum(when($"vec_id".isNull, 1L).otherwise(0L)).as("n_without_vec"))
        val orphans = j.filter($"doc_id".isNull)
          .agg(count(lit(1)).as("n_docs"))
          .select(lit("~orphan_vecs").as("source"), $"n_docs",
            lit(0L).as("n_unique_ids"), lit(0L).as("n_with_vec"),
            lit(0L).as("n_without_vec"))
        perSrc.unionByName(orphans).orderBy($"source")
      },
      Some("""WITH j AS (
             |  SELECT d.doc_id, d.source, e.vec_id
             |  FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id),
             |p AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    COUNT(DISTINCT doc_id) AS n_unique_ids,
             |    CAST(SUM(CASE WHEN vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_vec,
             |    CAST(SUM(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_vec
             |  FROM j WHERE doc_id IS NOT NULL GROUP BY source),
             |o AS (
             |  SELECT '~orphan_vecs' AS source, COUNT(*) AS n_docs,
             |    CAST(0 AS BIGINT) AS n_unique_ids, CAST(0 AS BIGINT) AS n_with_vec,
             |    CAST(0 AS BIGINT) AS n_without_vec
             |  FROM j WHERE doc_id IS NULL)
             |SELECT * FROM p UNION ALL SELECT * FROM o ORDER BY source""".stripMargin)
    ),

    "q_label_cohesion" -> QueryDef(
      // Embedding-space label audit — the mislabel/outlier sweep a
      // labeled-data release runs (cleanlab-style, by nearest-centroid):
      // per-label centroid directions, then every vector's cosine to its
      // own centroid vs the best OTHER centroid; best-other ≥ own flags a
      // suspected mislabel. Determinism discipline: components quantize
      // to scaled integers via floor(x*1e6 + 0.5) (identical IEEE double
      // steps in both engines — no round() semantics in play), and the
      // centroid is the per-label integer SUM vector, exact and
      // order-independent with no division anywhere (cosine is scale-
      // invariant, so sum ≡ mean as a direction). The only floats are the
      // final cosines, computed by the same left-to-right fold as the
      // oracle and rounded to 4 dp like q_knn_graph. Scale shape: the
      // centroid aggregate is bounded by #labels × 64 dims and partial-
      // aggregates map-side; the collected centroids bake into the scoring
      // pass as plan literals (the IvfKMeans pattern), so scoring is pure
      // map — no join, no fan-out rows, the corpus never shuffles. At
      // 100 TB the int64 component sums hold to ~9e12 vectors per label
      // (|x| ≤ ~1 → ~1e6/component); beyond that, DECIMAL(38,0) partials.
      (s, d) => {
        import s.implicits._
        val eq = embeddings(s, d)
          .select($"vec_id", $"label",
            expr("transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000 + 0.5))")
              .as("vq"))
        // NOT persisted: the query makes exactly two map-only passes over
        // the source (centroid sums below, then the returned scoring pass)
        // — re-running the quantization projection is cheaper than holding
        // a corpus-sized quantized copy in the block manager, and at 100 TB
        // caching the whole corpus is infeasible anyway (the scan is the
        // cheap part; CacheHygieneSpec pins the no-residue contract).
        // centroid sums are bounded (#labels × 64 dims): collect, sort by
        // label, and bake as plan literals — the IvfKMeans centroid
        // pattern. Scoring then needs no join at all: one map-side pass
        // computes all #labels cosines per row and reduces own/best-other
        // inside the row.
        val centRows = eq
          .select($"label", posexplode($"vq").as(Seq("pos", "x")))
          .groupBy($"label", $"pos").agg(sum($"x").as("sx"))
          .groupBy($"label")
          .agg(expr("transform(array_sort(collect_list(struct(pos, sx))), p -> CAST(p.sx AS DOUBLE))")
            .as("cv"))
          .orderBy($"label")
          .collect()
        // Degenerate label sets have no engine/oracle-consistent answer:
        // with a single label (or a NULL label) the Spark fold would emit
        // sentinel rows (best_other_label = -1, best_other_sim4 = -2.0)
        // while the oracle's inner joins drop those rows entirely. Fail
        // loudly instead of silently diverging from the oracle.
        require(centRows.length >= 2 && centRows.forall(!_.isNullAt(0)),
          s"q_label_cohesion needs >= 2 distinct non-null labels " +
            s"(got ${centRows.length}${if (centRows.exists(_.isNullAt(0))) ", incl. NULL" else ""})")
        val centLit = array(centRows.map { r =>
          struct(lit(r.getInt(0)).as("l"),
            array(r.getSeq[Double](1).map(lit): _*).as("cv"))
        }: _*)
        // + 0.0 normalizes the -0.0 a tiny negative cosine rounds to in
        // IEEE engines (DuckDB) but not BigDecimal ones (Spark)
        val sims = transform(centLit, c =>
          struct(c.getField("l").as("l"),
            (round(graft.functions.CosineSimilarity.cosineSim(s,
              expr("transform(vq, x -> CAST(x AS DOUBLE))"), c.getField("cv")), 4) + lit(0.0))
              .as("s")))
        eq.withColumn("sims", sims)
          .withColumn("own_sim4", expr("filter(sims, x -> x.l = label)[0].s"))
          // strict > keeps the FIRST (lowest-label) entry on 4-dp ties —
          // the same tiebreak the window formulation would use
          .withColumn("best", expr(
            "aggregate(filter(sims, x -> x.l != label), " +
              "struct(CAST(-2.0 AS DOUBLE) AS s, -1 AS l), " +
              "(acc, x) -> IF(x.s > acc.s, struct(x.s AS s, x.l AS l), acc))"))
          .select($"vec_id", $"own_sim4",
            $"best.l".as("best_other_label"), $"best.s".as("best_other_sim4"))
          .withColumn("mislabel_flag", $"best_other_sim4" >= $"own_sim4")
          .orderBy($"vec_id")
      },
      Some("""WITH eq AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS vq
             |  FROM embeddings),
             |cs AS (
             |  SELECT label, i, CAST(SUM(vq[i]) AS BIGINT) AS sx
             |  FROM eq, range(1, 65) r(i) GROUP BY label, i),
             |cent AS (
             |  SELECT label AS c_label, list(CAST(sx AS DOUBLE) ORDER BY i) AS cv
             |  FROM cs GROUP BY label),
             |sc AS (
             |  SELECT e.vec_id, e.label, c.c_label,
             |    ROUND(list_sum(list_transform(range(1, 65), i -> CAST(e.vq[i] AS DOUBLE) * c.cv[i]))
             |      / (sqrt(list_sum(list_transform(e.vq, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |         sqrt(list_sum(list_transform(c.cv, x -> x * x)))), 4) + 0.0 AS sim4
             |  FROM eq e, cent c)
             |SELECT vec_id, o.sim4 AS own_sim4, b.c_label AS best_other_label,
             |  b.sim4 AS best_other_sim4, b.sim4 >= o.sim4 AS mislabel_flag
             |FROM (SELECT vec_id, sim4 FROM sc WHERE label = c_label) o
             |JOIN (
             |  SELECT vec_id, c_label, sim4 FROM (
             |    SELECT vec_id, c_label, sim4,
             |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim4 DESC, c_label) AS rnk
             |    FROM sc WHERE label <> c_label) t
             |  WHERE rnk = 1) b
             |USING (vec_id)
             |ORDER BY vec_id""".stripMargin)
    )
  )
}
