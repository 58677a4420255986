package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the join shapes that keep 100 TB runs healthy when
  * AQE alone isn't enough.
  */
object ScaleOps {

  /** Skew-safe equi-join that salts ONLY the hot keys. A frequency pre-pass
    * over the large side (map-side partial count — shuffles one row per
    * distinct key, not per input row) finds keys with ≥ `hotKeyThreshold`
    * rows; that set is small by construction (≤ |large| / threshold) and is
    * broadcast. Hot large-side rows scatter across `saltFactor` salts (a
    * deterministic whole-row hash, so reruns partition identically); cold
    * rows keep salt 0. The small side replicates `saltFactor`× for hot keys
    * only and 1× for cold keys, so cold keys pay nothing — blanket salting
    * multiplies the whole small-side shuffle by `saltFactor` for no benefit
    * on unskewed keys (measured 8× wall-clock on unskewed sf0.1 lineitem).
    * One shuffle join on (key, salt); no union of separate hot/cold plans.
    *
    * At 100 TB the exact pre-pass costs one column-pruned pass over the
    * large side; swap in `large.sample(fraction, seed)` with a scaled
    * threshold when even that pass is too dear.
    *
    * Two probe modes:
    *  - `eagerProbe = true` (default): the pre-pass runs ONCE at
    *    construction and the hot set is collected (≤ |scanned| / threshold
    *    keys BY CONSTRUCTION — the same small-set bound that justified
    *    broadcasting it) and baked into the plan as a codegen'd `InSet`
    *    predicate; with no hot keys the result IS the plain join, so
    *    healthy data pays only the (sampled) pre-pass job and none of the
    *    salt machinery — measured ~4× cheaper than probing every row
    *    through a broadcast-null check + explode on unskewed sf0.1
    *    lineitem. Should the bound still yield an implausibly large set
    *    (beyond `MaxCollectedHotKeys`), the probes degrade to the deferred
    *    broadcast-join form instead of collecting.
    *  - `eagerProbe = false`: the pre-pass is PART OF the returned plan —
    *    the hot table feeds both sides through broadcast left-joins, so
    *    construction runs no job at all (explain dumps and plan tests are
    *    free, and the whole join is ONE execution with no driver sync
    *    point). The mode for plan-only consumers or when a construction-
    *    time job is unacceptable.
    *
    * Result is row-identical to `large.join(small, key)` in BOTH modes and
    * under BOTH degraded paths (overflow fallback, sample-missed hot key) —
    * the hot set only picks which keys scatter, never which rows match.
    * Verified by spec, including property tests of the degraded paths.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      hotKeyThreshold: Long = 100000L,
      sampleFraction: Double = 1.0,
      eagerProbe: Boolean = true,
      maxCollectedHotKeys: Int = MaxCollectedHotKeys,
      broadcastShortCircuit: Boolean = true
  ): DataFrame = {
    require(saltFactor > 0 && hotKeyThreshold > 0)
    require(sampleFraction > 0.0 && sampleFraction <= 1.0)
    require(maxCollectedHotKeys > 0)
    // Plan-time short-circuit, before ANY job: a broadcast-sized small side
    // makes skew structurally harmless — the build side ships whole to every
    // executor and the large side never shuffles, so a hot key is just
    // parallel input splits; salting such a join only adds cost. Size comes
    // from optimizer statistics (file sizes × column pruning) — free. If
    // stats underestimate and the join still lands on SMJ, AQE's runtime
    // skew-join split is the backstop. Pass `broadcastShortCircuit = false`
    // to force the probe machinery (tests; stats known to be unreliable).
    if (broadcastShortCircuit) {
      val thrStr = large.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      if (!thrStr.trim.startsWith("-")) {
        val thr = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thrStr)
        if (thr > 0 && small.queryExecution.optimizedPlan.stats.sizeInBytes <= thr)
          return large.join(small, Seq(key))
      }
    }
    // sampleFraction < 1 swaps the exact frequency pre-pass for a seeded
    // sample with a proportionally scaled threshold: hot-key DETECTION gets
    // 1/fraction cheaper while join correctness is unaffected (the hot set
    // only picks which keys scatter — any set yields identical rows).
    val (src, thr) =
      if (sampleFraction < 1.0)
        (large.sample(withReplacement = false, sampleFraction, seed = 42L),
          math.max(1L, math.ceil(hotKeyThreshold * sampleFraction).toLong))
      else (large, hotKeyThreshold)
    val hotDf = src.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= thr)
      .select(col(key))
    if (!eagerProbe)
      return saltedViaJoin(large, small, key, saltFactor,
        hotDf.withColumn("__hot", lit(true)))
    // The pre-pass SIZE decides all three outcomes, and counting is one
    // single-pass job — a limit(cap+1).collect() here would trip Spark's
    // incremental CollectLimit escalation (1→4→16→… partition attempts,
    // each a separate job) precisely in the empty-hot-set common case,
    // which must stay the cheap one. Persisting hotDf pins the count and
    // the (skew-only) collect to ONE execution of the frequency aggregate:
    // without it the collect would re-run the full groupBy over `large`,
    // and a source mutated between the two jobs could even change the set.
    hotDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nHot = hotDf.count()
      // No hot keys (the common case on healthy data): skip the salt
      // machinery entirely — the plain join is strictly cheaper than salting
      // with an empty hot set (which still costs a per-row probe, a hash and
      // an explode).
      if (nHot == 0) return large.join(small, Seq(key))
      if (nHot > maxCollectedHotKeys) {
        // Pathological hot-set size: probe via broadcast joins against the
        // distributed hot table (marker column) instead of collecting. The
        // finally-unpersist below only drops the CACHE — the returned plan
        // recomputes the (pathological-case) pre-pass inside its own
        // execution, exactly like the deferred mode.
        return saltedViaJoin(large, small, key, saltFactor,
          hotDf.withColumn("__hot", lit(true)))
      }
      // Known-bounded hot set: collect it (served from the persisted blocks,
      // not a re-scan) and bake it into the plan: both probes become
      // map-side codegen'd InSet lookups; the executed plan re-scans nothing.
      collectAndSalt(large, small, key, saltFactor, hotDf)
    } finally {
      hotDf.unpersist(blocking = false); ()
    }
  }

  /** Collected-probe body of the eager path (hot set known to fit the cap). */
  private def collectAndSalt(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      hotDf: DataFrame
  ): DataFrame = {
    val probe = hotDf.collect()
    val isHot = col(key).isInCollection(probe.map(_.get(0)).toSeq)
    val salted = large.withColumn("__salt",
      when(isHot,
        pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
        .otherwise(lit(0)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0),
        when(isHot, lit(saltFactor - 1)).otherwise(lit(0)))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Default hot-set cap, beyond which the probe falls back to the
    * distributed form: 2^20 keys ≈ 8–24 MB collected — comfortably a
    * broadcast-sized object, and reachable only when |scanned| ≥
    * threshold · 2^20. Overridable per-call to budget driver memory (and to
    * exercise the fallback at test scale).
    */
  val MaxCollectedHotKeys: Int = 1 << 20

  /** Deferred probe: left-join the hot-marker table into both sides
    * (broadcast-gated by AQE statistics). The two probes compile to one
    * reused broadcast exchange, so the pre-pass executes exactly once —
    * inside the join's own execution.
    */
  private def saltedViaJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      hot: DataFrame
  ): DataFrame = {
    val salted = large
      .join(broadcast(hot), Seq(key), "left_outer")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
          .otherwise(lit(0)))
      .drop("__hot")
    val replicated = small
      .join(broadcast(hot), Seq(key), "left_outer")
      .withColumn("__salt",
        explode(sequence(lit(0),
          when(col("__hot"), lit(saltFactor - 1)).otherwise(lit(0)))))
      .drop("__hot")
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Distributed global ranking — the scale-correct replacement for an
    * unpartitioned `row_number()` window (which moves EVERY row to one
    * partition): range-repartition on the sort key so each partition owns a
    * contiguous key range, rank locally with a partition-local window, and
    * add broadcast per-partition offsets. Both shuffles are distributed;
    * the only driver traffic is one count per partition. `order` must be a
    * total (tie-free) order for the rank to be deterministic.
    *
    * The ranged data is materialized ONCE (eager localCheckpoint) and both
    * the offset pre-pass and the returned plan read those blocks — range
    * boundary sampling is NOT stable across separate executions (measured:
    * re-executing the shuffle moved a boundary by ~60 rows and corrupted
    * ranks), so consistency must come from materialization, not
    * determinism. Callers should drop the blocks when done (the bench and
    * verify harnesses evict persistent RDDs between queries).
    */
  def withGlobalRank(
      df: DataFrame,
      rankCol: String,
      order: org.apache.spark.sql.Column*
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // explicit partition count: a user-specified repartition is exempt from
    // AQE coalescing, so the pre-pass and the final execution cannot end up
    // with different partition ids
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
    val withPid = ranged.withColumn("__pid", spark_partition_id()).localCheckpoint()
    val counts = withPid.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offEntries = counts.map(_._1).zip(offsets)
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    withPid
      .withColumn(rankCol,
        row_number().over(w).cast("long") +
          element_at(map(offEntries.toIndexedSeq: _*), col("__pid")))
      .drop("__pid")
  }

  /** Standard SQL NTILE bucket from an exact global rank: the first
    * n % k buckets carry ceil(n/k) rows, the rest floor(n/k) — identical
    * semantics to `ntile(k)` over a global window, in exact integer math.
    * Combined with [[withGlobalRank]] this is the distributed form of a
    * global ntile (no single-partition window at any size). Always returns
    * a LONG column regardless of branch.
    */
  def ntileFromRank(rank: org.apache.spark.sql.Column, n: Long, k: Long)
      : org.apache.spark.sql.Column = {
    require(n >= 0 && k > 0)
    val small = n / k; val big = n % k; val cut = big * (small + 1)
    if (small == 0) rank.cast("long") // n < k: one row per leading bucket
    else when(rank <= cut, exactDiv(rank + small, small + 1))
      .otherwise(lit(big) + exactDiv(rank - cut + small - 1, small))
  }

  /** Exact long integer division x div d for 0 ≤ x < 2^53: subtracting
    * `pmod` makes the numerator exactly divisible, so the IEEE quotient IS
    * the true integer (an exactly-representable double) — no truncation
    * hazard at any rank a LongType can realistically hold. Column `/` alone
    * is Divide (double) and would drift near 2^52.
    */
  private def exactDiv(x: org.apache.spark.sql.Column, d: Long)
      : org.apache.spark.sql.Column =
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")

  /** Global NTILE(k) bucket assignment for AGGREGATE consumers — the
    * boundary-broadcast alternative to [[withGlobalRank]] + [[ntileFromRank]]
    * when no per-row rank is needed: instead of materializing the whole
    * range-repartitioned table (localCheckpoint) to stabilize ranks, compute
    * ONLY the k−1 exact boundary tuples of the total order
    * (`valueCol` DESC, `tieCol` ASC) and bucket every row MAP-SIDE by
    * comparing against those broadcast literals. Nothing full-table ever
    * shuffles or materializes, at any input size.
    *
    * Pre-pass shape — one round BATCHED across all k−1 boundaries:
    *  1. one metadata-served `count`;
    *  2. one scan: GK quantile sketch (`percentile_approx`) probed at every
    *     boundary's target probability ±pad (pad covers the sketch's rank
    *     error bound plus 1-row quantization);
    *  3. one scan: exact below/equal counts for the ≤3(k−1) candidate
    *     values — each boundary either lands inside a candidate's tie
    *     group (resolved exactly) or is bracketed into a band of ≤ ~10⁻³·n
    *     rows;
    *  4. one TINY scan (union of band predicates, parquet-pushed) whose
    *     collected histogram resolves the banded boundaries. Bands beyond
    *     `collectCap` (n ≳ 10⁹·cap/2²⁰) fall back to per-boundary
    *     [[orderStatAsc]] narrowing — same machinery, iterated.
    *  5. only when a boundary SPLITS a tie group: one filtered mini-job
    *     resolves the boundary's tie-break id (absent for continuous data).
    *
    * The returned column is identical to
    * `ntile(k) OVER (ORDER BY valueCol DESC, tieCol ASC)` (spec-proven
    * against Spark's own ntile, ties included). `valueCol` must be non-null
    * numeric; `tieCol` a non-null integral column making the order total.
    */
  def withNtileBucket(
      df: DataFrame,
      bucketCol: String,
      valueCol: String,
      tieCol: String,
      k: Int,
      collectCap: Int = 1 << 20
  ): DataFrame = {
    require(k > 0 && collectCap > 0)
    if (k == 1) return df.withColumn(bucketCol, lit(1L))
    val n = df.count() // parquet sources answer this from footer metadata
    if (n == 0) return df.withColumn(bucketCol, lit(1L))
    // exact DESC boundary ranks: first n%k buckets hold n/k+1 rows
    val s = n / k; val b = n % k
    val ranks = (1 to (k - 1)).map { j =>
      if (j <= b) j * (s + 1) else b * (s + 1) + (j - b) * s
    }.distinct
    // ASC-world order statistics: DESC rank r ⇔ ASC rank n − r + 1
    val c = col(valueCol)
    val Acc = 10000
    val pad = math.max(4.0 / Acc, 2.0 / n)
    val aRanks = ranks.map(r => n - r + 1)
    val probs = aRanks.flatMap { a =>
      val p = a.toDouble / n
      Seq(math.max(0.0, p - pad), p, math.min(1.0, p + pad))
    }.distinct
    // Fail fast on null/NaN values — they are invisible to percentile_approx
    // and to every `<`/`===` probe below, so such rows would silently land in
    // bucket 1 while the boundary ranks (computed from the FULL count) drift
    // off the probe counts. The check rides the first real scan for free.
    val firstScan = df
      .agg(percentile_approx(c, array(probs.map(lit): _*), lit(Acc)).as("q"),
        sum(when(c.isNull || isnan(c.cast("double")), 1L).otherwise(0L)).as("__bad"))
      .head()
    val nBad = if (firstScan.isNullAt(1)) 0L else firstScan.getLong(1)
    require(nBad == 0L,
      s"withNtileBucket requires a non-null, non-NaN '$valueCol' " +
        s"(found $nBad offending rows of $n) — filter or impute them first")
    val cands = firstScan.getSeq[Any](0).distinct
    val cntCols = cands.flatMap(v => Seq(
      sum(when(c < lit(v), 1L).otherwise(0L)),
      sum(when(c === lit(v), 1L).otherwise(0L))))
    val crow = df.agg(cntCols.head, cntCols.tail: _*).head()
    val stats = cands.indices
      .map(i => (cands(i), crow.getLong(2 * i), crow.getLong(2 * i + 1)))
    // per boundary: bracketed by a candidate's tie group, or banded
    sealed trait Res
    case class Hit(v: Any, lt: Long, eq: Long) extends Res
    case class Band(lo: Any, hi: Any, before: Long, bandN: Long) extends Res
    val res: Seq[(Long, Long, Res)] = ranks.zip(aRanks).map { case (r, a) =>
      stats.find { case (_, lt, eq) => lt < a && a <= lt + eq } match {
        case Some((v, lt, eq)) => (r, a, Hit(v, lt, eq))
        case None =>
          val (lv, llt, leq) = stats
            .filter { case (_, lt, eq) => lt + eq < a }
            .maxBy { case (_, lt, eq) => lt + eq }
          val (uv, ult, _) = stats
            .filter { case (_, lt, _) => lt >= a }
            .minBy { case (_, lt, _) => lt }
          (r, a, Band(lv, uv, llt + leq, ult - llt - leq))
      }
    }
    // one shared tiny scan resolves all in-cap bands; oversized bands (only
    // reachable at n ≳ 10⁹·cap/2²⁰ rows) iterate per-boundary
    val banded = res.collect { case (r, a, b: Band) if b.bandN <= collectCap => (r, a, b) }
    val bandHist: Map[(Any, Any), Seq[(Any, Long)]] =
      if (banded.isEmpty) Map.empty
      else {
        val pred = banded.map { case (_, _, b) => c > lit(b.lo) && c < lit(b.hi) }
          .reduce(_ || _)
        // driver-side sort of the tiny histogram — an engine orderBy here
        // would add a range-partition exchange + stage for a few hundred rows
        val rows = df.filter(pred).groupBy(c.as("__v")).agg(count(lit(1)).as("__c"))
          .collect().map(r => (r.get(0), r.getLong(1))).toSeq
          .sortWith((a, b) => numLt(a._1, b._1))
        banded.map { case (_, _, b) =>
          (b.lo, b.hi) -> rows.filter { case (v, _) =>
            numLt(b.lo, v) && numLt(v, b.hi)
          }
        }.toMap
      }
    val bounds = res.map {
      case (r, _, Hit(v, lt, eq)) =>
        resolveTie(df, valueCol, tieCol, r, v, n - lt - eq, eq, collectCap)
      case (r, a, b: Band) if b.bandN <= collectCap =>
        val slice = bandHist((b.lo, b.hi))
        var cum = b.before; var i = 0; var found: Option[(Any, Long)] = None
        while (found.isEmpty && i < slice.length) {
          val (v, cnt) = slice(i)
          if (cum < a && a <= cum + cnt) found = Some((v, cnt))
          else { cum += cnt; i += 1 }
        }
        val (v, eq) = found.getOrElse(throw new IllegalStateException(
          s"boundary rank $a missing from its band (${b.lo}, ${b.hi})"))
        resolveTie(df, valueCol, tieCol, r, v, n - cum - eq, eq, collectCap)
      case (r, a, _) =>
        val (v, lt, eq) = orderStatAsc(df, c, a, n, collectCap)
        resolveTie(df, valueCol, tieCol, r, v, n - lt - eq, eq, collectCap)
    }
    // map-side bucket: 1 + number of boundaries this row sorts strictly
    // after in (value DESC, tie ASC) order — broadcast literal comparisons,
    // zero shuffle, zero materialization
    val afterCnt = bounds.map { case (v, tid) =>
      when(col(valueCol) < lit(v) ||
        (col(valueCol) === lit(v) && col(tieCol).cast("long") > lit(tid)), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    df.withColumn(bucketCol, lit(1L) + afterCnt)
  }

  /** Driver-side `<` over collected column values — both operands always
    * come from the same column, so only same-type numeric pairs occur.
    */
  private def numLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y) < 0
    case (x: java.lang.Double, y: java.lang.Double)         => x < y
    case (x: java.lang.Float, y: java.lang.Float)           => x < y
    case (x: java.lang.Number, y: java.lang.Number)         => x.longValue < y.longValue
    case _ => throw new IllegalArgumentException(
      s"non-numeric ntile boundary values: $a (${a.getClass}), $b (${b.getClass})")
  }

  /** Resolve a boundary's tie-break id: the boundary at DESC rank `r` has
    * value `v` whose tie group spans DESC ranks (gt, gt+eq]; position within
    * the group (ordered by tie id ASC) is m = r − gt. If the whole group
    * falls at-or-before the boundary (m = eq) the cut is value-only
    * (sentinel MaxValue, no job). Otherwise the m-th smallest id is selected
    * — collected directly when the group is small, else by the same
    * distributed narrowing (ids are unique, so it terminates).
    */
  private def resolveTie(
      df: DataFrame, valueCol: String, tieCol: String,
      r: Long, v: Any, gt: Long, eq: Long, cap: Int
  ): (Any, Long) = {
    val m = r - gt
    val tieId =
      if (m == eq) Long.MaxValue
      else {
        val tieDf = df.filter(col(valueCol) === lit(v))
        if (eq <= cap)
          tieDf.select(col(tieCol).cast("long")).collect()
            .map(_.getLong(0)).sorted.apply((m - 1).toInt)
        else
          orderStatAsc(tieDf, col(tieCol).cast("long"), m, eq, cap)
            ._1.asInstanceOf[Number].longValue()
      }
    (v, tieId)
  }

  /** Exact ASC order statistic with NO global sort, shuffle, or
    * materialization: returns (value at ASC rank `a`, #rows strictly below
    * it, its tie-group size) for column `c` over `df` (`nTotal` rows).
    *
    * Iterative narrowing: each round probes a GK quantile sketch
    * (`percentile_approx`, accuracy 10⁴) at the target's local probability
    * ±4ε — the pad covers the sketch's rank-error bound (ε = 1/accuracy)
    * plus ≤1-row quantization (the 2/bandN floor) — then takes ONE exact
    * count aggregate over the probed values. Either some probe's tie group
    * brackets the target rank (done), or the probes yield strict lower and
    * upper bounds whose gap is ≤ ~10ε of the band — the next round's band,
    * a parquet-pushdown-filtered scan. Once the band fits `cap`, a single
    * bounded histogram job finishes. ~1000× shrink per round: 100 TB
    * converges in 3 rounds of shrinking scans.
    */
  private[graft] def orderStatAsc(
      df: DataFrame, c: org.apache.spark.sql.Column, a: Long, nTotal: Long,
      cap: Int
  ): (Any, Long, Long) = {
    require(a >= 1 && a <= nTotal, s"rank $a outside [1, $nTotal]")
    val Acc = 10000
    var lo: Option[Any] = None // band bounds, both EXCLUSIVE
    var hi: Option[Any] = None
    var before = 0L            // #rows at-or-below lo (strictly before the band)
    var bandN = nTotal
    var iter = 0
    while (iter < 8) {
      iter += 1
      val pred = (lo.map(v => c > lit(v)) ++ hi.map(v => c < lit(v)))
        .reduceOption(_ && _).getOrElse(lit(true))
      val band = df.filter(pred)
      val aLoc = a - before
      if (bandN <= cap) {
        val hist = band.groupBy(c.as("__v")).agg(count(lit(1)).as("__c"))
          .collect().map(r => (r.get(0), r.getLong(1)))
          .sortWith((a, b) => numLt(a._1, b._1))
        var cum = 0L; var i = 0
        while (i < hist.length) {
          val cnt = hist(i)._2
          if (cum < aLoc && aLoc <= cum + cnt)
            return (hist(i)._1, before + cum, cnt)
          cum += cnt; i += 1
        }
        throw new IllegalStateException(
          s"order statistic walked off its band (a=$a before=$before bandN=$bandN cum=$cum)")
      }
      val p = aLoc.toDouble / bandN
      val pad = math.max(4.0 / Acc, 2.0 / bandN)
      val probs = Seq(math.max(0.0, p - pad), p, math.min(1.0, p + pad))
      val cands = band
        .agg(percentile_approx(c, array(probs.map(lit): _*), lit(Acc)).as("q"))
        .head().getSeq[Any](0).distinct
      val cntCols = cands.flatMap(v => Seq(
        sum(when(c < lit(v), 1L).otherwise(0L)),
        sum(when(c === lit(v), 1L).otherwise(0L))))
      val row = band.agg(cntCols.head, cntCols.tail: _*).head()
      val stats = cands.indices
        .map(i => (cands(i), row.getLong(2 * i), row.getLong(2 * i + 1)))
      stats.find { case (_, ltv, eqv) => ltv < aLoc && aLoc <= ltv + eqv } match {
        case Some((v, ltv, eqv)) => return (v, before + ltv, eqv)
        case None =>
          val lower = stats.filter { case (_, ltv, eqv) => ltv + eqv < aLoc }
            .maxByOption { case (_, ltv, eqv) => ltv + eqv }
          val upper = stats.filter { case (_, ltv, _) => ltv >= aLoc }
            .minByOption { case (_, ltv, _) => ltv }
          (lower, upper) match {
            case (Some((lv, llt, leq)), Some((uv, ult, _))) =>
              lo = Some(lv); hi = Some(uv)
              before += llt + leq
              bandN = ult - llt - leq
            case _ => throw new IllegalStateException(
              s"sketch probes failed to bound rank $aLoc in a band of $bandN rows " +
                s"(stats=$stats) — percentile_approx error bound violated")
          }
      }
    }
    throw new IllegalStateException(
      "order-statistic narrowing did not converge in 8 rounds")
  }

  /** Persist a DataFrame as a bucketed+sorted table: equal-bucketed tables
    * joined on the bucket key need no Exchange at all — the join is
    * co-located by layout, the 100 TB answer to repeated fact⋈fact joins on
    * the same key.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int,
      path: Option[String] = None
  ): Unit = {
    // Overwrite alone leaves a stale catalog entry pointing at the old
    // layout when an external path is supplied — drop first for idempotency.
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $tableName")
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }
}
