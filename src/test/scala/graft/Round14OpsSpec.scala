package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IvfKMeans

/** Round-14 closures, centered on the round-13 verdict's top item: the IVF
  * probe width is now a POLICY (nprobe = max(2, ⌈K/8⌉) — a fixed probed
  * fraction of the quantizer, the knee of the measured recall-vs-cost
  * curve), not a constant, and the forced key
  * `q_decontaminate_semantic_ivf_adaptive` runs the tier through it with a
  * DuckDB oracle that derives the SAME width from the trained centroid
  * table.
  */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf001 = "/root/testdata/sf0.01"

  test("adaptiveNprobe is max(2, ceil(K/8)) — the measured-curve policy") {
    assert(IvfKMeans.adaptiveNprobe(1) == 2)   // floor
    assert(IvfKMeans.adaptiveNprobe(2) == 2)
    assert(IvfKMeans.adaptiveNprobe(16) == 2)  // ceil(16/8) = 2 = floor
    assert(IvfKMeans.adaptiveNprobe(17) == 3)  // first K where policy > legacy
    assert(IvfKMeans.adaptiveNprobe(21) == 3)  // the adaptive key's sf0.01 K
    assert(IvfKMeans.adaptiveNprobe(40) == 5)  // sf16's stride-256 K
    assert(IvfKMeans.adaptiveNprobe(323) == 41) // sf4's worst-case K
    // exact ceil identity over a dense range (no off-by-one drift vs the
    // oracle's CEIL(COUNT(*)/8.0))
    for (k <- 1 to 2048)
      assert(IvfKMeans.adaptiveNprobe(k) == math.max(2, math.ceil(k / 8.0).toInt), s"k=$k")
  }

  test("probeCells policy overload is bit-identical to the constant overload at the resolved width") {
    import spark.implicits._
    // 20 deterministic 8-dim centroids → policy resolves to ceil(20/8) = 3
    val cents: Seq[(Long, Seq[Double])] = (0L until 20L).map { c =>
      (c * 7L, (0 until 8).map(i => math.sin(c * 8 + i + 1).abs + 0.01))
    }
    val np = IvfKMeans.adaptiveNprobe(cents.size)
    assert(np == 3)
    val vecs = (0 until 50).map { r =>
      (r.toLong, (0 until 8).map(i => math.cos(r * 8 + i + 1) + 1.1))
    }.toDF("id", "v0").select($"id", $"v0".cast("array<double>").as("v"))
    val got = vecs.select($"id",
        IvfKMeans.probeCells(spark, cents, $"v", IvfKMeans.adaptiveNprobe _).as("a"),
        IvfKMeans.probeCells(spark, cents, $"v", np).as("c"),
        IvfKMeans.probeCellsBc(spark, cents, $"v", IvfKMeans.adaptiveNprobe _).as("ab"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"literal path diverged on id ${r.getLong(0)}")
      assert(r.getSeq[Long](1) == r.getSeq[Long](3), s"bc path diverged on id ${r.getLong(0)}")
      assert(r.getSeq[Long](1).length == np)
    }
  }

  test("a suspect window FORCES the top-10 isolated re-measure (the r13 n_remeasured=0 gap)") {
    // the r13 official artifact's exact failure shape: three stalled
    // calibration draws pushed calib_sec to 25.4, the bar to 8.48 s — above
    // every query — so the flagged window shipped zero corrections
    val medians = (1 to 30).map(i => (f"q_$i%02d", i * 0.2)) // 0.2 .. 6.0 s
    val r13Bar = 25.4373 / 3.0
    assert(Bench.remeasureSet(medians, r13Bar, suspectWindow = false).isEmpty,
      "sanity: the old behavior — nothing above the inflated bar")
    val forced = Bench.remeasureSet(medians, r13Bar, suspectWindow = true)
    assert(forced.size == 10, "suspect window must re-measure the top 10 unconditionally")
    assert(forced.sorted == forced, "names come back sorted")
    assert(forced.toSet == (21 to 30).map(i => f"q_$i%02d").toSet,
      "and they are the 10 most expensive by suite median")
    // healthy window: the bar still gates, capped at 10
    val normal = Bench.remeasureSet(medians, bar = 5.0, suspectWindow = false)
    assert(normal.toSet == (26 to 30).map(i => f"q_$i%02d").toSet)
    val many = Bench.remeasureSet(medians, bar = 0.0, suspectWindow = false)
    assert(many.size == 10, "cap at 10 regardless of how many clear the bar")
  }

  test("calibration redraw keeps the steadiest sample set") {
    val stalled = Seq(1.78, 1.9, 2.1, 30.0, 169.70) // the r13 window shape
    val clean = Seq(1.47, 1.49, 1.51, 1.55, 1.60)
    val ok2 = Seq(1.30, 1.35, 1.44, 1.52, 1.71)
    assert(Bench.bestCalibration(Seq(stalled, clean, ok2)) == clean)
    assert(Bench.bestCalibration(Seq(stalled)) == stalled, "a lone suspect set still publishes")
    // degenerate zero-floor sets never win over a real one
    assert(Bench.bestCalibration(Seq(Seq(0.0, 5.0), ok2)) == ok2)
    assert(!Bench.isSuspectWindow(clean) && Bench.isSuspectWindow(stalled))
  }

  test("the adaptive forced key genuinely widens the probe at the oracle scale") {
    import spark.implicits._
    // the key's needle policy at sf0.01: every 3rd vector → 167 needles,
    // stride 8 → K = |vec_id % 24 == 0| = 21 → policy width 3 > legacy 2
    val en = graft.tables.Tables.embeddings(spark, sf001)
    val k = en.filter($"vec_id" % 24 === 0).count().toInt
    assert(k == 21, s"fixture drift: expected K=21 at sf0.01, got $k")
    assert(IvfKMeans.adaptiveNprobe(k) == 3)
    val adaptive = SparkEntry.queries("q_decontaminate_semantic_ivf_adaptive")(spark, sf001)
      .select($"vec_id", $"n_id", $"contam").collect()
    val pinned3 = graft.queries.PipelineQueries
      .semanticDecontamIvf(spark, sf001, (_: Int) => 3, 3L)
      .select($"vec_id", $"n_id", $"contam").collect()
    assert(adaptive.toSeq == pinned3.toSeq,
      "policy path must equal the constant path at the resolved width")
    // and the width MATTERS here — nprobe=2 on the same needle set finds a
    // different audit (the branch is exercised, not just compiled)
    val pinned2 = graft.queries.PipelineQueries
      .semanticDecontamIvf(spark, sf001, (_: Int) => 2, 3L)
      .select($"vec_id", $"n_id", $"contam").collect()
    assert(adaptive.toSeq != pinned2.toSeq,
      "widening 2→3 must change at least one audit row at K=21")
  }
}
