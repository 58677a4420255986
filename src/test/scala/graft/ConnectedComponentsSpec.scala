package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // Chain 1-2-3-4, triangle 10-11-12 (with a redundant edge), pair 20-21,
  // self-loop 30, duplicate edge 40-41.
  private def edges = {
    import spark.implicits._
    Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L),
      (30L, 30L),
      (40L, 41L), (41L, 40L)
    ).toDF("id_a", "id_b")
  }

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L,
    30L -> 30L,
    40L -> 40L, 41L -> 40L)

  test("driver union-find path labels every endpoint with its component min") {
    val got = ConnectedComponents.labels(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("distributed propagation path agrees with the driver path") {
    // threshold 0 forces the iterative scale path on the same graph
    val got = ConnectedComponents.labels(spark, edges, driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("driver and distributed paths agree on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 20
      val es = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val df = es.toDF("id_a", "id_b")
      val viaDriver = ConnectedComponents.labels(spark, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLoop = ConnectedComponents.labels(spark, df, driverEdgeThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == viaLoop, s"trial $trial: paths disagree")
      // canonical-label invariant: every label is a member of its own
      // component and is the minimum id in it
      val byLbl = viaDriver.groupBy(_._2).view.mapValues(_.keys.min)
      byLbl.foreach { case (lbl, minId) => assert(lbl == minId) }
    }
  }

  test("distributed Pregel path labels the REAL LSH pair graph identically to union-find") {
    // ConnectedComponentsSpec's random graphs prove path equivalence in the
    // abstract; this runs the distributed min-label propagation end-to-end
    // against the actual banded-LSH near-dup pair graph q_dedup_clusters
    // feeds it (driverEdgeThreshold = 0 forces the Pregel path the subcritical
    // fixture would otherwise never take).
    val sfDir = "/root/testdata/sf0.001"
    val pairs = graft.queries.PipelineQueries
      .embeddingDupPairs(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("id_a"),
        org.apache.spark.sql.functions.col("id_b"))
      .localCheckpoint()
    assert(pairs.count() > 0, "fixture LSH graph unexpectedly empty")
    val viaDriver = ConnectedComponents.labels(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPregel = ConnectedComponents.labels(spark, pairs, driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaPregel,
      s"paths disagree on the real pair graph (${pairs.count()} edges)")
    spark.catalog.clearCache()
  }

  test("zero edges yields an empty, correctly-typed label frame") {
    import spark.implicits._
    val out = ConnectedComponents.labels(
      spark, Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(out.columns.toSeq == Seq("id", "lbl"))
    assert(out.count() == 0)
  }
}
