package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.expr
import graft.cdc.{CdcApply, CdcParser}
import graft.etl.ReferenceFixtures

/** Executes every declared query at sf0.001 (plan + execution smoke; the
  * value-level gate is the driver's DuckDB compare, exercised locally via
  * tools/selfcheck.py).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every query has an oracle or a documented reason not to") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q_agg_approx_distinct", "q_agg_approx_quantile",
        "q_agg_hll_merge", "q_heavy_hitters"),
      s"unexpected oracle-less: $noOracle")
  }

  test("hll sketch estimates (per-group and merged) land within 5% of exact") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_agg_hll_merge")(spark, sfDir)
      .select($"event_type", $"approx_users")
      .as[(String, Long)].collect().toMap
    val exactPer = graft.tables.Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = graft.tables.Tables.events(spark, sfDir)
      .select($"user_id").distinct().count()
    (exactPer + ("__all__" -> exactAll)).foreach { case (k, ex) =>
      val ap = rows(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("approx quantile sketch lands within 5% of the exact percentile") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_agg_approx_quantile")(spark, sfDir)
      .select($"l_returnflag", expr("array(p50, p90, p99)"))
      .as[(String, Seq[Double])].collect().toMap
    val exact = graft.tables.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    exact.foreach { case (flag, qs) =>
      qs.zip(rows(flag)).foreach { case (ex, ap) =>
        assert(math.abs(ap - ex) / ex < 0.05, s"$flag: approx $ap vs exact $ex")
      }
    }
  }

  test("q_dedup_clusters degrades to identity labels on a corpus with zero near-dup pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nopairs").toString
    // orthogonal unit vectors: every candidate pair scores cos = 0 < 0.45
    val rows = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(64)(j => if (j == i) 1.0f else 0.0f))
    }
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_dedup_clusters")(spark, dir).collect()
    assert(out.length == 8 && out.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("distributed CdcApply.run matches the local sequential fold") {
    import spark.implicits._
    val recs = CdcParser.parseLines(ReferenceFixtures.cdcLines)
    val dist = CdcApply.run(spark, spark.createDataset(recs)).collect()
      .sortBy(o => (o.kind, o.schema, o.table, o.pk)).toSeq
    val local = CdcApply.runLocal(recs)
    assert(dist == local)
  }
}
