package graft

import org.scalatest.funsuite.AnyFunSuite
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
    assert(noOracle == Set("q_agg_approx_distinct"), s"unexpected oracle-less: $noOracle")
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
