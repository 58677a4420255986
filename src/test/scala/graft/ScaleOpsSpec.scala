package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps
import graft.tables.Tables

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the rows of the plain equi-join") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("o_orderkey"), $"l_extendedprice")
    val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice")
    val plain = li.join(o, Seq("o_orderkey"))
    val salted = ScaleOps.saltedJoin(li, o, "o_orderkey", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(!salted.columns.contains("__salt"))
  }

  test("saltedJoin spreads a pathological hot key across salts") {
    import spark.implicits._
    // 10k rows, all the same key — the classic straggler
    val hot = spark.range(10000).select(lit(1L).as("k"), $"id")
    val dim = Seq((1L, "x")).toDF("k", "v")
    val joined = ScaleOps.saltedJoin(hot, dim, "k", saltFactor = 8)
    assert(joined.count() == 10000)
    // the internal salt spread the hot key over >1 partition-key values
    val salts = hot.withColumn("__salt",
      pmod(hash(struct(hot.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .select(countDistinct($"__salt")).head().getLong(0)
    assert(salts > 4, s"expected hot key spread across salts, got $salts")
  }

  test("bucketed tables join without any shuffle exchange") {
    import spark.implicits._
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleOps.writeBucketed(
        Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey", $"o_totalprice"),
        "b_orders", "o_orderkey", buckets = 8)
      ScaleOps.writeBucketed(
        Tables.lineitem(spark, sfDir)
          .select($"l_orderkey".as("o_orderkey"), $"l_extendedprice"),
        "b_lineitem", "o_orderkey", buckets = 8)
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"), Seq("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
