package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BoundedTopK, TopKBuffer}

class BoundedTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("buffer keeps k best with score-desc id-asc total order") {
    val b = new TopKBuffer(3)
    Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (1.0, 1L), (7.0, 1L)).foreach {
      case (s, i) => b.insert(s, i)
    }
    assert(b.scores.toSeq == Seq(7.0, 7.0, 5.0))
    assert(b.ids.toSeq == Seq(1L, 2L, 3L)) // tie on 7.0 → lower id first; 5.0 tie → id 3 beats 10
  }

  test("merge equals inserting everything into one buffer") {
    val all = (1 to 50).map(i => ((i * 37 % 11).toDouble, i.toLong))
    val one = new TopKBuffer(5)
    all.foreach { case (s, i) => one.insert(s, i) }
    val (l, r) = all.splitAt(25)
    val a = new TopKBuffer(5); l.foreach { case (s, i) => a.insert(s, i) }
    val c = new TopKBuffer(5); r.foreach { case (s, i) => c.insert(s, i) }
    a.mergeFrom(c)
    assert(a.scores.toSeq == one.scores.toSeq && a.ids.toSeq == one.ids.toSeq)
  }

  test("groups smaller than k return all rows; SQL registration works") {
    BoundedTopK.register(spark)
    import spark.implicits._
    val df = Seq((1L, 9.0, 100L), (1L, 8.0, 101L), (2L, 1.0, 200L))
      .toDF("g", "score", "id")
    df.createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      "SELECT g, bounded_topk(score, id, 5) AS t FROM topk_in GROUP BY g ORDER BY g")
      .selectExpr("g", "size(t) AS n").as[(Long, Int)].collect().toSeq
    assert(rows == Seq((1L, 2), (2L, 1)))
  }

  test("distributed result equals the window formulation (forced many partitions)") {
    import spark.implicits._
    val o = graft.tables.Tables.orders(spark, "/root/testdata/sf0.001").repartition(13)
    val viaAgg = o.groupBy($"o_custkey")
      .agg(BoundedTopK.boundedTopK(spark, $"o_totalprice", $"o_orderkey", 3).as("t"))
      .select($"o_custkey", explode($"t").as("e"))
      .select($"o_custkey", $"e.id".as("o_orderkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = o.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }
}
