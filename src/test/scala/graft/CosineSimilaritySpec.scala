package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("codegen expression matches the higher-order-function fold bit-for-bit") {
    import spark.implicits._
    val e = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val pairs = e.select($"vec_id".as("a_id"), $"v".as("a"))
      .join(e.select($"vec_id".as("b_id"), $"v".as("b")),
        $"a_id" < $"b_id" && $"b_id" < 40)
    val checked = pairs
      .withColumn("fast", CosineSimilarity.cosineSim(spark, $"a", $"b"))
      .withColumn("slow",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)") /
          (expr("sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))") *
            expr("sqrt(aggregate(b, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))")))
    val diffs = checked.filter($"fast" =!= $"slow").count()
    assert(diffs == 0)
    assert(checked.count() > 100)
  }

  test("registered as a SQL function") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1, " +
        "cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c0").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("sql function handles float arrays via implicit cast") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), array(3.0D, 4.0D)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
