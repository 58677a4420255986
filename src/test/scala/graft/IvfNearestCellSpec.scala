package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IvfKMeans

class IvfNearestCellSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("fused ivf_nearest_cell matches the composed array_min(simStructs) form") {
    import spark.implicits._
    // deterministic pseudo-vectors, incl. ties by construction (vec 0 == vec 8
    // pattern) so the lowest-cid tiebreak is exercised
    val vecs = (0L until 64L).map { id =>
      (id, (0 until 16).map(i => ((id % 8) * 31 + i * 7 % 13).toDouble / 10.0))
    }
    val df = vecs.toDF("vec_id", "v")
    val cents: Seq[(Long, Seq[Double])] =
      vecs.filter(_._1 % 9 == 0).map { case (id, v) => (id, v) }
    val fused = df.withColumn("cell", IvfKMeans.assignCell(spark, cents, $"v"))
      .select($"vec_id", $"cell")
    val composed = df.withColumn("cell",
        array_min(IvfKMeans.simStructs(spark, cents, $"v")).getField("cid"))
      .select($"vec_id", $"cell")
    val f = fused.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == c)
    assert(f.size == 64)
  }

  test("ties break to the lowest centroid id") {
    import spark.implicits._
    val v = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    // two identical centroids — cos6 ties exactly; cid 3 < cid 7 must win
    val cents: Seq[(Long, Seq[Double])] = Seq((7L, Seq(2.0, 0.0)), (3L, Seq(2.0, 0.0)))
    val cell = v.withColumn("cell", IvfKMeans.assignCell(spark, cents, $"v"))
      .select($"cell").head.getLong(0)
    assert(cell == 3L)
  }
}
