package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The injected-function surface itself is exercised end-to-end in
  * ScenarioMain (fresh JVM → builder honors withExtensions; getOrCreate in
  * an existing-test JVM would silently reuse the plain session). Here:
  * injection registers without error, and the same builders are callable
  * through the temp-function registration path on the shared session.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("extension injection applies cleanly") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("same builders work via SQL on the shared session (temp registration)") {
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.LshFunctions.register(spark)
    graft.functions.BoundedTopK.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  hyperplane_sig(array(1.0D, 1.0D)) AS h,
        |  minhash_sig(array(5L, 9L))[0] AS m""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) >= 0L)
    assert(r.getLong(2) >= 0L)
    val agg = spark.sql(
      """SELECT g, size(bounded_topk(sc, id, 2)) FROM VALUES
        |  (1, 5.0D, 10L), (1, 6.0D, 11L), (1, 7.0D, 12L) AS t(g, sc, id)
        |GROUP BY g""".stripMargin).head()
    assert(agg.getInt(1) == 2)
  }
}
