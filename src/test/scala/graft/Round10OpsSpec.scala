package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 depth checks:
  *  - SemDeDup path parity: the centroid-table broadcast-join branch
  *    (q_semdedup_table / IvfKMeans.trainTable+assignCellsJoin) must be
  *    bit-identical to the plan-literal branch (q_semdedup /
  *    IvfKMeans.train+assignCell) on a corpus with planted near-dups —
  *    this is the equivalence the shared DuckDB oracle relies on, proven
  *    here engine-side on data where cells and dup pairs are non-trivial.
  */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Deterministic 64-dim corpus with planted near-dup pairs: every 10th
    * vector is followed by a slightly-perturbed copy, the rest decorrelate.
    * n = 2048 → K = ceil(n/256) = 8 cells, so both branches exercise real
    * multi-cell assignment and non-empty within-cell dup pairs.
    */
  private def embeddingsDir(n: Int): String = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val base =
        if (i % 10 == 1) Array.tabulate(64)(j => (math.sin((i - 1) * 64 + j) + (if (j == 0) 0.001 else 0.0)).toFloat)
        else Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat)
      (i.toLong, base, i % 3)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_r10emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q_semdedup_table (centroid-table join path) is bit-identical to q_semdedup (plan-literal path)") {
    val dir = embeddingsDir(2048)
    val literal = SparkEntry.queries("q_semdedup")(spark, dir).collect().toSeq
    val table = SparkEntry.queries("q_semdedup_table")(spark, dir).collect().toSeq
    assert(literal == table,
      s"paths diverged: literal=${literal.take(5)}.. table=${table.take(5)}..")
    // the corpus must make the comparison non-trivial: several cells and
    // planted near-dup pairs actually detected
    val cells = literal.size
    val dupPairs = literal.map(_.getLong(2)).sum
    assert(cells >= 4, s"expected >=4 populated cells, got $cells")
    assert(dupPairs > 0, s"expected planted near-dup pairs to be found")
  }

  test("IvfKMeans.trainTable reproduces IvfKMeans.train centroids exactly") {
    import spark.implicits._
    import graft.operators.IvfKMeans
    val dir = embeddingsDir(1024)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .persist()
    val seedsSeq = e.filter($"vec_id" % 97 === 0).orderBy($"vec_id").limit(4)
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    val litCents = IvfKMeans.train(spark, e, seedsSeq, iters = 2)
      .map { case (cid, cv) => cid -> cv.toList }.toMap
    val seedsDf = e.filter($"vec_id" % 97 === 0).orderBy($"vec_id").limit(4)
      .select($"vec_id".as("cid"), $"v".as("cv"))
    val tabCents = IvfKMeans.trainTable(spark, e, seedsDf, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    e.unpersist(blocking = false)
    assert(litCents == tabCents)
  }
}
