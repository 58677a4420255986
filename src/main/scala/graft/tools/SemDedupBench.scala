package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Decomposition tool for q_semdedup's scale behavior: times each stage of
  * the SemDeDup pipeline separately (persist+count, seed collect, Lloyd
  * training, map-side assignment, within-cell pair generation) so the
  * super-linear term — assignment is O(n·K·d) with K = ⌈n/256⌉, i.e.
  * quadratic-in-n by design until the K cap — is attributed with data
  * instead of guessed. Not shipped behavior.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.SemDedupBench"
  */
object SemDedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.IvfKMeans

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)

    def run(): Map[String, Double] = {
      val e = embeddings(spark, sfDir)
        .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tCount, n) = time(e.count())
      val k = math.max(1L, math.ceil(n / 256.0).toLong)
      val (tSeeds, seeds) = time {
        e.filter($"vec_id" % 97 === 0).orderBy($"vec_id").limit(k.toInt)
          .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
      }
      val (tTrain, cents) = time(IvfKMeans.train(spark, e, seeds, iters = 2))
      val assigned = e
        .withColumn("cell", IvfKMeans.assignCell(spark, cents, $"v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tAssign, _) = time(assigned.count())
      val (tPairs, nPairs) = time {
        assigned.select($"cell", $"vec_id".as("id_a"), $"v".as("va"))
          .join(assigned.select($"cell", $"vec_id".as("id_b"), $"v".as("vb")), Seq("cell"))
          .filter($"id_a" < $"id_b")
          .filter(round(graft.functions.CosineSimilarity.cosineSim(spark, $"va", $"vb"), 4) >= 0.45)
          .count()
      }
      e.unpersist(blocking = true)
      assigned.unpersist(blocking = true)
      System.err.println(s"[semdedup] n=$n K=$k dup_pairs=$nPairs")
      Map("count" -> tCount, "seeds" -> tSeeds, "train" -> tTrain,
        "assign" -> tAssign, "pairs" -> tPairs)
    }

    run() // warmup: JIT + codegen
    val runs = Seq.fill(trials)(run())
    val stages = Seq("count", "seeds", "train", "assign", "pairs")
    val meds = stages.map(st => st -> med(runs.map(_(st))))
    meds.foreach { case (st, t) => println(f"[semdedup] $st%-7s ${t}%7.3f s") }
    println(f"[semdedup] total   ${meds.map(_._2).sum}%7.3f s  ($sfDir)")
    spark.stop()
  }
}
