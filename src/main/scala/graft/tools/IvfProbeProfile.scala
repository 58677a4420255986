package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the IVF decontamination tier's cell distribution — the
  * per-cell corpus/needle occupancy that decides whether the shuffle-hash
  * cell join parallelizes or serializes on a hot cell (the skew suspicion
  * raised by the sf16 point, where the ivf arm unexpectedly cost as much
  * as the exact arm). Prints the seed policy branch, K, and the top cells
  * by corpus-probe count with their needle occupancy, plus stage timings
  * for (a) quantizer train, (b) probe+join+argmax.
  *
  * Usage: sbt "runMain graft.tools.IvfProbeProfile <sfDir>"
  */
object IvfProbeProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/.localdata/sf16")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.IvfKMeans
    val e = graft.tables.Tables.embeddings(spark, d).select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val needles = e.filter(pmod($"vec_id", lit(31)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    val nNeedles = needles.count()
    val stride = if (nNeedles <= 4096L) 8L else 256L
    val seeds = needles.filter($"vec_id" % (31L * stride) === 0).orderBy($"vec_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cents = IvfKMeans.train(spark, needles, seeds, iters = 2)
    val tTrain = (System.nanoTime() - t0) / 1e9
    println(f"needles=$nNeedles stride=$stride K=${cents.size} train=$tTrain%.1f s")
    val nd = needles.withColumn("cell", IvfKMeans.assignCell(spark, cents, $"v"))
      .groupBy($"cell").agg(count(lit(1)).as("n_needles"))
    val t1 = System.nanoTime()
    val probes = e.filter(pmod($"vec_id", lit(31)) =!= 0)
      .repartition($"vec_id")
      .withColumn("cell", explode(IvfKMeans.probeCells(spark, cents, $"v", 2)))
      .groupBy($"cell").agg(count(lit(1)).as("n_probes"))
    val hist = probes.join(nd, Seq("cell"), "full_outer")
      .select($"cell", coalesce($"n_probes", lit(0L)).as("n_probes"),
        coalesce($"n_needles", lit(0L)).as("n_needles"))
      .withColumn("pair_cosines", $"n_probes" * $"n_needles")
      .orderBy($"pair_cosines".desc)
      .collect()
    val tProbe = (System.nanoTime() - t1) / 1e9
    val totPairs = hist.map(_.getLong(3)).sum
    println(f"probe-histogram pass=$tProbe%.1f s; total pair cosines=$totPairs%,d across ${hist.length} cells")
    println("top cells by pair work (cell, corpus probes, needles, pair cosines, share):")
    hist.take(12).foreach { r =>
      println(f"  ${r.getLong(0)}%12d ${r.getLong(1)}%10d ${r.getLong(2)}%8d ${r.getLong(3)}%14d ${100.0 * r.getLong(3) / totPairs}%5.1f%%")
    }
    needles.unpersist(blocking = true)
    spark.stop()
  }
}
