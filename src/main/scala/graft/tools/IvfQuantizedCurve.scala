package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-cost curve for the COMPOSED IVF × int8 index
  * (`q_similarity_ivf_quantized`) — the measurement that justifies the
  * shipped nprobe as a knee on a curve rather than a guess (the same
  * discipline as [[IvfRecallCurve]] for the decontamination tier): the
  * composition stacks two approximations (unprobed cells AND int8
  * shortlist truncation), so neither constituent's measured recall covers
  * it. Sweeps nprobe per sf, prints recall@3 of the composed top-3 against
  * the exact brute-force top-3 and the composed arm's wall-clock.
  *
  * Usage: sbt "runMain graft.tools.IvfQuantizedCurve [sfDir ...]"
  *   (default: /root/testdata/sf0.1 and .localdata/sf1;
  *    SPARK_GRAFT_NPROBES=2,4,8 overrides the sweep)
  */
object IvfQuantizedCurve {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/.localdata/sf1")
    val nprobes = sys.env.get("SPARK_GRAFT_NPROBES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2, 4, 8))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def force(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    force(graft.queries.PipelineQueries.ivfQuantizedTop3(spark, "/root/testdata/sf0.001"))
    deepClean()
    val calib = graft.Bench.calibrateOnce(spark, "/root/testdata/sf0.001")
    println(s"""{"calib_sec":$calib}""")

    val rows = for (d <- dirs; np <- nprobes) yield {
      // exact truth once per (sf, np) — cheap at these scales and keeps
      // the run loop stateless (no checkpoint to lose to deepClean)
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = e.filter($"vec_id" < 10).select($"vec_id".as("q_id"), $"v".as("qv"))
      val exact = e.select($"vec_id".as("c_id"), $"v".as("cv"))
        .join(broadcast(q), $"q_id" =!= $"c_id")
        .withColumn("sim4",
          round(graft.functions.CosineSimilarity.cosineSim(spark, $"qv", $"cv"), 4))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"q_id").orderBy($"sim4".desc, $"c_id")))
        .filter($"rnk" <= 3).select($"q_id", $"c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      e.unpersist(blocking = true)
      val t0 = System.nanoTime()
      val ann = graft.queries.PipelineQueries.ivfQuantizedTop3(spark, d, np)
        .select($"q_id", $"c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      deepClean()
      val hit = (exact intersect ann).size
      println(f"""{"sf":"$d","nprobe":$np,"n_exact":${exact.size},"n_hit":$hit,"recall3":${hit.toDouble / exact.size}%.3f,"sec":$sec%.2f}""")
      (d, np, exact.size, hit, sec)
    }
    println("| sf | nprobe | recall@3 | composed arm (s) |")
    println("|---|---|---|---|")
    rows.foreach { case (d, np, ne, nh, sec) =>
      println(f"| ${d.split('/').last} | $np | $nh/$ne = ${nh.toDouble / ne}%.2f | $sec%.2f |")
    }
    spark.stop()
  }
}
