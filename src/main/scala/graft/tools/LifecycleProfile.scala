package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level profile of the two most expensive suite keys (round-19
  * VERDICT #5: `q_similarity_index_delete` 5.1 s, `q_stream_similarity_serve`
  * 5.0 s at sf0.1 — both dominated by fixed per-job setup across their
  * lifecycle phases, per the judge's plan audit). For each phase of the
  * delete chain (build → append → delete → redelivered delete → compact →
  * serve) this reports wall-clock and the number of Spark JOBS the phase
  * launched — the evidence needed to decide whether the cost is data work
  * (scales with sf; leave it) or per-job fixed cost (doesn't; hoist or fuse).
  *
  * Usage: `runMain graft.tools.LifecycleProfile [sfDir]`
  */
object LifecycleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val P = graft.queries.PipelineQueries

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    def phase(label: String)(body: => Unit): Unit = {
      jobs.set(0)
      val t0 = System.nanoTime()
      body
      println(f"""{"phase":"$label%s","sec":${(System.nanoTime() - t0) / 1e9}%.3f,"jobs":${jobs.get()}}""")
    }

    // warm once (JIT + codegen), then profile `trials` fresh chains
    (0 until (trials + 1)).foreach { trial =>
      val tag = if (trial == 0) "warmup" else s"trial$trial"
      println(s"""{"chain":"q_similarity_index_delete","run":"$tag"}""")
      val dir = java.nio.file.Files.createTempDirectory("graft_prof_del").toString
      try {
        phase("build")(P.ivfIndexBuild(spark, sfDir, dir))
        phase("append")(P.ivfIndexAppend(spark, sfDir, dir))
        val doomed = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select($"vec_id").filter($"vec_id" % 10 === 3)
        phase("delete")(P.ivfIndexDelete(spark, dir, delId = 1L, doomed))
        phase("redelivery")(P.ivfIndexDelete(spark, dir, delId = 1L, doomed))
        phase("compact")(P.ivfIndexCompact(spark, dir, upTo = 1L))
        phase("serve") {
          P.ivfIndexServeOnly(spark, sfDir, dir).localCheckpoint()
            .queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        }
      } finally graft.util.Fs.deleteRecursively(dir)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // round 20: the cell-aligned forced-shuffle-mask chain (the suite's
    // most expensive key) — same phase breakdown
    (0 until (trials + 1)).foreach { trial =>
      val tag = if (trial == 0) "warmup" else s"trial$trial"
      println(s"""{"chain":"q_similarity_index_delete_cell","run":"$tag"}""")
      val dir = java.nio.file.Files.createTempDirectory("graft_prof_delc").toString
      try {
        phase("build")(P.ivfIndexBuild(spark, sfDir, dir))
        val early = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select($"vec_id").filter($"vec_id" % 10 === 3 && $"vec_id" % 2 =!= 0)
        phase("delete_early")(P.ivfIndexDeleteCellAligned(spark, dir, delId = 1L, early))
        phase("append")(P.ivfIndexAppend(spark, sfDir, dir))
        val doomed = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select($"vec_id").filter($"vec_id" % 10 === 3)
        phase("delete")(P.ivfIndexDeleteCellAligned(spark, dir, delId = 2L, doomed))
        phase("redelivery")(P.ivfIndexDeleteCellAligned(spark, dir, delId = 2L, doomed))
        phase("serve_forced") {
          P.ivfIndexServeOnly(spark, sfDir, dir, tombBroadcastCap = 0L).localCheckpoint()
            .queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        }
      } finally graft.util.Fs.deleteRecursively(dir)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
