package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnosis harness for q_graph_pagerank's trial variance (the r12
  * verdict's item 2: 3.30–12.05 s across same-session sf0.1 trials). A/Bs
  * the nested-plan form (all 3 PageRank rounds in one DAG, pre-round-13)
  * against the round-materialized form (eager localCheckpoint between
  * rounds), N trials each in one JVM, with per-trial GC telemetry (young/
  * old collection time deltas) so a slow trial's cause is named, not
  * guessed.
  *
  * Usage: sbt "runMain graft.tools.PageRankProfile [sfDir] [trials]"
  */
object PageRankProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import scala.jdk.CollectionConverters._
    def gcSnap(): Map[String, (Long, Long)] =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => b.getName -> (b.getCollectionCount, b.getCollectionTime)).toMap

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def run(name: String, checkpointRounds: Boolean): Seq[Double] = {
      // one untimed warmup per form (codegen compile)
      force(graft.queries.RelationalQueries.pageRank(spark, d, materialize = true,
        checkpointRounds = checkpointRounds))
      deepClean()
      val ts = (1 to trials).map { t =>
        val g0 = gcSnap()
        val t0 = System.nanoTime()
        force(graft.queries.RelationalQueries.pageRank(spark, d, materialize = true,
          checkpointRounds = checkpointRounds))
        val sec = (System.nanoTime() - t0) / 1e9
        val g1 = gcSnap()
        val gc = g1.map { case (k, (c, ms)) =>
          val (c0, ms0) = g0.getOrElse(k, (0L, 0L))
          f"$k=${c - c0}/${ms - ms0}ms"
        }.mkString(" ")
        deepClean()
        println(f"[$name] trial $t: $sec%.2f s   gc: $gc")
        sec
      }
      val sorted = ts.sorted
      println(f"[$name] min=${sorted.head}%.2f med=${sorted(sorted.length / 2)}%.2f " +
        f"max=${sorted.last}%.2f spread=${sorted.last / sorted.head}%.2fx")
      ts
    }

    run("nested-plan", checkpointRounds = false)
    run("round-materialized", checkpointRounds = true)
    spark.stop()
  }
}
