package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the md5 (oracle-parity) vs seeded-xxhash64 (production) probe
  * paths of [[graft.queries.PipelineQueries.bloomDecontaminate]] on
  * `SPARK_GRAFT_SF_DIR`. Evidence for the hash-swap claim in the
  * `q_decontaminate_bloom` docs — same plan, same guarantees, cheaper probe.
  */
object BloomHashBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-bloom-hash-bench").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      // one warm-up + two timed trials per mode, interleaved so neither
      // mode owns the warmer JVM
      def run(fast: Boolean): Double = {
        val t0 = System.nanoTime()
        graft.queries.PipelineQueries
          .bloomDecontaminate(spark, dir, fastHash = fast)
          .write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        (System.nanoTime() - t0) / 1e9
      }
      run(fast = false); run(fast = true) // warm-up
      val trials = Seq.tabulate(4)(i => (i % 2 == 1, run(i % 2 == 1)))
      val (fastT, md5T) = (trials.filter(_._1).map(_._2).min, trials.filterNot(_._1).map(_._2).min)
      println(f"""{"md5_sec":$md5T%.3f,"xxhash64_sec":$fastT%.3f,"speedup":${md5T / fastT}%.2f,"sf":"$dir"}""")
    } finally spark.stop()
  }
}
