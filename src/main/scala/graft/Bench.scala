package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest SF: JIT + whole-stage-codegen compile +
    // shuffle infra init otherwise lands on whichever query runs first
    // (measured: first window query 3.9s cold vs 0.36s warm).
    val warmDir = "/root/testdata/sf0.001"
    // Optional subset for local iteration: SPARK_GRAFT_ONLY=q_a,q_b
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // fail fast on unknown names — a typo would otherwise bench an empty
    // set and report a parseable-but-bogus total of 0.0
    only.foreach { ks =>
      val unknown = ks -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY has unknown queries: $unknown")
    }
    val queries = only.fold(SparkEntry.queries)(ks => SparkEntry.queries.filter(kv => ks(kv._1)))
    queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      System.gc()
    }
    // Median of `trials` runs per query: single-run times swing ±30% from GC /
    // scheduler noise in local mode; the median is stable run-to-run, so the
    // reported total tracks the engine, not the JVM's mood.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      val t = (System.nanoTime() - t0) / 1e9
      // Queries persist intermediates they legitimately reuse WITHIN a run;
      // dropping leftovers between runs keeps trials independent — without
      // this, dozens of stale cached plans accumulate over 80+ queries × 4
      // executions and the eviction/GC churn taxes every later query.
      // The GC (untimed — after t) lets the async ContextCleaner reclaim
      // unreferenced localCheckpoint/broadcast blocks promptly: left alone
      // they pile up across ~360 executions and tax whichever
      // memory-hungry query lands in the pressure window (observed 15x on
      // one query purely from suite ordering).
      spark.catalog.clearCache()
      System.gc()
      t
    }
    val results = queries.map { case (name, fn) =>
      val ts = Seq.fill(trials)(timeOnce(fn)).sorted
      name -> ts(ts.length / 2)
    }
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":${f"$total%.4f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver parses the result from sbt's interleaved log output, so the
    // JSON must survive as a machine-readable artifact: write it to a file
    // AND print it as the sole last stdout line (after spark.stop(), which
    // logs shutdown noise of its own).
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/bench.json"), json)
    spark.stop()
    println(json)
    System.out.flush()
  }
}
