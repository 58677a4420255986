package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Measurement tool for the q_join_salted perf item (round-5 target
  * ≤ 0.4 s at sf0.1): prints the optimizer's size estimate for the small
  * side vs the broadcast threshold (does the plan-time short-circuit
  * fire?), then times the salted join against the plain join and the
  * bare probe pre-pass, medians of `trials`. Not shipped behavior —
  * evidence for closing or retiring the perf item.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.SaltedJoinBench"
  */
object SaltedJoinBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def li = lineitem(spark, sfDir).select($"l_orderkey", $"l_extendedprice")
    def ord = orders(spark, sfDir).select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")

    val thrStr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val thr = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thrStr)
    val smallStats = ord.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[salted] small-side stats=${smallStats} bytes, threshold=$thr " +
      s"(short-circuit ${if (smallStats <= thr) "FIRES" else "does NOT fire"})")

    def time(label: String)(body: => Unit): Unit = {
      // warm once
      body
      val ts = Seq.fill(trials) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[salted] $label%-28s median=${ts(ts.length / 2)}%.3f s (min=${ts.head}%.3f max=${ts.last}%.3f)")
    }

    def agg(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority").count()
      ()
    }

    time("plain join")(agg(li.join(ord, Seq("l_orderkey"))))
    time("saltedJoin (query config)")(agg(graft.operators.ScaleOps.saltedJoin(
      li, ord, "l_orderkey", saltFactor = 8,
      hotKeyThreshold = 1000L, sampleFraction = 0.02)))
    time("probe pre-pass only") {
      li.sample(withReplacement = false, 0.02, seed = 42L)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("__cnt"))
        .filter($"__cnt" >= 20).count()
      ()
    }
    spark.stop()
  }
}
