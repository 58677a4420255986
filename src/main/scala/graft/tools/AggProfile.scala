package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Locates q_agg_approx_distinct's cost (rows-forced it benches ~2.7 s at
  * sf0.1 over a 100k-row / 1.5k-distinct events table — far above the data
  * volume): times the HLL sketch, the exact distinct, and the combined
  * aggregate separately. Rows-forced via noop write.
  */
object AggProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-agg-profile").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      def ev = graft.tables.Tables.events(spark, dir)
      def hllOnly(rsd: Double) = ev.groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", rsd).as("est"))
      def exactOnly = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n"))
      def combined = ev.groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.01).as("est"),
          countDistinct($"user_id").as("n"), count(lit(1)).as("c"))
      def registered = graft.SparkEntry.queries("q_agg_approx_distinct")(spark, dir)

      def time(name: String, df: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[agg] $name%-16s $t%.3f s")
        t
      }
      val arms = Seq(
        "hll_rsd01" -> (() => hllOnly(0.01)),
        "hll_rsd05" -> (() => hllOnly(0.05)),
        "exact" -> (() => exactOnly),
        "combined" -> (() => combined),
        "registered" -> (() => registered))
      arms.foreach { case (n, f) => time(s"warm:$n", f()) }
      val res = arms.map { case (n, f) => n -> Seq(time(n, f()), time(n, f())).min }
      println(res.map { case (n, t) => f""""$n":$t%.3f""" }.mkString("{", ",", s""","sf":"$dir"}"""))
    } finally spark.stop()
  }
}
