package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the shared shingle-hash pass (split → 3-gram transform → per-gram
  * md5 → sorted distinct 48-bit hash set) that opens q_dedup_containment /
  * minhash_lsh / ngram_jaccard / lsh_recall, isolated from each query's
  * joins and windows — evidence for whether a fused gram-hash expression
  * (the SimHash16 pattern) is worth building. Rows-forced via noop write.
  */
object ShingleProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-shingle-profile").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      def docs = graft.tables.Tables.documents(spark, dir)
        .select($"doc_id", $"text").repartition($"doc_id")

      // the containment/minhash opening stage, verbatim shape
      def full = docs
        .select($"doc_id", split($"text", " ").as("tok"))
        .filter(size($"tok") >= 3)
        .select($"doc_id", array_distinct(
          expr("transform(sequence(0, size(tok)-3), i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2]))")
        ).as("shingles"))
        .select($"doc_id",
          expr("transform(shingles, g -> CAST(conv(substring(md5(g), 1, 12), 16, 10) AS BIGINT) % 2147483647)")
            .as("hs"))
        .withColumn("hsd", array_sort(array_distinct($"hs")))
        .select($"doc_id", $"hsd")

      // sub-stages to locate the cost
      def tokOnly = docs.select($"doc_id", split($"text", " ").as("tok"))
      def gramsOnly = tokOnly
        .filter(size($"tok") >= 3)
        .select($"doc_id", array_distinct(
          expr("transform(sequence(0, size(tok)-3), i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2]))")
        ).as("shingles"))

      // the fused replacement (Grams3Hash48), same output column
      def fused = docs
        .select($"doc_id", split($"text", " ").as("tok"))
        .filter(size($"tok") >= 3)
        .select($"doc_id", graft.functions.Grams3Hash48.grams3Hash48(spark, $"tok").as("hs"))
        .withColumn("hsd", array_sort(array_distinct($"hs")))
        .select($"doc_id", $"hsd")

      def time(name: String, df: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[shingle] $name%-12s $t%.3f s")
        t
      }
      // warm-up then 2 trials each, min reported
      val arms = Seq("tok" -> (() => tokOnly), "grams" -> (() => gramsOnly),
        "hash" -> (() => full), "fused" -> (() => fused))
      arms.foreach { case (n, f) => time(s"warm:$n", f()) }
      val res = arms.map { case (n, f) => n -> Seq(time(n, f()), time(n, f())).min }
      println(res.map { case (n, t) => f""""$n":$t%.3f""" }.mkString("{", ",", s""","sf":"$dir"}"""))
    } finally spark.stop()
  }
}
