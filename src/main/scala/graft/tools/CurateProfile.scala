package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for q_stream_curate (round-11 evidence harness; NOT
  * shipped engine code). Round 10 shipped the query at 15–17 s at sf0.1 —
  * 2.5× the sum of its parts. This harness attributed the overhead: the
  * quality-gate dominance fold and the 5-gram builder both indexed an
  * aliased array (`st`/`tok`) inside HOF lambdas, and once predicate
  * pushdown inlined `array_sort(split(text))` into the Filter condition,
  * every fold iteration re-sorted and re-split the document — O(n² log n)
  * per doc, ~13 s of the 15 s. After restructuring both helpers to closed
  * lambdas over `zip_with(slice, slice)` arrays (Q.maxRunSql / Q.grams5Sql),
  * the full query measures ~4.7 s (sum of parts: ingest-dedup 2.4 s +
  * bitmap probe ~1.9 s + gates ~0.4 s).
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.queries.Q

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    t("warmup_full_sf0.001") {
      graft.SparkEntry.queries("q_stream_curate")(spark, "/root/testdata/sf0.001").count()
    }

    val (mBits, words) = t("benchBloomWords") {
      graft.queries.PipelineQueries.benchBloomWords(spark, sfDir)
    }
    println(s"PROFILE   mBits=$mBits words=${words.length}")

    val corpusFps = t("corpusFps_build") {
      val c = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(pmod($"doc_id", lit(7)) === 0)
        .select(graft.streaming.IngestDedup.fpCol($"text").as("fp")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }

    // prep as a BATCH transform (the exact column chain the query streams)
    val bm = typedlit(words.toIndexedSeq)
    val masks = typedlit((0 until 63).map(1L << _))
    def bitTest(h: org.apache.spark.sql.Column) =
      element_at(bm, (h / 63).cast("int") + 1)
        .bitwiseAND(element_at(masks, (h % 63).cast("int") + 1)) =!= 0
    def hw(g: org.apache.spark.sql.Column, off: Int) =
      conv(substring(md5(g), off, 8), 16, 10).cast("long") % mBits
    val prep: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df => df
      .withColumn("tok", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tok")).cast("long"))
      .withColumn("sum_len", expr("aggregate(tok, 0L, (a, x) -> a + length(x))"))
      .withColumn("st", array_sort(col("tok")))
      .withColumn("top_cnt", expr(Q.maxRunSql))
      .withColumn("n_stop", expr(
        "size(filter(array('the','a','of','and','to','in'), w -> array_contains(tok, w)))"))
      .filter(col("n_tokens").between(40L, 100000L) &&
        col("sum_len") >= col("n_tokens") * 3L &&
        col("sum_len") <= col("n_tokens") * 10L &&
        col("top_cnt") * 5L <= col("n_tokens") &&
        col("n_stop") >= 2)
      .withColumn("grams", expr(Q.grams5Sql))
      .filter(!exists(col("grams"), g => bitTest(hw(g, 1)) && bitTest(hw(g, 9))))
      .select(col("doc_id"), col("text"))

    val newDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod($"doc_id", lit(7)) =!= 0 && pmod($"doc_id", lit(31)) =!= 0)
      .select($"doc_id", $"text")

    t("prep_batch_count") { println("  rows=" + prep(newDocs).count()) }
    t("prep_batch_count_again") { prep(newDocs).count() }

    val run = t("runIngest_with_prep") {
      graft.streaming.IngestDedup.runIngest(spark, newDocs, corpusFps, nShards = 2, prep = prep)
    }
    t("read_out") {
      spark.read.parquet(run.outDir)
        .select($"doc_id", $"fp", $"n_dup_in_shard").orderBy($"doc_id").localCheckpoint().count()
    }
    graft.streaming.IngestDedup.cleanup(spark, run)
    corpusFps.unpersist(blocking = true)

    graft.streaming.StreamOps.purgeCheckpoints()
    t("full_query_run1") {
      graft.SparkEntry.queries("q_stream_curate")(spark, sfDir).count()
    }
    graft.streaming.StreamOps.purgeCheckpoints()
    t("full_query_run2") {
      graft.SparkEntry.queries("q_stream_curate")(spark, sfDir).count()
    }
    spark.stop()
  }
}
