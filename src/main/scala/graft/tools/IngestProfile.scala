package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the ingest-dedup floor (evidence harness, NOT
  * shipped engine code): where do q_stream_ingest_dedup's ~2.2 s at sf0.1
  * go — corpus fp build, shard staging, the streaming replay itself, or
  * the per-batch store saveAsTable?
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.IngestDedup

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROFILE $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    t("warmup_full_sf0.001") {
      graft.SparkEntry.queries("q_stream_ingest_dedup")(spark, "/root/testdata/sf0.001").count()
    }

    val corpusFps = t("corpusFps_build") {
      val c = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(pmod($"doc_id", lit(31)) === 0)
        .select(IngestDedup.fpCol($"text").as("fp")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }
    val newDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod($"doc_id", lit(31)) =!= 0).select($"doc_id", $"text")

    // staging alone (mirror runIngest's write)
    t("staging_write") {
      val stage = java.nio.file.Files.createTempDirectory("graft_prof_stage")
      newDocs.withColumn("b", pmod(col("doc_id"), lit(2)))
        .repartition(2, col("b"))
        .write.partitionBy("b").mode("overwrite").parquet(stage.toString)
    }

    // one applyBatch as a BATCH call (no stream engine): in-batch dedup +
    // anti-joins + the two writes including bucketed saveAsTable
    t("applyBatch_batch0") {
      val outDir = java.nio.file.Files.createTempDirectory("graft_prof_out").toString
      val b0 = newDocs.filter(pmod($"doc_id", lit(2)) === 0)
      IngestDedup.applyBatch(spark, b0, 0L, corpusFps, "graft_prof_store0", outDir)
      spark.sql("DROP TABLE IF EXISTS graft_prof_store0")
    }
    t("applyBatch_two_batches") {
      val outDir = java.nio.file.Files.createTempDirectory("graft_prof_out2").toString
      IngestDedup.applyBatch(spark, newDocs.filter(pmod($"doc_id", lit(2)) === 0), 0L,
        corpusFps, "graft_prof_store1", outDir)
      IngestDedup.applyBatch(spark, newDocs.filter(pmod($"doc_id", lit(2)) === 1), 1L,
        corpusFps, "graft_prof_store1", outDir)
      spark.sql("DROP TABLE IF EXISTS graft_prof_store1")
    }

    // full runIngest (staging + stream engine + 2 applyBatch)
    t("runIngest_full") {
      val run = IngestDedup.runIngest(spark, newDocs, corpusFps, nShards = 2)
      IngestDedup.cleanup(spark, run)
    }
    t("runIngest_full_again") {
      val run = IngestDedup.runIngest(spark, newDocs, corpusFps, nShards = 2)
      IngestDedup.cleanup(spark, run)
    }
    corpusFps.unpersist(blocking = true)
    spark.stop()
  }
}
