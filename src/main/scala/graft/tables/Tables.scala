package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-provided TPC-H-ish parquet testdata (TESTDATA.md).
  *
  * Scans stay plain `spark.read.parquet` so Catalyst retains full pushdown /
  * pruning freedom; column selection and predicates belong in the queries, not
  * here. At 100 TB these would be partitioned external tables — the access
  * pattern (relative path per table, schema from parquet footer) is the same.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** `events.ts` is ns-precision parquet, which Spark 4 refuses to read as a
    * timestamp. Read nanos as long and truncate to µs (integer `div`, exact on
    * int64 — a double division would lose precision at 1e18), which matches
    * DuckDB's ns→µs truncation for oracle parity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** ns-long → µs-timestamp normalization with the LongType guard, shared by
    * the batch accessor above and streaming reads of the same table.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
