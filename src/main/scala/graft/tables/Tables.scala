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

  /** Normalize `ts` to session-TZ TimestampType regardless of how the parquet
    * writer encoded it. Three representations have shown up across driver data
    * regenerations, and every events-reading operator (window lag, sessionize,
    * watermarked streams) must see the same type:
    *   - LongType: ns-int64 (nanosAsLong read of ns parquet) → truncate to µs
    *     with integer `div` (exact on int64; double division would lose
    *     precision at 1e18), matching DuckDB's ns→µs truncation.
    *   - TimestampNTZType: µs parquet with isAdjustedToUTC=0. The session TZ
    *     is pinned UTC, so casting to TimestampType relabels the same µs
    *     instant — exact, and DuckDB reads the naive value identically, so
    *     oracle parity is preserved. Watermarks/unix_micros require this cast.
    *   - TimestampType: already normalized → no-op.
    * Idempotent and a no-op on frames without a `ts` column, so it is safe to
    * apply unconditionally at every accessor (batch and stream).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
