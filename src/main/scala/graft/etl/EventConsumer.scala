package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consumer side of the event stream — reference operators O11-O14:
  * shard iteration from TRIM_HORIZON in bounded batches (run.py:111-131),
  * arrival-timestamp threshold filter (run.py:126-127), count-bounded
  * early stop (run.py:128-129), and the projection+JSON-parse step
  * (run.py:133-138: `{**json.loads(data), partition_key}`).
  */
object EventConsumer {

  /** Replay of `wait_for_kinesis`: read in `batchLimit`-record chunks,
    * keep events after `thresholdMs`, stop once `expected` accumulated.
    */
  def consume(
      sink: MemoryEventSink,
      expected: Int,
      thresholdMs: Long = 0L,
      batchLimit: Int = 50
  ): Seq[EventRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[EventRecord]
    val it = sink.iterator(batchLimit)
    while (out.size < expected && it.hasNext)
      out ++= it.next().filter(_.arrivalTs > thresholdMs)
    out.take(expected).toSeq
  }

  /** Distributed projection+parse (O14): envelope JSON → flattened metadata
    * columns + raw data JSON + partition key. `from_json`-style parse kept to
    * `get_json_object` so heterogeneous `data` payloads (different tables in
    * one stream) survive in one DataFrame.
    */
  def project(spark: SparkSession, events: Seq[EventRecord]): DataFrame = {
    import spark.implicits._
    val df = events.map(e => (e.seqNo, e.partitionKey, e.envelope))
      .toDF("seq_no", "partition_key", "envelope")
    df.select(
      $"seq_no",
      $"partition_key",
      get_json_object($"envelope", "$.metadata.record-type").as("record_type"),
      get_json_object($"envelope", "$.metadata.operation").as("operation"),
      get_json_object($"envelope", "$.metadata.schema-name").as("schema_name"),
      get_json_object($"envelope", "$.metadata.table-name").as("table_name"),
      get_json_object($"envelope", "$.data").as("data_json"))
  }
}

/** Engine configuration surface (reference O18): the reference resolves
  * bucket/folder/cdc names from CFN outputs + a SecretsManager secret
  * (run.py:31-45, 69-72; written at stack.py:286-295). Natively that's just a
  * config record.
  */
final case class EngineConfig(
    sourceRoot: String,
    bucketFolder: String = "sourceData",
    changeData: String = "changedata",
    checkpointDir: String = "/tmp/graft-checkpoints"
) {
  def fullLoadRoot: String = s"$sourceRoot/$bucketFolder"
  def cdcPath: String = s"$sourceRoot/$changeData"
}

/** Fixed-budget retry (reference O17: run.py:51-62 — `retries`× with constant
  * sleep; 10×1s local profile).
  */
object Retry {
  def apply[T](retries: Int = 10, sleepMs: Long = 1000L)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < retries) {
      try return f
      catch { case e: Throwable => last = e; Thread.sleep(sleepMs) }
      i += 1
    }
    throw last
  }
}
