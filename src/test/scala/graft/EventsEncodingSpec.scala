package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Regression guard for the events-timestamp encoding drift that broke four
  * queries in round 8: the driver has regenerated `events.ts` in THREE
  * physical encodings across rounds — ns-int64 (read as LongType under
  * `nanosAsLong`), µs TIMESTAMP_NTZ (isAdjustedToUTC=0), and µs TIMESTAMP
  * (LTZ) — and every events reader funnels through
  * `Tables.normalizeEventTs`, which must make all three indistinguishable.
  * This spec writes ONE fixture in all three encodings and asserts:
  *   1. normalizeEventTs yields identical unix_micros across encodings;
  *   2. a batch window query over ts (q_window_lag) returns identical rows;
  *   3. a REAL streaming query (q_stream_dedup: readStream → watermark →
  *      dropDuplicatesWithinWatermark) returns identical rows — the
  *      watermark path is where a non-TimestampType ts fails analysis.
  * If a future driver regeneration introduces a fourth encoding, the
  * LongType/NTZ/LTZ match in normalizeEventTs misses it and (1) fails here
  * loudly instead of as a silent oracle mismatch.
  */
class EventsEncodingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Fixture micros: 4 users × ~10 events over 3 hours with duplicate
    * (user_id, event_type) keys (exercises dedup) and within-partition
    * ordering ties (exercises lag's (ts, event_id) sort).
    */
  private lazy val baseMicros: Seq[(Long, Long, String, Long)] = {
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    for {
      u <- 1L to 4L
      i <- 0L until 10L
    } yield {
      val tpe = Seq("view", "purchase", "signup")((i % 3).toInt)
      // two events per user share a timestamp → lag must tiebreak on event_id
      val ts = t0 + u * 1000000L + (i / 2) * 17L * 60000000L
      (u * 100L + i, u, tpe, ts)
    }
  }

  /** Write the fixture as `<dir>/events.parquet` in the given encoding. */
  private def writeEncoded(encoding: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_enc_$encoding").toString
    val df = baseMicros.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("value", ($"event_id" % 7).cast("double"))
      .withColumn("props", lit("{}"))
    val encoded = encoding match {
      case "ns_long" => df.withColumn("ts", $"us" * 1000L)
      case "us_ntz"  => df.withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType))
      case "us_ltz"  => df.withColumn("ts", timestamp_micros($"us"))
    }
    // single FILE named events.parquet (driver-corpus layout) — the
    // streaming source dir symlinks that file, so a directory here would
    // break schema inference under the symlink
    val stage = java.nio.file.Paths.get(dir, "__stage")
    encoded.drop("us")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val listing = java.nio.file.Files.list(stage)
    val part =
      try listing.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }

  private lazy val dirs: Map[String, String] =
    Seq("ns_long", "us_ntz", "us_ltz").map(e => e -> writeEncoded(e)).toMap

  test("the three encodings round-trip to the expected raw types") {
    // guard the fixture itself: if Spark's writer ever changes what these
    // casts produce on disk, the spec would be testing one encoding thrice
    val types = dirs.map { case (e, d) =>
      e -> spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    }
    assert(types("ns_long") == LongType, types.toString)
    assert(types("us_ntz") == TimestampNTZType, types.toString)
    assert(types("us_ltz") == TimestampType, types.toString)
  }

  test("normalizeEventTs yields identical unix_micros for ns-int64, µs-NTZ and µs-LTZ") {
    val micros = dirs.map { case (e, d) =>
      val out = graft.tables.Tables.normalizeEventTs(
        spark.read.parquet(s"$d/events.parquet"))
      assert(out.schema("ts").dataType == TimestampType, s"$e not normalized")
      e -> out.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(micros("ns_long") == micros("us_ntz"))
    assert(micros("ns_long") == micros("us_ltz"))
    assert(micros("ns_long").map(_._2).toSet.size > 1, "fixture degenerate")
  }

  test("q_window_lag (batch window over ts) is encoding-invariant") {
    val rows = dirs.map { case (e, d) =>
      e -> SparkEntry.queries("q_window_lag")(spark, d).collect().toSeq
    }
    assert(rows("ns_long").nonEmpty)
    assert(rows("ns_long") == rows("us_ntz"))
    assert(rows("ns_long") == rows("us_ltz"))
  }

  test("q_stream_dedup (readStream + watermark + dedup) is encoding-invariant") {
    val rows = dirs.map { case (e, d) =>
      e -> SparkEntry.queries("q_stream_dedup")(spark, d).collect().toSeq
    }
    assert(rows("ns_long").nonEmpty)
    assert(rows("ns_long") == rows("us_ntz"))
    assert(rows("ns_long") == rows("us_ltz"))
  }
}
