package graft

import org.scalatest.funsuite.AnyFunSuite

/** Failure-row parity for the container-backed multimodal keys (round 14:
  * the keys run over real MP4 bytes, where the failure case is a TRUNCATED
  * container, not an empty text): a document whose container does not
  * parse must survive both queries as the −1 row the DuckDB oracle
  * produces — never silently dropped. Guards the drive-from-histogram
  * left-join shape: an inner join on the frame side loses the row, and
  * doc_id 0 is the only planted truncation below 89, so a fixture
  * without it would not catch the drop.
  */
class MultimodalZeroFrameSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // ids 0 and 89 truncate (id % 89 == 0); 1 and 88 decode
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mm_trunc").toString
    Seq(
      (0L, "planted truncation", "en", "web", 18L),
      (1L, "decodes fine", "en", "web", 12L),
      (88L, "decodes fine too", "en", "web", 16L),
      (89L, "second planted truncation", "en", "web", 25L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_multimodal_pipeline surfaces a truncated container as the -1 row") {
    val rows = SparkEntry.queries("q_multimodal_pipeline")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 88L, 89L))
    Seq(0L, 89L).foreach { id =>
      val r = rows(id)
      assert(r.getLong(1) == -1L, s"n_frames for truncated $id: $r")
      assert(r.getDouble(2) == -1.0, s"frame0_mean for truncated $id: $r")
      (3 to 6).foreach(i => assert(r.getLong(i) == -1L, s"h${i - 3} for truncated $id: $r"))
    }
    // a decodable doc reports its true sample count (1 + id % 7)
    assert(rows(1L).getLong(1) == 2L, s"doc 1 has 2 samples: ${rows(1L)}")
    assert(rows(88L).getLong(1) == 5L, s"doc 88 has 5 samples: ${rows(88L)}")
  }

  test("q_multimodal_features surfaces a truncated container as the -1 row") {
    val rows = SparkEntry.queries("q_multimodal_features")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 88L, 89L))
    Seq(0L, 89L).foreach { id =>
      val r = rows(id)
      assert(r.getLong(1) == -1L, s"n_sampled for truncated $id: $r")
      (2 to 5).foreach(i => assert(r.getDouble(i) == -1.0, s"f${i - 2} for truncated $id: $r"))
    }
    // stride-2 sampling over real samples: doc 1 has samples {0,1} → 1 kept;
    // doc 88 has {0..4} → 3 kept
    assert(rows(1L).getLong(1) == 1L, s"doc 1 sampled: ${rows(1L)}")
    assert(rows(88L).getLong(1) == 3L, s"doc 88 sampled: ${rows(88L)}")
    // features are a unit vector over the first 4 of 64 bins — each in [0,1]
    (2 to 5).foreach { i =>
      val f = rows(1L).getDouble(i)
      assert(f >= 0.0 && f <= 1.0, s"f${i - 2} out of range: ${rows(1L)}")
    }
  }
}
