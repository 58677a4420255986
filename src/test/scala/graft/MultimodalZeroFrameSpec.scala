package graft

import org.scalatest.funsuite.AnyFunSuite

/** Zero-frame parity: a document whose content decodes to ZERO frames
  * (empty text) must survive the multimodal queries with n_frames /
  * n_sampled = 0, a null frame0_mean, and all-zero features — the row the
  * DuckDB oracle produces. Guards the drive-from-histogram left-join shape:
  * an inner join on the frame side silently drops the row, and no sf*
  * fixture would catch it because the generated corpus has no empty docs.
  */
class MultimodalZeroFrameSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // a fixture dir whose documents table contains an empty-content doc
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mm_zero").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L),
      (2L, "", "en", "web", 0L), // zero bytes → zero frames
      (3L, "x" * 600, "en", "web", 600L) // 3 frames → 2 sampled (idx 0, 2)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_multimodal_pipeline keeps a zero-frame doc with n_frames = 0") {
    val rows = SparkEntry.queries("q_multimodal_pipeline")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    val empty = rows(2L)
    assert(empty.getLong(1) == 0L, s"n_frames for the empty doc: $empty")
    assert(empty.isNullAt(2), s"frame0_mean must be null for a frameless doc: $empty")
    // histogram of zero bytes is all zeros
    (3 to 6).foreach(i => assert(empty.getLong(i) == 0L, s"h${i - 3}: $empty"))
    assert(rows(3L).getLong(1) == 3L, s"600 bytes = 3 frames: ${rows(3L)}")
  }

  test("q_multimodal_features keeps a zero-frame doc with n_sampled = 0 and zero features") {
    val rows = SparkEntry.queries("q_multimodal_features")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    val empty = rows(2L)
    assert(empty.getLong(1) == 0L, s"n_sampled for the empty doc: $empty")
    // zero-norm features pin to 0.0 (not NaN / null) in both engines
    (2 to 5).foreach(i => assert(empty.getDouble(i) == 0.0, s"f${i - 2}: $empty"))
    assert(rows(3L).getLong(1) == 2L, s"3 frames, stride 2 → idx 0 and 2: ${rows(3L)}")
  }
}
