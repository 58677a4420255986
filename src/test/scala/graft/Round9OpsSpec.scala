package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-9 operators on crafted fixtures the sf*
  * corpora can't exercise precisely: paragraph-dedup keep-first wins (and
  * fully-boilerplate docs vanish), temperature-sampling invariants (small
  * sources keep rate 1, the dominant source is the one downsampled),
  * nearest-as-of direction choice and tie-break, mode tie-break, and the
  * exact floor-log2 skew buckets.
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r9docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_dedup_paragraph: corpus-wide keep-first; fully-duplicate docs vanish") {
    // 10-token chunks; A = [c1 c2], B repeats c1 (loses it) + owns c3,
    // C = [c1] only → every chunk of C loses → C absent from the output.
    val c1 = (1 to 10).map(i => s"w$i").mkString(" ")
    val c2 = (11 to 20).map(i => s"w$i").mkString(" ")
    val c3 = (21 to 30).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, s"$c1 $c2", "en", "s0", 0L),
      (2L, s"$c1 $c3", "en", "s0", 0L),
      (3L, c1, "en", "s0", 0L)))
    val out = SparkEntry.queries("q_dedup_paragraph")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L))),
      s"doc1 keeps both chunks, doc2 keeps only c3, doc3 is gone: $out")
  }

  test("q_sample_temperature: dominant source downsampled, small sources kept whole") {
    // 64 docs in src_big, 4 in src_small: alpha=0.5 weights 8 vs 2 →
    // src_small's target (2/10)*68 = 13.6 > 4 docs → rate 1 (thr=16^6);
    // src_big's target 54.4 < 64 → thr < 16^6 and n_after <= n_before.
    val rows = (1L to 64L).map(i => (i, s"big doc $i", "en", "src_big", 0L)) ++
      (65L to 68L).map(i => (i, s"small doc $i", "en", "src_small", 0L))
    val out = SparkEntry.queries("q_sample_temperature")(spark, docsDir(rows))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (bigBefore, bigAfter, bigThr) = out("src_big")
    val (smallBefore, smallAfter, smallThr) = out("src_small")
    assert(smallThr == 16777216L && smallAfter == smallBefore && smallBefore == 4L)
    assert(bigBefore == 64L && bigThr < 16777216L && bigAfter <= bigBefore)
    // thr formula replay: w=(8,2), sw=10, tot=68 → thr_big = 8*68*16^6/(10*64)
    assert(bigThr == 8L * 68L * 16777216L / (10L * 64L))
  }

  test("q_join_asof_nearest: picks the closer side; equidistant ties go backward") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r9ev").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: signups at t=0 and t=100, purchases at t=30 (closer to 0),
    // t=70 (closer to 100), t=50 (equidistant → earlier wins).
    // user 2: purchase with no signup at all → null nearest.
    Seq(
      (1L, ts(0), 1L, "signup", 0.0, "{}"),
      (2L, ts(100), 1L, "signup", 0.0, "{}"),
      (3L, ts(30), 1L, "purchase", 1.0, "{}"),
      (4L, ts(70), 1L, "purchase", 1.0, "{}"),
      (5L, ts(50), 1L, "purchase", 1.0, "{}"),
      (6L, ts(10), 2L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_join_asof_nearest")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(3)).map(_.getTime / 1000), r.get(4)))).toMap
    assert(out(3L) == ((Some(0L), 30L * 1000000L)))
    assert(out(4L) == ((Some(100L), 30L * 1000000L)))
    assert(out(5L) == ((Some(0L), 50L * 1000000L)), s"tie must go backward: ${out(5L)}")
    assert(out(6L) == ((None, null)))
  }

  test("q_agg_mode: smallest value wins a tied count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r9ord").toString
    Seq(
      (1L, 1L, "P", 10.0, "1995-01-01", "1-URGENT"),
      (2L, 1L, "F", 10.0, "1995-01-01", "1-URGENT"),
      (3L, 1L, "O", 10.0, "1995-01-01", "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_agg_mode")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("1-URGENT" -> "F", "2-HIGH" -> "O"),
      s"F < P must win the 1-1 tie: $out")
  }

  test("q_dedup_containment: short-doc-inside-long-doc fires the jaccard_missed flag") {
    // A (30 unique tokens) is fully quoted at the head of B (A + 70 more
    // unique tokens): containment = 1.0 while Jaccard = 28/98 << 0.5.
    // Jaccard-tuned MinHash bands structurally cannot recall this pair
    // (band collision ~j^4); the rare-shingle inverted index must — and
    // no sf* corpus contains such a pair (measured 0 flags at sf0.01 and
    // sf1), so only this fixture proves the flag is live.
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = a + " " + (1 to 70).map(i => s"b$i").mkString(" ")
    val c = (1 to 40).map(i => s"c$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, a, "en", "s0", 0L), (2L, b, "en", "s0", 0L), (3L, c, "en", "s0", 0L)))
    val out = SparkEntry.queries("q_dedup_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set((1L, 2L)), s"exactly the contained pair: $out")
    assert(out((1L, 2L)) == ((1.0, true)),
      s"containment 1.0 and Jaccard-missed must both hold: ${out((1L, 2L))}")
  }

  test("q_skew_profile: exact power-of-two buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r9sk").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: 1 event (bucket 0), user 2: 3 events (bucket 1),
    // users 3,4: 4 events each (bucket 2).
    val rows = Seq(1L -> 1, 2L -> 3, 3L -> 4, 4L -> 4).flatMap { case (u, n) =>
      (1 to n).map(i => (u * 100L + i, ts(i.toLong), u, "view", 0.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_skew_profile")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      0L -> ((1L, 1L, 1L, 1L)),
      1L -> ((1L, 3L, 3L, 3L)),
      2L -> ((2L, 8L, 4L, 4L))), out.toString)
  }
}
