package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 closures, centered on the round-14 advice's one medium item:
  * the BPE merge-apply representation. The leading-separator form
  * ('|t|h|e', pattern '|a|b') lacked a RIGHT symbol boundary, so once an
  * earlier merge created a multi-char symbol, a later merge (a,b) also
  * matched any symbol merely STARTING with b — latent on the shipped
  * corpus, reachable on ordinary text. The wrapped form ('|t||h||e|',
  * pattern '|a||b|') bounds both sides and keeps exact greedy semantics
  * in ONE replace pass (no shared boundary between adjacent occurrences).
  * These fixtures force both failure modes.
  */
class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf001 = "/root/testdata/sf0.01"

  private def trainOn(words: Seq[String]): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    val text = words.mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("bpe_fix").toString
    Seq((1L, text, "en", "fixture", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q_bpe_train")(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
  }

  test("BPE apply bounds the RIGHT symbol: a merge whose right element prefixes an earlier merged symbol must not corrupt it") {
    // round 1 merges (t,h) w11 ('th' x10 + inside 'meth'); round 2 merges
    // (e,t) w9 ('et' x9). Under the unbounded round-14 pattern '|e|t',
    // applying merge 2 to 'meth' = [m, e, th] ALSO matched '|e|th' and
    // corrupted it to [m, eth] — so round 3 would emit (m, eth). The
    // bounded pattern leaves [m, e, th] intact: round 3 must merge
    // (e, th) (tie at w1 vs (m, e); 'e' < 'm'), round 4 (m, eth).
    val got = trainOn(Seq.fill(10)("th") ++ Seq.fill(9)("et") ++ Seq("meth"))
    assert(got == Seq(
      (1L, "t", "h", 11L),
      (2L, "e", "t", 9L),
      (3L, "e", "th", 1L),   // exists ONLY if 'th' survived merge 2
      (4L, "m", "eth", 1L)),
      s"merge sequence diverged (right-boundary corruption?): $got")
  }

  test("BPE apply stays exactly greedy on a==b chains ('aaaaa' -> [aa, aa, a], never [aa, a, aa])") {
    // 'aaaaa' x4: round 1 merges (a,a) w16; greedy left-to-right yields
    // [aa, aa, a] per word, so round 2 sees (aa,aa) w4 AND (aa,a) w4 and
    // the (cnt, a, b) tie-break picks (aa, a) ('a' < 'aa'). A trailing-
    // sentinel fixpoint apply — the shared-boundary alternative — yields
    // [aa, a, aa], whose pair set {(aa,a), (a,aa)} would surface (a, aa)
    // at rank 2 instead. Round 3 then proves rank 2 applied greedily too:
    // [aa, aa, a] --(aa,a)--> [aa, aaa] => (aa, aaa) w4 beats (x,y) w3.
    val got = trainOn(Seq.fill(4)("aaaaa") ++ Seq.fill(3)("xy"))
    assert(got == Seq(
      (1L, "a", "a", 16L),
      (2L, "aa", "a", 4L),    // greedy wrapping: never (a, aa)
      (3L, "aa", "aaa", 4L),
      (4L, "x", "y", 3L)),
      s"merge sequence diverged (non-greedy chain apply?): $got")
  }
}
