package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.tools.ScaleUp

/** Invariants of the sf-multiplier used for the data-dominated bench point:
  * linear row growth, disjoint per-shard key spaces, and content
  * decorrelation that preserves WITHIN-shard similarity structure exactly
  * while killing cross-shard similarity (without which dup pair counts grow
  * quadratically in the factor instead of linearly).
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("scaleTable multiplies rows and keeps shard key spaces disjoint") {
    import spark.implicits._
    val src = Seq((1L, 2L, "a"), (2L, 3L, "b")).toDF("o_orderkey", "o_custkey", "x")
    val out = ScaleUp.scaleTable(spark, src, "orders", 4)
    assert(out.count() == 8)
    val keys = out.select($"o_orderkey").as[Long].collect()
    assert(keys.distinct.length == 8, "offset keys must never collide across shards")
    // intra-shard join structure: custkey offsets move in lockstep
    val pairs = out.select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    assert(pairs.forall { case (ok, ck) => ck - ok == 1L })
  }

  test("document texts decorrelate across shards but stay intact within a shard") {
    import spark.implicits._
    val src = Seq((1L, "the quick brown fox", "en", "s", 19L),
      (2L, "the quick brown fox", "en", "s", 19L)) // planted exact dup
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = ScaleUp.scaleTable(spark, src, "documents", 3)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // shard 0 is the identity
    assert(out(1L) == "the quick brown fox")
    // per-shard rotation: the planted dup stays an EXACT dup within every shard
    for (k <- 0 until 3) {
      val off = k * ScaleUp.ShardOffset
      assert(out(off + 1L) == out(off + 2L), s"shard $k lost its planted dup")
      assert(out(off + 1L).length == 19, s"shard $k changed text length")
    }
    // cross-shard copies share no letters in common positions beyond spaces
    assert(out(1L) != out(ScaleUp.ShardOffset + 1L))
    val sameWords = out(1L).split(" ").toSet
      .intersect(out(ScaleUp.ShardOffset + 1L).split(" ").toSet)
    assert(sameWords.isEmpty, s"cross-shard shingle overlap: $sameWords")
  }

  test("factor beyond the 25 distinct rotations is rejected, and the last legal shard still rotates") {
    import spark.implicits._
    val src = Seq((1L, "abcdef", "en", "s", 6L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    // factor 27 would hand shard 26 the identity rotation (or a repeat) —
    // silently reintroducing quadratic cross-shard dup growth; fail loudly
    val ex = intercept[IllegalArgumentException] {
      ScaleUp.scaleTable(spark, src, "documents", 27)
    }
    assert(ex.getMessage.contains("26"), ex.getMessage)
    // at the max legal factor every non-zero shard is a genuine rotation:
    // all 26 texts (identity + 25 rotations) are pairwise distinct
    val out = ScaleUp.scaleTable(spark, src, "documents", 26)
      .select($"text").as[String].collect()
    assert(out.length == 26 && out.distinct.length == 26,
      s"expected 26 pairwise-distinct rotations, got ${out.distinct.length}")
  }

  test("embedding sign-flips preserve within-shard cosine, break cross-shard") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.0f)
    val b = Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.5f) // near-dup of a
    val src = Seq((1L, a, 0), (2L, b, 0)).toDF("vec_id", "embedding", "label")
    val out = ScaleUp.scaleTable(spark, src, "embeddings", 3)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      dot / math.sqrt(x.map(p => p.toDouble * p).sum * y.map(q => q.toDouble * q).sum)
    }
    val base = cos(a, b)
    for (k <- 0 until 3) {
      val off = k * ScaleUp.ShardOffset
      // flips apply uniformly inside a shard: pairwise cosine is bit-exact
      assert(math.abs(cos(out(off + 1L), out(off + 2L)) - base) < 1e-12,
        s"shard $k changed within-shard cosine")
      // norms preserved (sign flips only)
      assert(out(off + 1L).map(v => v * v).sum == a.map(v => v * v).sum)
    }
    // the same vector in different shards is decorrelated (not near-dup)
    assert(cos(out(1L), out(ScaleUp.ShardOffset + 1L)) < 0.9)
  }

  test("re-scaling composes safely: stride keeps ids disjoint, mask seed kills symmetric dups") {
    import spark.implicits._
    // Two traps pinned by sf4's first (invalid) generation:
    //  1. offsets compose ADDITIVELY, so a second pass at the default
    //     stride lands sub-shards (i,k) and (k,i) on the SAME ids
    //     (80k rows / 26k distinct vec_ids);
    //  2. flip masks compose by XOR, so with the same hash both passes,
    //     (i,k) and (k,i) get IDENTICAL masks — artificial cross-shard
    //     exact-duplicate vectors.
    // The fix: a second-pass stride covering the first pass's id span,
    // and a pass-distinct mask seed.
    val v = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val src = Seq((1L, v, 0)).toDF("vec_id", "embedding", "label")
    val so = ScaleUp.ShardOffset
    def rescale(seed: Int, stride2: Long) = {
      val pass1 = ScaleUp.scaleTable(spark, src, "embeddings", 3)
      ScaleUp.scaleTable(spark, pass1, "embeddings", 3, maskSeed = seed, stride = stride2)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    }
    // default stride: (i=1,k=2) and (i=2,k=1) both offset by 3 × so — collision
    val naive = rescale(0, so)
    assert(naive.length == 9 && naive.map(_._1).distinct.length < 9,
      "expected the documented id collision at default stride")
    // stride covering pass1's span (3 shards): 9 disjoint id spaces
    val strided = rescale(7, 3 * so).toMap
    assert(strided.size == 9, "stride must keep all composed id spaces disjoint")
    // and NO composed sub-shard pair shares a flip mask (no exact-dup content)
    val distinctContents = strided.values.map(_.toSeq).toSet
    assert(distinctContents.size == 9,
      "pass-distinct mask seed must make all composed masks distinct")
    // seed 0 at the safe stride still exhibits the XOR-symmetry dup —
    // the trap the seed exists for (and why seed 0 is reserved for pass 1)
    val unseeded = rescale(0, 3 * so).toMap
    assert(unseeded.values.map(_.toSeq).toSet.size < 9,
      "without the seed, symmetric sub-shards must collide in content (trap documentation)")
  }
}
