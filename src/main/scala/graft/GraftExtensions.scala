package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import graft.functions._

/** Config-injectable function pack: add
  * `spark.sql.extensions=graft.GraftExtensions` to a session (or
  * `.withExtensions(new GraftExtensions)`) and every custom expression is
  * available in SQL without any code — the standard library-integration
  * surface for Spark deployments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach(e.injectFunction)
}

/** The single source of truth for every injected function: identifier,
  * usage, arity guard, and argument coercion live HERE only. Both
  * registration paths — extension injection above and each function pack's
  * temp-function `register` (which shadows the injected entry in the
  * registry) — delegate to the same builder, so a coercion or arity fix in
  * one path can never silently miss the other (a real round-4 bug:
  * `sorted_intersect_size` registered via the Column API lacked the
  * long-array Cast the extension applied, and int-backed arrays hit
  * `ArrayData.getLong` on int storage).
  */
object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // A builder that indexes exprs(i) without checking arity surfaces a wrong-arg
  // SQL call as IndexOutOfBoundsException; fail instead with the expected
  // signature, like the built-in registry does.
  private def entry(name: String, usage: String, n: Int)(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (exprs: Seq[Expression]) => {
        require(exprs.length == n,
          s"$name expects exactly $n argument(s) — usage: $usage — got ${exprs.length}")
        build(exprs)
      })

  val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    entry("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays", 2)(
      exprs => CosineSimilarity.normalized(exprs(0), exprs(1))),
    entry("hyperplane_sig", "hyperplane_sig(v) - 16 sign-LSH bits of a double array", 1)(
      exprs => HyperplaneSig(Cast(exprs.head, ArrayType(DoubleType)))),
    entry("minhash_sig", "minhash_sig(hs) - 16 affine minhashes of pre-hashed shingles", 1)(
      exprs => AffineMinHashSig(Cast(exprs.head, ArrayType(LongType)))),
    entry("sorted_intersect_size",
      "sorted_intersect_size(a, b) - |A ∩ B| of two sorted distinct long arrays", 2)(
      exprs => SortedIntersectSize(
        Cast(exprs(0), ArrayType(LongType)), Cast(exprs(1), ArrayType(LongType)))),
    entry("bounded_topk", "bounded_topk(score, id, k) - k largest (score,id) pairs per group", 3)(
      exprs => BoundedTopK(
        Cast(exprs(0), DoubleType), Cast(exprs(1), LongType), exprs(2)).toAggregateExpression()),
    entry("code_dot",
      "code_dot(a, b) - exact integer dot product of two long code arrays", 2)(
      exprs => CodeDot(
        Cast(exprs(0), ArrayType(LongType)), Cast(exprs(1), ArrayType(LongType)))),
    entry("semdedup_pair_stats",
      "semdedup_pair_stats(vec_id, v, threshold) - per-group exact cosine near-dup pair stats", 3)(
      exprs => SemDedupPairStats(
        Cast(exprs(0), LongType), Cast(exprs(1), ArrayType(DoubleType)),
        exprs(2)).toAggregateExpression()),
    entry("freq_sketch",
      "freq_sketch(item, k) - mergeable SpaceSaving heavy-hitters summary", 2)(
      exprs => FreqSketch(Cast(exprs(0), StringType), exprs(1)).toAggregateExpression()),
    entry("simhash16", "simhash16(tok) - 16-bit md5 SimHash of a token array", 1)(
      exprs => SimHash16(Cast(exprs.head, ArrayType(StringType)))),
    entry("grams3_hash48",
      "grams3_hash48(tok) - distinct 3-gram md5 shingle hashes mod 2^31-1", 1)(
      exprs => Grams3Hash48(Cast(exprs.head, ArrayType(StringType)), Grams3Hash48.Mod)),
    entry("grams3_hash48_raw",
      "grams3_hash48_raw(tok) - distinct 3-gram raw 48-bit md5 shingle hashes", 1)(
      exprs => Grams3Hash48(Cast(exprs.head, ArrayType(StringType)), 0L)),
    entry("grams5", "grams5(tok) - distinct space-joined 5-grams of a token array", 1)(
      exprs => Grams5(Cast(exprs.head, ArrayType(StringType)))),
    entry("grams_distinct_count",
      "grams_distinct_count(tok, n) - count of distinct space-joined n-grams", 2)(
      exprs => {
        // the width shapes the compiled kernel, so it must be a plan literal
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"grams_distinct_count width must be an INT literal, got ${other.sql}")
        }
        GramsDistinctCount(Cast(exprs.head, ArrayType(StringType)), w)
      }),
    entry("grams_join",
      "grams_join(tok, n) - ALL space-joined n-grams in position order (non-distinct)", 2)(
      exprs => {
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"grams_join width must be an INT literal, got ${other.sql}")
        }
        GramsJoin(Cast(exprs.head, ArrayType(StringType)), w)
      }),
    entry("redact_counts",
      "redact_counts(text, p1, r1, p2, r2) - two-stage regex redaction with match counts", 5)(
      exprs => {
        // patterns/replacements compile into the kernel: string literals only
        def strLit(e: Expression, what: String): String = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"redact_counts $what must be a STRING literal, got ${other.sql}")
        }
        RedactCounts(Cast(exprs.head, StringType),
          strLit(exprs(1), "pattern1"), strLit(exprs(2), "repl1"),
          strLit(exprs(3), "pattern2"), strLit(exprs(4), "repl2"))
      }),
    entry("tok_char_sum",
      "tok_char_sum(tok) - character-count sum of a token array (null-sticky)", 1)(
      exprs => TokCharSum(Cast(exprs.head, ArrayType(StringType)))),
    entry("max_run_sorted",
      "max_run_sorted(tok) - longest adjacent-equal run after sorting (max multiplicity)", 1)(
      exprs => MaxRunSorted(Cast(exprs.head, ArrayType(StringType)))),
    entry("stopword_hits",
      "stopword_hits(tok, words) - how many of the literal words appear in the token array", 2)(
      exprs => {
        val ws = exprs(1) match {
          case lit if lit.foldable && lit.dataType.isInstanceOf[ArrayType] =>
            val arr = lit.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
          case other => throw new IllegalArgumentException(
            s"stopword_hits words must be a foldable ARRAY<STRING> literal, got ${other.sql}")
        }
        StopwordHits(Cast(exprs.head, ArrayType(StringType)), ws)
      }),
    entry("token_set_count",
      "token_set_count(tok, words) - occurrence count of tokens in the literal word set", 2)(
      exprs => {
        val ws = exprs(1) match {
          case lit if lit.foldable && lit.dataType.isInstanceOf[ArrayType] =>
            val arr = lit.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
          case other => throw new IllegalArgumentException(
            s"token_set_count words must be a foldable ARRAY<STRING> literal, got ${other.sql}")
        }
        TokenSetCount(Cast(exprs.head, ArrayType(StringType)), ws)
      }),
    entry("bloom_pair",
      "bloom_pair(g, mBits) - the [h1, h2] md5 Bloom probe positions of a gram", 2)(
      exprs => {
        val m = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v.toLong
          case other => throw new IllegalArgumentException(
            s"bloom_pair mBits must be an integral literal, got ${other.sql}")
        }
        BloomPair(Cast(exprs.head, StringType), m)
      }),
    entry("chunk_texts",
      "chunk_texts(tok, width, stride) - strided token-window chunk texts", 3)(
      exprs => {
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"chunk_texts $what must be an INT literal, got ${other.sql}")
        }
        ChunkTexts(Cast(exprs.head, ArrayType(StringType)),
          intLit(exprs(1), "width"), intLit(exprs(2), "stride"))
      }),
    entry("window_hash64",
      "window_hash64(tok, n) - distinct 64-bit fingerprints of every n-token window", 2)(
      exprs => {
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"window_hash64 width must be an INT literal, got ${other.sql}")
        }
        WindowHash64(Cast(exprs.head, ArrayType(StringType)), w)
      }),
    entry("json_get_scalar",
      "json_get_scalar(json, key) - top-level scalar JSON key extraction (get_json_object fast path)", 2)(
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"json_get_scalar key must be a STRING literal, got ${other.sql}")
        }
        JsonGetScalar(Cast(exprs.head, StringType), k)
      })
  )

  /** The builder for one injected function (test/registration surface). */
  def builder(name: String): Seq[Expression] => Expression =
    builders.collectFirst { case (fid, _, b) if fid.funcName == name => b }
      .getOrElse(throw new IllegalArgumentException(s"no injected function named $name"))

  /** Temp-function registration on an already-built session (the
    * non-extension path); identical builder to injection by construction.
    */
  def registerTemp(spark: SparkSession, names: String*): Unit =
    names.foreach(n => spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(n, builder(n), "scala_udf"))
}
