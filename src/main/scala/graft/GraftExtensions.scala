package graft

import org.apache.spark.sql.SparkSessionExtensions
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

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // A builder that indexes exprs(i) without checking arity surfaces a wrong-arg
  // SQL call as IndexOutOfBoundsException; fail instead with the expected
  // signature, like the built-in registry does.
  private def arity(name: String, usage: String, n: Int)(exprs: Seq[Expression]): Unit =
    require(exprs.length == n,
      s"$name expects exactly $n argument(s) — usage: $usage — got ${exprs.length}")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      (exprs: Seq[Expression]) => {
        arity("cosine_sim", "cosine_sim(a, b)", 2)(exprs)
        CosineSimilarity.normalized(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "hyperplane_sig(v) - 16 sign-LSH bits of a double array"),
      (exprs: Seq[Expression]) => {
        arity("hyperplane_sig", "hyperplane_sig(v)", 1)(exprs)
        HyperplaneSig(Cast(exprs.head, ArrayType(DoubleType)))
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hs) - 16 affine minhashes of pre-hashed shingles"),
      (exprs: Seq[Expression]) => {
        arity("minhash_sig", "minhash_sig(hs)", 1)(exprs)
        AffineMinHashSig(Cast(exprs.head, ArrayType(LongType)))
      }))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - |A ∩ B| of two sorted distinct long arrays"),
      (exprs: Seq[Expression]) => {
        arity("sorted_intersect_size", "sorted_intersect_size(a, b)", 2)(exprs)
        SortedIntersectSize(
          Cast(exprs(0), ArrayType(LongType)), Cast(exprs(1), ArrayType(LongType)))
      }))
    e.injectFunction((
      FunctionIdentifier("bounded_topk"),
      info("bounded_topk", "bounded_topk(score, id, k) - k largest (score,id) pairs per group"),
      (exprs: Seq[Expression]) => {
        arity("bounded_topk", "bounded_topk(score, id, k)", 3)(exprs)
        BoundedTopK(
          Cast(exprs(0), DoubleType), Cast(exprs(1), LongType), exprs(2)).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("freq_sketch"),
      info("freq_sketch",
        "freq_sketch(item, k) - mergeable SpaceSaving heavy-hitters summary"),
      (exprs: Seq[Expression]) => {
        arity("freq_sketch", "freq_sketch(item, k)", 2)(exprs)
        FreqSketch(Cast(exprs(0), StringType), exprs(1)).toAggregateExpression()
      }))
  }
}
