package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: the Spark implementation plus (optionally) the
  * ANSI-SQL oracle the driver replays in DuckDB over the same parquet tables.
  * Column names and row values must match exactly (driver hash-compares after
  * sorting columns by name).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

/** Cross-engine determinism helpers.
  *
  * Sums of doubles are order-dependent (Spark partition order vs DuckDB scan
  * order), so every money aggregate goes through an exact decimal cast first:
  * the 2-dp source doubles cast losslessly to DECIMAL, decimal sums are exact
  * in both engines, and decimal→double conversion is correctly rounded in
  * both — identical bits out. Averages are expressed as exact-sum / count so
  * both engines perform the same single IEEE division.
  */
object Q {
  def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** Exact deterministic sum of a 2-dp money double, surfaced as double. */
  def sumMoney(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average of a 2-dp money double. */
  def avgMoney(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** Oracle-side SQL for the same constructs. */
  def oSum(expr: String): String = s"CAST(SUM(CAST($expr AS DECIMAL(12,2))) AS DOUBLE)"
  def oAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(12,2))) AS DOUBLE) / COUNT($expr)"

  /** Max token multiplicity (the Gopher dominance statistic) over a
    * PRE-SORTED array column named `st`, as a longest-equal-run fold —
    * O(n log n) per document including the sort. The naive
    * `array_max(transform(array_distinct(tok), t -> size(filter(tok, ...))))`
    * form is O(n·distinct) per document: invisible on this corpus's short
    * docs, a real cliff on 10k-token documents at 100 TB (10⁸ comparisons
    * per doc vs 10⁵ here). Value-identical to the naive form (proven by
    * Round10OpsSpec's equivalence property), so DuckDB oracles keep the
    * naive expression and hash parity is untouched.
    *
    * SHAPE CONSTRAINT (round-11): the per-iteration lambda must reference
    * ONLY lambda-bound variables — never `st` itself. When this expression
    * lands in a Filter, predicate pushdown substitutes `st`'s defining
    * expression (`array_sort(split(text))`) into the condition, and an
    * interpreted HOF re-evaluates every outer reference ON EACH ITERATION:
    * the previous `element_at(st, i)` indexing form re-sorted and re-split
    * the whole document per token — O(n² log n)/doc, measured as 8.8 s of
    * q_stream_curate's 15 s at sf0.1. The fold below first materializes the
    * neighbor-equality bit array with `zip_with(slice, slice)` (st evaluated
    * a constant ~5 times per doc), then folds over it with a closed lambda;
    * longest TRUE run + 1 = max multiplicity.
    *
    * Edge behavior: size<=1 returns size — so an EMPTY array yields 0,
    * while the naive distinct×count form yields NULL (array_max over an
    * empty array). Unreachable from the query surface today (split() never
    * produces an empty array) and pinned by Round10OpsSpec's empty-array
    * case; a caller with genuinely empty arrays inherits the 0, not NULL.
    */
  val maxRunSql: String =
    """IF(size(st) <= 1, CAST(size(st) AS BIGINT),
      |  1L + aggregate(
      |    zip_with(slice(st, 1, size(st) - 1), slice(st, 2, size(st) - 1),
      |      (x, y) -> IF(x = y, 1L, 0L)),
      |    named_struct('run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
      |    (a, e) -> IF(e = 1L,
      |      named_struct('run', a.run + 1L, 'best', greatest(a.best, a.run + 1L)),
      |      named_struct('run', CAST(0 AS BIGINT), 'best', a.best)),
      |    a -> a.best))""".stripMargin

  /** Distinct 5-grams of a token-array column named `tok`, shaped for
    * filter-inlining safety (same constraint as [[maxRunSql]]): the gram at
    * position j is assembled by zipping five shifted `slice`s of `tok`, so
    * the combining lambdas reference only their bound variables. The
    * previous `transform(sequence(0, size(tok)-5), i -> concat_ws(tok[i],…))`
    * form indexed `tok` five times per gram — after pushdown substituted
    * `split(text)` for `tok` in a Filter, that re-split the document per
    * access (O(n²)/doc, ~4 s of q_stream_curate at sf0.1).
    * Caller must guarantee size(tok) >= 5 (`greatest(…, 0)` only guards the
    * slice length against negatives; a 4-token doc yields [] rather than an
    * error, matching the previous form's callers which pre-filter).
    * Element order is identical to the transform form, so oracles and
    * downstream `array_distinct`/`explode` consumers are unchanged.
    */
  val grams5Sql: String =
    """array_distinct(
      |  zip_with(
      |    zip_with(
      |      zip_with(
      |        zip_with(
      |          slice(tok, 1, greatest(size(tok) - 4, 0)),
      |          slice(tok, 2, greatest(size(tok) - 4, 0)),
      |          (a, b) -> concat(a, ' ', b)),
      |        slice(tok, 3, greatest(size(tok) - 4, 0)),
      |        (a, b) -> concat(a, ' ', b)),
      |      slice(tok, 4, greatest(size(tok) - 4, 0)),
      |      (a, b) -> concat(a, ' ', b)),
      |    slice(tok, 5, greatest(size(tok) - 4, 0)),
      |    (a, b) -> concat(a, ' ', b)))""".stripMargin
}
