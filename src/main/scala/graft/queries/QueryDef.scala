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
    * Guard: `sequence(1, 0)` in Spark DESCENDS ([1, 0]) rather than being
    * empty, so single-token arrays short-circuit.
    */
  val maxRunSql: String =
    """IF(size(st) <= 1, CAST(size(st) AS BIGINT),
      |  aggregate(sequence(1, size(st) - 1),
      |    named_struct('run', CAST(1 AS BIGINT), 'best', CAST(1 AS BIGINT)),
      |    (a, i) -> IF(element_at(st, i + 1) = element_at(st, i),
      |      named_struct('run', a.run + 1, 'best', greatest(a.best, a.run + 1)),
      |      named_struct('run', CAST(1 AS BIGINT), 'best', a.best)),
      |    a -> a.best))""".stripMargin
}
