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
}
