package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the join shapes that keep 100 TB runs healthy when
  * AQE alone isn't enough.
  */
object ScaleOps {

  /** Skew-safe equi-join: replicate the small side `saltFactor`× and scatter
    * the large side's hot keys across the replicas. Turns one straggler
    * partition per hot key into `saltFactor` even ones at the cost of
    * broadcasting/shuffling the small side `saltFactor`×. The salt on the
    * large side is a deterministic hash of the whole row, so repeated runs
    * produce identical partitioning.
    *
    * Result is row-identical to `large.join(small, keys)` — verified by spec.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("__salt",
      pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Persist a DataFrame as a bucketed+sorted table: equal-bucketed tables
    * joined on the bucket key need no Exchange at all — the join is
    * co-located by layout, the 100 TB answer to repeated fact⋈fact joins on
    * the same key.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
}
