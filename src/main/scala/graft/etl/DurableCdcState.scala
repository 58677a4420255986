package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import graft.cdc.{ApplyOutcome, CdcParser, CdcRecord}

/** Durable CDC apply state: current full row images as a parquet table,
  * exceptions as an append-only parquet log.
  *
  * This is the 100 TB shape of the reference's replication state — nothing
  * driver-side, state merged per micro-batch with the distributed
  * `CdcApply.run` (one shuffle on the PK), written with a tmp-dir swap so a
  * crash mid-write leaves the previous snapshot intact. A restarted task
  * (same `dir`) resumes from the last committed snapshot; replayed
  * micro-batches (foreachBatch is at-least-once) are idempotent for state
  * because ops carry full row images.
  */
final class DurableCdcState(spark: SparkSession, dir: String) {
  import spark.implicits._

  private val statePath = new Path(s"$dir/state")
  private val stateTmpPath = new Path(s"$dir/state._tmp")
  private val exceptionsPath = s"$dir/exceptions"

  private def fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def loadState(): Dataset[CdcRecord] =
    if (fs.exists(statePath)) spark.read.parquet(statePath.toString).as[CdcRecord]
    else spark.emptyDataset[CdcRecord]

  /** Replace the snapshot atomically-enough for a filesystem: write tmp,
    * delete old, rename tmp into place. (On an object store this becomes a
    * manifest pointer swap — same structure.)
    */
  def saveState(state: Dataset[CdcRecord]): Unit = {
    state.write.mode(SaveMode.Overwrite).parquet(stateTmpPath.toString)
    if (fs.exists(statePath)) fs.delete(statePath, true)
    fs.rename(stateTmpPath, statePath)
  }

  def appendExceptions(ex: Dataset[ApplyOutcome]): Unit =
    ex.write.mode(SaveMode.Append).parquet(exceptionsPath)

  def loadExceptions(): Dataset[ApplyOutcome] =
    if (fs.exists(new Path(exceptionsPath)))
      // a replayed micro-batch (at-least-once) re-appends identical rows;
      // (key, seq) identifies an exception uniquely, so dedup on read
      spark.read.parquet(exceptionsPath).as[ApplyOutcome]
        .dropDuplicates("schema", "table", "pk", "lastSeq")
    else spark.emptyDataset[ApplyOutcome]

  /** Merge one parsed micro-batch into the snapshot with the distributed
    * apply; returns the new state size. Seeds are re-tagged as LOAD records
    * at seq 0 (below any change seq).
    */
  def mergeBatch(records: Dataset[CdcRecord]): Long = {
    val seeded = loadState().union(records)
    val outcomes = graft.cdc.CdcApply.run(spark, seeded)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      appendExceptions(outcomes.filter(_.kind == "exception"))
      val newState = outcomes.filter(_.kind == "state").map { o =>
        CdcRecord(0L, CdcParser.OpLoad, o.schema, o.table, o.pk, o.values)
      }
      saveState(newState)
      loadState().count()
    } finally outcomes.unpersist()
  }
}
