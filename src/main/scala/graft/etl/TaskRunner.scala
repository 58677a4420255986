package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.{ApplyOutcome, CdcApply, CdcParser, CdcRecord}
import graft.schema.{SelectionRule, SelectionRules, TableDef}

/** Replication task lifecycle (reference O20): full-load batch job + CDC
  * streaming query, mirroring `start-replication` / `stop` / status
  * (run.py:79-104) on Spark primitives — a batch action for full load
  * (DMS full-load tasks self-stop, run.py:169) and a `StreamingQuery` for CDC
  * (runs until stopped, run.py:190,205-206).
  *
  * Scale notes: per-table loads are independent parallel scans; envelope
  * construction is a map-only `to_json` projection; the only ordered section
  * is the sink append, which mirrors the reference's 1-shard Kinesis bottleneck
  * by design (stack.py:268) — with N shards the `orderBy(seq)` becomes a
  * per-partition-key ordering and the collect disappears into foreachPartition.
  */
final class TaskRunner(
    spark: SparkSession,
    tables: Seq[TableDef],
    rules: Seq[SelectionRule],
    sink: EventSink,
    stateDir: Option[String] = None
) {
  import spark.implicits._

  private def selected: Seq[TableDef] = SelectionRules.select(tables, rules)

  private def nowIso(): String =
    java.time.Instant.now().toString

  /** Full-load task (E1, run.py:151-175): per selected table emit drop-table +
    * create-table controls then every source row as a `load` envelope.
    * Expected golden output for the reference fixtures: 16 events
    * (3 create + 3 drop + 10 load, README.md:77).
    */
  def runFullLoad(sourceRoot: String): Unit = {
    selected.foreach { t =>
      val ts = nowIso()
      sink.append(Seq(
        (t.qualifiedName, Envelope.controlJson("drop-table", t.owner, t.name, ts)),
        (t.qualifiedName, Envelope.controlJson("create-table", t.owner, t.name, ts))
      ))
      val rows = spark.read
        .schema(t.structType)
        .option("header", "false")
        .option("timestampFormat", "yyyy-MM-dd[ HH:mm:ss]")
        .csv(s"$sourceRoot/${t.path}")
      val envelopes = Envelope.forData(
        rows, t.owner, t.name,
        operation = lit("load"),
        timestamp = lit(ts),
        transactionId = lit(null).cast("long"))
      // Single-shard total order: the golden contract only fixes counts and
      // per-table grouping; PK order keeps the dump deterministic.
      envelopes
        .orderBy($"envelope")
        .collect()
        .foreach(r => sink.append(Seq((r.getString(0), r.getString(2)))))
    }
  }

  /** DMS `migration_type="full-load-and-cdc"`: run the full load (controls +
    * load envelopes) AND seed the apply state with the loaded rows as
    * seq-0 LOAD images, so a subsequent CDC stream applies on top of them
    * (UPDATE/DELETE of a loaded PK is then valid, INSERT of one excepts).
    * The reference deploys the two task types separately (stack.py:87,98);
    * this is the combined public DMS mode.
    */
  def runFullLoadAndSeedCdc(sourceRoot: String): Unit = {
    runFullLoad(sourceRoot)
    val seeds = selected.flatMap { t =>
      spark.read
        .schema(t.structType)
        .option("header", "false")
        .option("timestampFormat", "yyyy-MM-dd[ HH:mm:ss]")
        .csv(s"$sourceRoot/${t.path}")
        .collect()
        .map { row =>
          val values = t.columns.indices.map { i =>
            val v = row.get(i)
            if (v == null) null
            else v match {
              case ts: java.sql.Timestamp =>
                // keep the CSV lexical form for date-valued timestamps
                val s = ts.toString
                if (s.endsWith(" 00:00:00.0")) s.dropRight(11) else s
              case other => other.toString
            }
          }
          CdcRecord(0L, CdcParser.OpLoad, t.owner, t.name, values.head, values)
        }
    }
    applyBatch(seeds)
  }

  // ---- CDC -----------------------------------------------------------------

  /** Current applied state (full row images per surviving PK) and accumulated
    * apply exceptions. Kept as plain Datasets checkpointed per batch — the
    * merge-on-read shape; a real deployment would persist these as table
    * formats. LOAD-seeded records carry seq below any change seq.
    */
  @volatile private var stateRecords: Seq[CdcRecord] = Seq.empty
  @volatile private var exceptionLog: Seq[ApplyOutcome] = Seq.empty

  /** Durable, distributed state (parquet snapshot + exception log) when a
    * stateDir is configured; a restarted runner on the same dir resumes from
    * the committed snapshot. In-memory otherwise (tests, ephemeral replays).
    */
  private val durable: Option[DurableCdcState] =
    stateDir.map(d => new DurableCdcState(spark, d))

  def currentState: Seq[CdcRecord] = durable match {
    case Some(st) => st.loadState().collect().toSeq
      .sortBy(r => (r.schema, r.table, r.pk))
    case None => stateRecords
  }
  def exceptions: Seq[ApplyOutcome] = durable match {
    case Some(st) => st.loadExceptions().collect().toSeq.sortBy(_.lastSeq)
    case None => exceptionLog
  }

  /** Emit CDC start controls: create-table per selected table + the DMS
    * internal awsdms_apply_exceptions table (README.md:84 — "3 create +
    * 1 for awsdms_apply_exceptions").
    */
  private def emitCdcStartControls(): Unit = {
    val ts = nowIso()
    selected.foreach { t =>
      sink.append(Seq((t.qualifiedName, Envelope.controlJson("create-table", t.owner, t.name, ts))))
    }
    sink.append(Seq(("dms.awsdms_apply_exceptions",
      Envelope.controlJson("create-table", "dms", "awsdms_apply_exceptions", ts))))
  }

  /** Apply one micro-batch of raw CDC lines (already enveloped+emitted) to the
    * running state. Batch is the parsed record set in seq order.
    */
  private def applyBatch(records: Seq[CdcRecord]): Unit = synchronized {
    durable match {
      case Some(st) =>
        st.mergeBatch(spark.createDataset(records))
      case None =>
        val outcomes = CdcApply.runLocal(stateRecords ++ records)
        stateRecords = outcomes.filter(_.kind == "state").map { o =>
          CdcRecord(0L, CdcParser.OpLoad, o.schema, o.table, o.pk, o.values)
        }
        exceptionLog = exceptionLog ++ outcomes.filter(_.kind == "exception")
    }
  }

  private val txnCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Process one micro-batch DataFrame of (file, value) text rows: order by
    * (file seq × line index), parse, emit one envelope per op
    * (include_transaction_details, stack.py:125), then apply.
    */
  private[etl] def processCdcBatch(batch: DataFrame): Unit = {
    // zipWithIndex is deterministic in partition order, and text-source
    // partitions are byte-offset ordered — (fileSeq, index) is the reference's
    // file-sequence × row order (SURVEY §7 ordering risk).
    val lines: Seq[(Long, String)] = batch
      .select(input_file_name().as("f"), col("value"))
      .rdd
      .zipWithIndex()
      .map(TaskRunner.sequenceLine)
      .collect()
      .toSeq
      .sortBy(_._1)
    if (lines.isEmpty) return
    val records = lines
      .filter(_._2.trim.nonEmpty)
      .map { case (seq, line) => CdcParser.parseLine(seq, line) }
    processCdcBatchRecords(records)
  }

  /** Apply an already-parsed, already-sequenced record batch: emit envelopes
    * then merge into state. (The streaming path funnels here via
    * processCdcBatch; also the direct API for replays.)
    */
  def processCdcBatchRecords(records: Seq[CdcRecord]): Unit = {
    val ts = nowIso()
    val events = records.map { r =>
      val txn = txnCounter.incrementAndGet()
      val t = selected.find(t => t.name == r.table && t.owner == r.schema)
      val fields = t match {
        case Some(td) =>
          td.columns.map(_.name).zip(r.values).map { case (n, v) => s""""$n":${jsonValue(v)}""" }
        case None =>
          r.values.zipWithIndex.map { case (v, i) => s""""col${i + 1}":${jsonValue(v)}""" }
      }
      val dataJson = fields.mkString("{", ",", "}")
      val env =
        s"""{"data":$dataJson,"metadata":{"timestamp":"$ts","record-type":"data","operation":"${r.op.toLowerCase}","partition-key-type":"schema-table","schema-name":"${r.schema}","table-name":"${r.table}","transaction-id":$txn}}"""
      (s"${r.schema}.${r.table}", env)
    }
    sink.append(events)
    applyBatch(records)
  }

  private def jsonValue(v: String): String =
    if (v == null) "null"
    else if (v.matches("-?\\d+")) v
    else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Start the CDC task: controls first (task starts before data exists,
    * run.py:189-190), then tail `cdcPath` one file per trigger to preserve
    * the change order.
    */
  def startCdc(cdcPath: String, checkpointDir: String): StreamingQuery = {
    emitCdcStartControls()
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(cdcPath)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .foreachBatch { (batch: DataFrame, _: Long) => processCdcBatch(batch) }
      .start()
  }

  /** The `awsdms_apply_exceptions` table as a DataFrame — DMS materializes
    * apply failures as rows of this control table (its create-table event is
    * part of the CDC golden, README.md:84); columns follow the public DMS
    * layout (TASK_NAME/TABLE_OWNER/TABLE_NAME/ERROR_TIME/STATEMENT/ERROR).
    */
  def applyExceptionsTable(taskName: String = "graft-cdc"): DataFrame = {
    val rows = exceptions.map { e =>
      (taskName, e.schema, e.table,
        new java.sql.Timestamp(System.currentTimeMillis()),
        s"${e.values.mkString(",")}", e.error)
    }
    spark.createDataset(rows)
      .toDF("TASK_NAME", "TABLE_OWNER", "TABLE_NAME", "ERROR_TIME", "STATEMENT", "ERROR")
  }

  /** Table statistics (O15/O16): per-(schema, table) operation counters over
    * everything emitted so far, sorted by (SchemaName, TableName) — the
    * describe_table_statistics report (run.py:141-148).
    */
  def tableStatistics(): DataFrame = {
    val events = sink.all.map(e => (e.partitionKey, e.envelope))
    val df = spark.createDataset(events).toDF("partition_key", "envelope")
    val parsed = df.select(
      get_json_object($"envelope", "$.metadata.schema-name").as("schema_name"),
      get_json_object($"envelope", "$.metadata.table-name").as("table_name"),
      get_json_object($"envelope", "$.metadata.operation").as("operation"))
    parsed
      .groupBy($"schema_name", $"table_name")
      .agg(
        count(when($"operation" === "load", 1)).as("full_load_rows"),
        count(when($"operation" === "insert", 1)).as("inserts"),
        count(when($"operation" === "update", 1)).as("updates"),
        count(when($"operation" === "delete", 1)).as("deletes"),
        count(when($"operation".isin("create-table", "drop-table"), 1)).as("ddls"))
      .orderBy($"schema_name", $"table_name")
  }
}

object TaskRunner {
  /** Extract the file sequence from `cdcNNNNNNNNNN.csv` (run.py:193-195). */
  def fileSeq(path: String): Long = {
    val m = "(\\d+)".r.findAllIn(path.split("/").last).toSeq
    if (m.nonEmpty) m.last.toLong else 0L
  }

  /** Serializable line-sequencing closure: (row, partitionIdx) →
    * (fileSeq × 1e6 + lineIdx, line). Static so RDD closures don't capture
    * the runner (which holds the SparkSession and sink).
    */
  val sequenceLine: ((org.apache.spark.sql.Row, Long)) => (Long, String) = {
    case (r, i) => (fileSeq(r.getString(0)) * 1000000L + i, r.getString(1))
  }
}
