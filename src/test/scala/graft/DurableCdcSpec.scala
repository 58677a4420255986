package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.CdcParser
import graft.etl._
import graft.schema.{SelectionRule, SelectionRules}

/** Durable CDC state: distributed parquet-snapshot merge per batch, restart
  * recovery, idempotent state under batch replay.
  */
class DurableCdcSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def runner(stateDir: String, sink: EventSink = new MemoryEventSink) =
    new TaskRunner(spark, SelectionRules.referenceTables,
      Seq(SelectionRule("%", "%", "include")), sink, Some(stateDir))

  private def batchOf(body: String, fileSeq: Long) =
    CdcParser.parseLines(body.linesIterator.toSeq)
      .map(r => r.copy(seq = fileSeq * 1000000L + r.seq))

  test("restarted runner resumes from the committed snapshot") {
    val dir = Files.createTempDirectory("graft-durable").toString
    val st = new DurableCdcState(spark, dir)
    import spark.implicits._

    // batch 1 (cdc file 1): net-empty employee
    st.mergeBatch(spark.createDataset(batchOf(ReferenceFixtures.cdcFile1, 1)))
    assert(st.loadState().count() == 0)

    // "crash": brand-new state handle on the same dir — batch 2 applies on top
    val st2 = new DurableCdcState(spark, dir)
    st2.mergeBatch(spark.createDataset(batchOf(ReferenceFixtures.cdcFile2, 2)))
    val state = st2.loadState().collect()
    assert(state.map(r => (r.schema, r.table, r.pk)).toSeq == Seq(("hr", "department", "204")))
    val ex = st2.loadExceptions().collect()
    assert(ex.map(e => (e.table, e.pk)).toSeq == Seq(("department", "301")))
  }

  test("state snapshot is idempotent under batch replay (at-least-once)") {
    val dir = Files.createTempDirectory("graft-replay").toString
    val st = new DurableCdcState(spark, dir)
    import spark.implicits._
    val b = batchOf(ReferenceFixtures.cdcFile2, 2)
    st.mergeBatch(spark.createDataset(b))
    val first = st.loadState().collect().map(r => (r.pk, r.values)).toSet
    st.mergeBatch(spark.createDataset(b)) // replayed micro-batch
    val second = st.loadState().collect().map(r => (r.pk, r.values)).toSet
    assert(first == second)
    // replayed identical exceptions dedup on read: the delete-missing-301
    // from the original batch appears exactly once (the replay also logs a
    // legitimate duplicate-insert artifact for 204 — full-row-image replays
    // keep STATE exact; the exception log records what each apply attempt saw)
    val ex = st.loadExceptions().collect()
    assert(ex.count(e => e.table == "department" && e.pk == "301") == 1)
  }

  test("mid-stream crash: restarted STREAMING query replays from the checkpoint exactly once") {
    // The adversarial form of the restart tests above: kill the actual CDC
    // streaming query between micro-batches (file 1 committed to the
    // checkpoint, file 2 not yet arrived), then restart the task — new
    // runner, new sink, same checkpoint + durable state — and feed file 2.
    // run.py:79-104 semantics: the resumed task must process file 2 ONLY
    // (no re-emission, no re-apply of file 1), and the union of both
    // processes' emissions must be the exact 15-event CDC golden with the
    // exception row intact.
    val cdcDir = Files.createTempDirectory("graft-cdc-crash")
    val ckpt = Files.createTempDirectory("graft-ckpt-crash")
    val stateDir = Files.createTempDirectory("graft-state-crash").toString
    def opOf(e: EventRecord): String =
      "\"operation\":\"([^\"]+)\"".r.findFirstMatchIn(e.envelope).map(_.group(1)).get
    def txnOf(e: EventRecord): Long =
      "\"transaction-id\":(\\d+)".r.findFirstMatchIn(e.envelope).map(_.group(1).toLong).getOrElse(-1L)

    val sink1 = new MemoryEventSink
    val r1 = runner(stateDir, sink1)
    val q1 = r1.startCdc(cdcDir.toString, ckpt.toString)
    try {
      Files.writeString(cdcDir.resolve("cdc0000000001.csv"), ReferenceFixtures.cdcFile1)
      q1.processAllAvailable()
    } finally q1.stop() // crash between micro-batches: file 1 is committed
    assert(sink1.all.size == 8, s"pre-crash: 4 controls + 4 data, got ${sink1.all.size}")

    // file 2 arrives while the task is down
    Files.writeString(cdcDir.resolve("cdc0000000002.csv"), ReferenceFixtures.cdcFile2)

    val sink2 = new MemoryEventSink
    val r2 = runner(stateDir, sink2)
    val q2 = r2.startCdc(cdcDir.toString, ckpt.toString, emitStartControls = false)
    try q2.processAllAvailable() finally q2.stop()

    // exactly-once across the restart: the resumed query emitted file 2's 7
    // data events and NOTHING from file 1 (transaction ids carry the file seq)
    assert(sink2.all.size == 7, s"resume must emit only file 2, got ${sink2.all.map(opOf)}")
    assert(sink2.all.forall(e => txnOf(e) >= 2000000L),
      s"resume re-emitted file-1 events: ${sink2.all.map(txnOf)}")

    // the union is the exact 15-event golden: 4 create + 4 insert + 3 update
    // + 4 delete, no duplicates (transaction ids of data events all distinct)
    val union = sink1.all ++ sink2.all
    assert(union.size == 15)
    val byOp = union.groupBy(opOf).view.mapValues(_.size).toMap
    assert(byOp == Map("create-table" -> 4, "insert" -> 4, "update" -> 3, "delete" -> 4))
    val dataIds = union.filter(e => opOf(e) != "create-table").map(txnOf)
    assert(dataIds.distinct.size == 11, s"duplicate data events: $dataIds")

    // durable state converged to the golden: department 204 survives, and
    // the delete-on-missing-301 exception row is intact, exactly once
    assert(r2.currentState.map(r => (r.schema, r.table, r.pk)) ==
      Seq(("hr", "department", "204")))
    assert(r2.exceptions.map(e => (e.table, e.pk)) == Seq(("department", "301")))
  }

  test("TaskRunner in durable mode survives a restart mid-stream") {
    val dir = Files.createTempDirectory("graft-tr-durable").toString
    val r1 = runner(dir)
    r1.processCdcBatchRecords(batchOf(ReferenceFixtures.cdcFile1, 1))
    // new runner (fresh JVM analog) on the same state dir
    val r2 = runner(dir)
    r2.processCdcBatchRecords(batchOf(ReferenceFixtures.cdcFile2, 2))
    assert(r2.currentState.map(r => (r.schema, r.table, r.pk)) ==
      Seq(("hr", "department", "204")))
    assert(r2.exceptions.map(e => (e.table, e.pk)) == Seq(("department", "301")))
  }
}
