package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dump the FORMATTED executed plan of every Spark-SQL action a query key
  * launches — the evidence files for plan-shape claims about INTERNAL
  * phases (store writes, Lloyd-iteration collects, micro-batch bodies)
  * that the final-DataFrame `ExplainDump` cannot see because the key
  * returns a localCheckpoint'd result whose plan is a bare RDD scan.
  *
  * Mechanism: a [[QueryExecutionListener]] sees the [[QueryExecution]] of
  * every Dataset action (collect / save / saveAsTable …) with its wall
  * time; each is appended to `<outDir>/<key>.txt` in execution order. The
  * listener API is stable across the rounds being compared, so the SAME
  * tool runs unmodified on an older commit (git worktree) to produce
  * `_before` files and on HEAD for `_after`.
  *
  * For the IVF lifecycle keys the final serve plan never fires a listener
  * event (the key materializes via localCheckpoint), so the serve plan is
  * additionally captured through `ivfIndexServeOnly`'s `inspect` hook.
  *
  * Usage: `runMain graft.tools.PhasePlanDump <outDir> [sfDir] [k1,k2,...]`
  */
object PhasePlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/graft_phase_plans")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val keys = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "q_similarity_index_delete", "q_similarity_index_delete_cell",
      "q_similarity_index_serve", "q_stream_similarity_serve",
      "q_stream_ingest_dedup", "q_stream_curate", "q_similarity_ann_ivf"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val sink = new java.util.concurrent.atomic.AtomicReference[java.io.PrintWriter](null)
    val seq = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      private def dump(funcName: String, qe: QueryExecution): Unit = {
        val w = sink.get()
        if (w != null) w.synchronized {
          val n = seq.incrementAndGet()
          w.println(s"==== action $n: $funcName ====")
          w.println(qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          w.flush()
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        dump(funcName, qe)
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
        dump(s"$funcName (FAILED)", qe)
    }
    spark.listenerManager.register(listener)

    keys.foreach { key =>
      val fn = SparkEntryLookup(key)
      val w = new java.io.PrintWriter(new java.io.FileWriter(s"$outDir/$key.txt"))
      sink.set(w); seq.set(0)
      try fn(spark, sfDir) catch {
        case e: Throwable => w.println(s"==== KEY FAILED: ${e.getMessage} ====")
      }
      // The listener bus is async: quiesce by polling the dump counter
      // until it is stable for 1 s (≤ 10 s), instead of a fixed sleep a
      // straggler could outlive (round-21 ADVICE), and record the final
      // action count as a trailing line so an incomplete dump is visible
      // in the evidence file itself rather than silent.
      var stableMs = 0
      var waitedMs = 0
      var last = seq.get()
      while (stableMs < 1000 && waitedMs < 10000) {
        Thread.sleep(100); waitedMs += 100
        val now = seq.get()
        if (now == last) stableMs += 100 else { stableMs = 0; last = now }
      }
      w.println(s"==== end of $key: $last actions dumped ====")
      sink.set(null)
      w.close()
      println(s"[phaseplan] $key -> $outDir/$key.txt ($last actions)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    // the lifecycle keys' final serve plan (never an action of its own —
    // the key checkpoints it): captured via the inspect hook on a store
    // with the delete key's tombstones in place
    if (keys.exists(_.startsWith("q_similarity_index"))) {
      import spark.implicits._
      val P = graft.queries.PipelineQueries
      val w = new java.io.PrintWriter(new java.io.FileWriter(s"$outDir/serve_plans.txt"))
      def servePlan(label: String, store: String, cap: Long): Unit = {
        var plan = ""
        P.ivfIndexServeOnly(spark, sfDir, store,
          inspect = df => plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
          tombBroadcastCap = cap)
        w.println(s"==== $label ===="); w.println(plan); w.flush()
      }
      val a = java.nio.file.Files.createTempDirectory("phaseplan_ivf").toString
      try {
        P.ivfIndexBuild(spark, sfDir, a)
        P.ivfIndexAppend(spark, sfDir, a)
        servePlan("serve, no tombstones", a, P.TombstoneBroadcastCapBytes)
        val doomed = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select($"vec_id").filter($"vec_id" % 10 === 3)
        P.ivfIndexDeleteCellAligned(spark, a, delId = 1L, doomed)
        servePlan("serve, cell-aligned tombstones, broadcast arm", a, P.TombstoneBroadcastCapBytes)
        servePlan("serve, cell-aligned tombstones, forced shuffle arm (cap=0)", a, 0L)
      } finally graft.util.Fs.deleteRecursively(a)
      w.close()
      println(s"[phaseplan] serve plans -> $outDir/serve_plans.txt")
    }
    spark.stop()
  }

  /** Indirection kept trivial so this file compiles unchanged on older
    * commits: the registry lookup is the only repo API it needs. */
  private object SparkEntryLookup {
    def apply(key: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
      graft.SparkEntry.queries(key)
  }
}
