package graft

import org.scalatest.funsuite.AnyFunSuite

/** Session cache-lifetime gate (VERDICT r11): across a 144-query session
  * (bench/verify sweeps call every query fn, some several times), a
  * `persist()` that outlives its query fn accumulates MEMORY_AND_DISK
  * blocks for the SparkSession's lifetime — the failure mode that taxed one
  * mid-suite query 14× in round 4. Contract pinned here: every query fn
  * releases its persists before returning, via the
  * materialize-then-unpersist pattern (an eager `localCheckpoint` of the
  * small result, then `unpersist` of the corpus-sized intermediate).
  *
  * localCheckpoint blocks are excluded from the residue check: they are the
  * sanctioned materialization mechanism, they MUST outlive the fn (the
  * returned plan reads them — unpersisting a locally-checkpointed RDD
  * breaks it, since its lineage is truncated), and once the caller drops
  * the DataFrame the ContextCleaner reclaims them on GC. The spec still
  * unpersists them between keys so the sweep itself stays flat.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("no query fn leaves a persist() behind (localCheckpoint blocks excluded)") {
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val leaks = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val failure =
        try { fn(spark, sfDir); None }
        catch { case e: Throwable => Some(s"$name threw: ${e.getMessage}") }
      // isCheckpointed = materialized local/reliable checkpoint — the
      // query fns only use EAGER localCheckpoint, so anything persisted
      // and not checkpointed is a leaked cache
      val residue = sc.getPersistentRDDs.values
        .filter(!_.isCheckpointed).toSeq
      val verdict =
        if (failure.nonEmpty) failure
        else if (residue.nonEmpty)
          Some(s"$name left ${residue.size} persisted RDD(s): " +
            residue.map(r => s"id=${r.id} '${r.name}'").mkString(", "))
        else None
      // clean slate for the next key (checkpoint blocks of the discarded
      // result included — nothing will materialize it)
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      verdict
    }
    assert(leaks.isEmpty, s"${leaks.size} cache-lifetime leaks:\n${leaks.mkString("\n")}")
  }
}
