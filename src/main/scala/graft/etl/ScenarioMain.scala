package graft.etl

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.schema.{SelectionRule, SelectionRules}

/** Runnable replication scenario — the engine-native analog of the
  * reference's `make run` / run.py driver: full-load task, then CDC task over
  * the golden change files, printing consumed events and the statistics
  * report. Usage: `sbt "runMain graft.etl.ScenarioMain"`.
  */
object ScenarioMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-scenario")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft-scenario-src")
    ReferenceFixtures.fullLoadCsvs.foreach { case (table, body) =>
      val dir = root.resolve(s"hr/$table")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"LOAD_$table.csv"), body)
    }

    // --- E1: full load ------------------------------------------------------
    val flSink = new MemoryEventSink
    val fl = new TaskRunner(spark, SelectionRules.referenceTables,
      Seq(SelectionRule("%", "%", "include")), flSink)
    fl.runFullLoad(root.toString)
    println(s"[full-load] events=${flSink.size} (expect 16)")
    flSink.iterator(limit = 50).flatten.foreach(e =>
      println(s"  seq=${e.seqNo} pk=${e.partitionKey} ${e.envelope.take(120)}"))
    println("[full-load] table statistics:")
    fl.tableStatistics().show(truncate = false)

    // --- E2: CDC ------------------------------------------------------------
    val cdcDir = Files.createTempDirectory("graft-scenario-cdc")
    val ckpt = Files.createTempDirectory("graft-scenario-ckpt")
    val cdcSink = new MemoryEventSink
    val cdc = new TaskRunner(spark, SelectionRules.referenceTables,
      Seq(SelectionRule("%", "%", "include")), cdcSink)
    val q = cdc.startCdc(cdcDir.toString, ckpt.toString)
    Files.writeString(cdcDir.resolve("cdc0000000001.csv"), ReferenceFixtures.cdcFile1)
    Thread.sleep(100)
    Files.writeString(cdcDir.resolve("cdc0000000002.csv"), ReferenceFixtures.cdcFile2)
    q.processAllAvailable()
    q.stop()
    println(s"[cdc] events=${cdcSink.size} (expect 15)")
    cdcSink.all.foreach(e =>
      println(s"  seq=${e.seqNo} pk=${e.partitionKey} ${e.envelope.take(140)}"))
    println(s"[cdc] final state: ${cdc.currentState.map(r => s"${r.schema}.${r.table}#${r.pk}=${r.values.mkString("|")}")}")
    println(s"[cdc] apply exceptions: ${cdc.exceptions.map(e => s"${e.table}#${e.pk}: ${e.error}")}")
    println("[cdc] table statistics:")
    cdc.tableStatistics().show(truncate = false)

    spark.stop()
  }
}
