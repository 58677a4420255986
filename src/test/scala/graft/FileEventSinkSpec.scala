package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.etl._
import graft.schema.{SelectionRule, SelectionRules}

class FileEventSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("append/read round-trip including escapes; restart resumes seq") {
    val dir = Files.createTempDirectory("graft-filesink").toString
    val sink = new FileEventSink(dir, shards = 2)
    val tricky = """{"data":{"s":"a\"b\\c","t":"x\ty"},"n":1}"""
    sink.append(Seq(("hr.employee", tricky), ("hr.department", "{}")))
    val got = sink.all
    assert(got.size == 2)
    assert(got.map(_.seqNo) == Seq(0L, 1L))
    assert(got.find(_.partitionKey == "hr.employee").get.envelope == tricky)

    // restart: new instance continues numbering and sees prior events
    val sink2 = new FileEventSink(dir, shards = 2)
    sink2.append(Seq(("hr.project", "{\"k\":2}")))
    val all = sink2.all
    assert(all.size == 3 && all.map(_.seqNo) == Seq(0L, 1L, 2L))
  }

  test("golden full load through the durable file sink") {
    val root = Files.createTempDirectory("graft-fs-fl")
    ReferenceFixtures.fullLoadCsvs.foreach { case (table, body) =>
      val d = root.resolve(s"hr/$table")
      Files.createDirectories(d)
      Files.writeString(d.resolve("LOAD1.csv"), body)
    }
    val dir = Files.createTempDirectory("graft-fs-sink").toString
    val sink = new FileEventSink(dir, shards = 1)
    new TaskRunner(spark, SelectionRules.referenceTables,
      Seq(SelectionRule("%", "%", "include")), sink).runFullLoad(root.toString)
    assert(sink.all.size == 16)
    // a fresh reader sees the same 16 committed events (durable)
    assert(new FileEventSink(dir, shards = 1).all.size == 16)
    // consumer operators work unchanged over the durable record set
    val projected = EventConsumer.project(spark, sink.all)
    assert(projected.where("operation = 'load'").count() == 10)
  }
}
