package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl._
import graft.schema.{SelectionRule, SelectionRules}

class ShardedSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("per-partition-key order survives sharding; nothing is lost") {
    val sink = new ShardedEventSink(3)
    val keys = Seq("hr.employee", "hr.department", "hr.project", "dms.x")
    val sent = (0 until 100).map(i => (keys(i % keys.size), s"env-$i"))
    sent.grouped(7).foreach(g => sink.append(g))

    val all = sink.all
    assert(all.size == 100)
    // per key: envelope payloads appear in exactly the append order
    keys.foreach { k =>
      val gotten = all.filter(_.partitionKey == k).sortBy(_.seqNo).map(_.envelope)
      val expected = sent.filter(_._1 == k).map(_._2)
      assert(gotten == expected, s"order broken for $k")
    }
    // a key lives on exactly one shard
    keys.foreach { k =>
      val shardsWithKey = (0 until 3).count(i => sink.shard(i).all.exists(_.partitionKey == k))
      assert(shardsWithKey == 1)
    }
  }

  test("full-load through a sharded sink keeps the 16-event golden content") {
    val root = java.nio.file.Files.createTempDirectory("graft-shard-fl")
    ReferenceFixtures.fullLoadCsvs.foreach { case (table, body) =>
      val dir = root.resolve(s"hr/$table")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("LOAD1.csv"), body)
    }
    val sink = new ShardedEventSink(2)
    new TaskRunner(spark, SelectionRules.referenceTables,
      Seq(SelectionRule("%", "%", "include")), sink).runFullLoad(root.toString)
    assert(sink.all.size == 16)
    // each table's 2 controls + loads are in order on its shard
    val emp = sink.all.filter(_.partitionKey == "hr.employee").sortBy(_.seqNo)
    assert(emp.size == 6)
    assert(emp.head.envelope.contains("drop-table"))
    assert(emp(1).envelope.contains("create-table"))
  }
}
