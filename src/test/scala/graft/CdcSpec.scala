package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._
import graft.etl.ReferenceFixtures

class CdcSpec extends AnyFunSuite {

  test("parser handles the reference grammar incl. variable arity") {
    val r = CdcParser.parseLine(1, "INSERT,employee,hr,101,Smith,Bob,2014-06-04,New York")
    assert(r == CdcRecord(1, "INSERT", "hr", "employee", "101",
      Seq("101", "Smith", "Bob", "2014-06-04", "New York")))
    val short = CdcParser.parseLine(2, "INSERT,department,hr,204,Software")
    assert(short.table == "department" && short.values == Seq("204", "Software"))
    // op, TABLE, schema order — not op, schema, table
    assert(short.schema == "hr")
    assertThrows[IllegalArgumentException](CdcParser.parseLine(3, "INSERT,employee"))
  }

  test("parseLines keeps file × row order and skips blanks") {
    val recs = CdcParser.parseLines(Seq("INSERT,a,s,1", "", "DELETE,a,s,1"))
    assert(recs.map(_.seq) == Seq(1L, 3L))
    assert(recs.map(_.op) == Seq("INSERT", "DELETE"))
  }

  test("golden: cdc file 1 nets to an empty employee table") {
    val recs = CdcParser.parseLines(ReferenceFixtures.cdcFile1.linesIterator.toSeq)
    val out = CdcApply.runLocal(recs)
    assert(out.count(_.kind == "state") == 0)
    assert(out.count(_.kind == "exception") == 0)
  }

  test("golden: both cdc files → only department 204 survives; 301 delete excepts") {
    val out = CdcApply.runLocal(CdcParser.parseLines(ReferenceFixtures.cdcLines))
    val state = out.filter(_.kind == "state")
    assert(state.map(s => (s.schema, s.table, s.pk)) == Seq(("hr", "department", "204")))
    assert(state.head.values == Seq("204", "Software"))
    val ex = out.filter(_.kind == "exception")
    assert(ex.map(e => (e.table, e.pk)) == Seq(("department", "301")))
    assert(ex.head.error.contains("delete for missing key"))
  }

  test("exception paths: update-missing, delete-missing, duplicate-insert") {
    val ops = CdcParser.parseLines(Seq(
      "UPDATE,t,s,1,a", // missing → exception
      "INSERT,t,s,1,b",
      "INSERT,t,s,1,c", // duplicate → exception, last image wins
      "DELETE,t,s,2,x" // missing → exception
    ))
    val out = CdcApply.runLocal(ops)
    assert(out.count(_.kind == "exception") == 3)
    val state = out.filter(_.kind == "state")
    assert(state.map(_.values) == Seq(Seq("1", "c")))
  }

  test("property: per-PK fold = last-op-wins; insensitive to input order (seeded random)") {
    val rnd = new scala.util.Random(42)
    val opsPool = Array("INSERT", "UPDATE", "DELETE")
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(12)
      val ops = Seq.fill(n)(opsPool(rnd.nextInt(3)))
      val recs = ops.zipWithIndex.map { case (op, i) =>
        CdcRecord(i + 1L, op, "s", "t", "1", Seq("1", s"v$i"))
      }
      val out = CdcApply.foldKey("s", "t", "1", recs)
      val state = out.filter(_.kind == "state")
      // independent model: sequential fold of full-row-image semantics
      var img: Option[Seq[String]] = None
      recs.foreach { r =>
        r.op match {
          case "INSERT" => img = Some(r.values)
          case "UPDATE" => if (img.isDefined) img = Some(r.values)
          case "DELETE" => img = None
        }
      }
      assert(state.map(_.values) == img.toSeq)
      // order-insensitivity: the fold sorts by seq
      val shuffled = rnd.shuffle(recs)
      assert(CdcApply.foldKey("s", "t", "1", shuffled) == out)
    }
  }
}
