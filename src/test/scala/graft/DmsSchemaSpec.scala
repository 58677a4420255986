package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

class DmsSchemaSpec extends AnyFunSuite {

  test("DMS ColumnType → Spark type mapping (full public domain)") {
    assert(DmsTypes.toSpark("INT1") == ByteType)
    assert(DmsTypes.toSpark("INT2") == ShortType)
    assert(DmsTypes.toSpark("INT4") == IntegerType)
    assert(DmsTypes.toSpark("INT8") == LongType)
    assert(DmsTypes.toSpark("UINT1") == ShortType)
    assert(DmsTypes.toSpark("UINT2") == IntegerType)
    assert(DmsTypes.toSpark("UINT4") == LongType)
    assert(DmsTypes.toSpark("UINT8") == DecimalType(20, 0))
    assert(DmsTypes.toSpark("NUMERIC", Some(10), Some(2)) == DecimalType(10, 2))
    assert(DmsTypes.toSpark("REAL4") == FloatType)
    assert(DmsTypes.toSpark("REAL8") == DoubleType)
    assert(DmsTypes.toSpark("STRING") == StringType)
    assert(DmsTypes.toSpark("BLOB") == BinaryType)
    assert(DmsTypes.toSpark("CLOB") == StringType)
    assert(DmsTypes.toSpark("BOOLEAN") == BooleanType)
    assert(DmsTypes.toSpark("DATE") == DateType)
    assert(DmsTypes.toSpark("DATETIME") == TimestampType)
    assert(DmsTypes.toSpark("TIME") == StringType)
    assertThrows[IllegalArgumentException](DmsTypes.toSpark("NOPE"))
  }

  test("reference ExternalTableDefinition parses to the declared registry") {
    val tables = SelectionRules.referenceTables
    assert(tables.map(_.name) == Seq("employee", "department", "project"))
    val emp = tables.head
    assert(emp.owner == "hr")
    assert(emp.path == "hr/employee/")
    assert(emp.qualifiedName == "hr.employee")
    assert(emp.pkColumns == Seq("Id"))
    assert(emp.structType == StructType(Seq(
      StructField("Id", LongType, nullable = false),
      StructField("LastName", StringType),
      StructField("FirstName", StringType),
      StructField("HireDate", TimestampType),
      StructField("OfficeLocation", StringType))))
    assert(tables(1).columns.map(_.name) == Seq("Id", "DepartmentName"))
    assert(tables(2).columns.map(_.name) == Seq("Id", "ProjectName", "ProjectDescription"))
  }

  test("selection rules: % wildcards, include/exclude, first-match-wins") {
    val tables = SelectionRules.referenceTables
    val all = SelectionRules.select(tables, Seq(SelectionRule("%", "%", "include")))
    assert(all.size == 3)
    val none = SelectionRules.select(tables, Seq(SelectionRule("other", "%", "include")))
    assert(none.isEmpty)
    val onlyDep = SelectionRules.select(tables, Seq(SelectionRule("hr", "dep%", "include")))
    assert(onlyDep.map(_.name) == Seq("department"))
    val excludeFirst = SelectionRules.select(tables, Seq(
      SelectionRule("%", "employee", "exclude"),
      SelectionRule("%", "%", "include")))
    assert(excludeFirst.map(_.name) == Seq("department", "project"))
    // `_` single-char wildcard; regex metachars in names are literal
    assert(SelectionRules.matches("emplo_ee", "employee"))
    assert(!SelectionRules.matches("emplo_ee", "emploXXee"))
    assert(SelectionRules.matches("a.b", "a.b"))
    assert(!SelectionRules.matches("a.b", "aXb"))
  }
}
