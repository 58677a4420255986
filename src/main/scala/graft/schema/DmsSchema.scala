package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** DMS-style external table definitions.
  *
  * The reference declares its source schemas out-of-band as an
  * `ExternalTableDefinition` JSON document attached to the S3 source endpoint
  * (reference: dms_sample/stack.py:131-169, stack.py:178). Columns are
  * positional (headerless CSV), carry a DMS `ColumnType`, optional length,
  * nullability and PK flags. We model that declaration natively and map it to
  * a Spark `StructType`.
  */
final case class ColumnDef(
    name: String,
    dmsType: String,
    length: Option[Int] = None,
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    nullable: Boolean = true,
    isPk: Boolean = false
) {
  def sparkType: DataType = DmsTypes.toSpark(dmsType, precision, scale)
  def toStructField: StructField = StructField(name, sparkType, nullable)
}

final case class TableDef(
    name: String,
    path: String,
    owner: String,
    columns: Seq[ColumnDef]
) {
  /** Fully-qualified `schema.table` id — also the envelope partition key
    * (reference: stack.py:123,126 partition_include_schema_table). */
  def qualifiedName: String = s"$owner.$name"
  def structType: StructType = StructType(columns.map(_.toStructField))
  def pkColumns: Seq[String] = columns.filter(_.isPk).map(_.name)
}

/** Full DMS ColumnType → Spark DataType mapping (public AWS
  * ExternalTableDefinition spec). The reference exercises only INT8, STRING
  * and DATETIME (stack.py:138-166); the rest are implemented for
  * exhaustiveness and unit-tested.
  */
object DmsTypes {
  def toSpark(dmsType: String, precision: Option[Int] = None, scale: Option[Int] = None): DataType =
    dmsType.toUpperCase match {
      case "INT1"                => ByteType
      case "INT2"                => ShortType
      case "INT4"                => IntegerType
      case "INT8"                => LongType // DMS INTn = n *bytes*
      case "UINT1"               => ShortType // unsigned → next wider signed
      case "UINT2"               => IntegerType
      case "UINT4"               => LongType
      case "UINT8"               => DecimalType(20, 0)
      case "NUMERIC"             => DecimalType(precision.getOrElse(38), scale.getOrElse(0))
      case "REAL4"               => FloatType
      case "REAL8"               => DoubleType
      case "STRING" | "CLOB"     => StringType
      case "BLOB" | "BYTES"      => BinaryType
      case "BOOLEAN"             => BooleanType
      case "DATE"                => DateType
      case "DATETIME"            => TimestampType
      case "TIME"                => StringType
      case other =>
        throw new IllegalArgumentException(s"unsupported DMS ColumnType: $other")
    }
}

/** Parser for the ExternalTableDefinition JSON (structure per
  * stack.py:131-169: TableCount / Tables / TableColumns / TableColumnsTotal).
  */
object ExternalTableDefinition {
  def parse(json: String): Seq[TableDef] = {
    val root = JsonMethods.parse(json)
    (root \ "Tables") match {
      case JArray(tables) => tables.map(parseTable)
      case _              => Seq.empty
    }
  }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case JInt(i)    => Some(i.toString)
    case _          => None
  }

  private def parseTable(t: JValue): TableDef = {
    val cols = (t \ "TableColumns") match {
      case JArray(cs) =>
        cs.map { c =>
          ColumnDef(
            name = str(c \ "ColumnName").getOrElse(""),
            dmsType = str(c \ "ColumnType").getOrElse("STRING"),
            length = str(c \ "ColumnLength").map(_.toInt),
            precision = str(c \ "ColumnPrecision").map(_.toInt),
            scale = str(c \ "ColumnScale").map(_.toInt),
            nullable = !str(c \ "ColumnNullable").contains("false"),
            isPk = str(c \ "ColumnIsPk").contains("true")
          )
        }
      case _ => Seq.empty
    }
    TableDef(
      name = str(t \ "TableName").getOrElse(""),
      path = str(t \ "TablePath").getOrElse(""),
      owner = str(t \ "TableOwner").getOrElse(""),
      columns = cols
    )
  }
}

/** Wildcard table-selection rules (reference: stack.py:65-78). `%` matches
  * any sequence, `_` any single char — SQL LIKE semantics applied to the
  * table registry before replication (coarse partition pruning: unselected
  * tables are never scanned).
  */
final case class SelectionRule(
    schemaPattern: String,
    tablePattern: String,
    action: String // "include" | "exclude"
)

object SelectionRules {
  private def likeToRegex(p: String): String =
    p.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+-?^$|".contains(c) => "\\" + c
      case c => c.toString
    }

  def matches(pattern: String, value: String): Boolean =
    value.matches(likeToRegex(pattern))

  /** Apply rules in order; first matching rule wins; default exclude (DMS
    * semantics: a table replicates only if some include rule selects it and
    * no earlier exclude rule dropped it). */
  def select(tables: Seq[TableDef], rules: Seq[SelectionRule]): Seq[TableDef] =
    tables.filter { t =>
      rules
        .find(r => matches(r.schemaPattern, t.owner) && matches(r.tablePattern, t.name))
        .exists(_.action == "include")
    }

  /** The reference's table registry (stack.py:131-169), re-declared. */
  val referenceDefinitionJson: String =
    """{
      |  "TableCount": "3",
      |  "Tables": [
      |    {"TableName": "employee", "TablePath": "hr/employee/", "TableOwner": "hr",
      |     "TableColumns": [
      |       {"ColumnName": "Id", "ColumnType": "INT8", "ColumnNullable": "false", "ColumnIsPk": "true"},
      |       {"ColumnName": "LastName", "ColumnType": "STRING", "ColumnLength": "20"},
      |       {"ColumnName": "FirstName", "ColumnType": "STRING", "ColumnLength": "30"},
      |       {"ColumnName": "HireDate", "ColumnType": "DATETIME"},
      |       {"ColumnName": "OfficeLocation", "ColumnType": "STRING", "ColumnLength": "20"}],
      |     "TableColumnsTotal": "5"},
      |    {"TableName": "department", "TablePath": "hr/department/", "TableOwner": "hr",
      |     "TableColumns": [
      |       {"ColumnName": "Id", "ColumnType": "INT8", "ColumnNullable": "false", "ColumnIsPk": "true"},
      |       {"ColumnName": "DepartmentName", "ColumnType": "STRING", "ColumnLength": "50"}],
      |     "TableColumnsTotal": "2"},
      |    {"TableName": "project", "TablePath": "hr/project/", "TableOwner": "hr",
      |     "TableColumns": [
      |       {"ColumnName": "Id", "ColumnType": "INT8", "ColumnNullable": "false", "ColumnIsPk": "true"},
      |       {"ColumnName": "ProjectName", "ColumnType": "STRING", "ColumnLength": "50"},
      |       {"ColumnName": "ProjectDescription", "ColumnType": "STRING", "ColumnLength": "100"}],
      |     "TableColumnsTotal": "3"}
      |  ]
      |}""".stripMargin

  def referenceTables: Seq[TableDef] = ExternalTableDefinition.parse(referenceDefinitionJson)
}
