package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One parsed CDC change row.
  *
  * Reference grammar (lib/query.py:16-27): each line of a `cdc*.csv` file is
  * `OP,<table>,<schema>,v1,...,vn` — note the order is op, **table**, schema —
  * with variable arity per target table (full row image; v1 is the PK value
  * for every reference table). `seq` is the global apply order: file sequence
  * number × row position (single-shard total order, stack.py:268).
  */
final case class CdcRecord(
    seq: Long,
    op: String,      // INSERT | UPDATE | DELETE (LOAD used internally for seeding)
    schema: String,
    table: String,
    pk: String,
    values: Seq[String]
)

object CdcParser {
  val OpInsert = "INSERT"
  val OpUpdate = "UPDATE"
  val OpDelete = "DELETE"
  val OpLoad = "LOAD" // internal: full-load seed rows, seq < any change seq

  /** Schema-change marker (include_table_alter_operations, stack.py:124):
    * `ALTER-TABLE,<table>,<schema>[,<ddl...>]`. Synthesized as an alter-table
    * CONTROL envelope by the runner; never enters the row-apply fold.
    */
  val OpAlterTable = "ALTER-TABLE"

  /** Parse one raw line at a given global sequence number. Lines must be read
    * as text, not fixed-schema CSV — arity varies within one file
    * (lib/query.py:21-27 mixes 5- and 8-field rows).
    */
  def parseLine(seq: Long, line: String): CdcRecord = {
    val parts = line.split(",", -1).map(_.trim)
    require(parts.length >= 3, s"malformed CDC row (need >=3 fields): $line")
    val op = parts(0).toUpperCase
    if (op == OpAlterTable)
      // DDL marker: no PK/row image; remaining fields are the DDL text
      CdcRecord(seq, op, parts(2), parts(1),
        if (parts.length > 3) parts(3) else "", parts.drop(3).toSeq)
    else {
      require(parts.length >= 4, s"malformed CDC row (need >=4 fields): $line")
      CdcRecord(seq, op, parts(2), parts(1), parts(3), parts.drop(3).toSeq)
    }
  }

  /** Parse an ordered collection of raw lines (already in file × row order). */
  def parseLines(lines: Seq[String]): Seq[CdcRecord] =
    lines.zipWithIndex.collect {
      case (l, i) if l.trim.nonEmpty => parseLine(i + 1L, l)
    }

  /** Distributed parse of a DataFrame of (seq, line). Used by the streaming
    * task runner, where seq is derived from (file sequence, row index) so the
    * single-shard total order survives Spark's parallel read.
    */
  def parse(spark: SparkSession, df: DataFrame): Dataset[CdcRecord] = {
    import spark.implicits._
    df.as[(Long, String)].map { case (seq, line) => parseLine(seq, line) }
  }
}
