package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DMS-style Kinesis event envelope construction (reference operators O7/O9).
  *
  * Shape pinned by stack.py:117-127 (kinesis_settings) and the consumer at
  * run.py:133-138:
  * {{{
  * {"data": {col: val, ...},
  *  "metadata": {"timestamp": ..., "record-type": "data"|"control",
  *               "operation": "load"|"insert"|"update"|"delete"|
  *                            "create-table"|"drop-table",
  *               "partition-key-type": "schema-table",
  *               "schema-name": s, "table-name": t, "transaction-id": id}}
  * }}}
  * plus a partition key `"<schema>.<table>"` (partition_include_schema_table,
  * stack.py:126). Nulls and empty strings are retained in `data`
  * (include_null_and_empty, stack.py:122) — hence `ignoreNullFields=false`,
  * Spark's `to_json` drops null fields by default.
  *
  * Everything here is a single narrow projection — codegen'd `to_json` over a
  * struct, no shuffle, scales linearly with input.
  */
object Envelope {
  val jsonOpts: Map[String, String] = Map("ignoreNullFields" -> "false")

  def metadataStruct(
      recordType: String,
      operation: Column,
      schemaName: String,
      tableName: String,
      timestamp: Column,
      transactionId: Column
  ): Column =
    struct(
      timestamp.as("timestamp"),
      lit(recordType).as("record-type"),
      operation.as("operation"),
      lit("schema-table").as("partition-key-type"),
      lit(schemaName).as("schema-name"),
      lit(tableName).as("table-name"),
      transactionId.as("transaction-id")
    )

  def partitionKey(schemaName: String, tableName: String): Column =
    lit(s"$schemaName.$tableName")

  /** Wrap every row of `df` in a data envelope. Output columns:
    * `partition_key`, `envelope` (JSON string) — plus `op` for counters.
    */
  def forData(
      df: DataFrame,
      schemaName: String,
      tableName: String,
      operation: Column,
      timestamp: Column,
      transactionId: Column
  ): DataFrame = {
    val dataStruct = struct(df.columns.map(col).toIndexedSeq: _*)
    df.select(
      partitionKey(schemaName, tableName).as("partition_key"),
      operation.as("op"),
      to_json(
        struct(
          dataStruct.as("data"),
          metadataStruct("data", operation, schemaName, tableName, timestamp, transactionId).as("metadata")
        ),
        jsonOpts
      ).as("envelope")
    )
  }

  /** A single control event (create-table / drop-table; include_control_details
    * + include_table_alter_operations, stack.py:121,124). `data` is null.
    */
  def controlJson(
      operation: String,
      schemaName: String,
      tableName: String,
      timestamp: String
  ): String = {
    // Built literally so "data":null is explicit (matches include_null_and_empty).
    s"""{"data":null,"metadata":{"timestamp":"$timestamp","record-type":"control","operation":"$operation","partition-key-type":"schema-table","schema-name":"$schemaName","table-name":"$tableName","transaction-id":null}}"""
  }
}
