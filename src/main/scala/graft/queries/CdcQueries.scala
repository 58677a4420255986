package graft.queries

import org.apache.spark.sql.functions._
import graft.cdc.{CdcApply, CdcParser}
import graft.etl.{Envelope, ReferenceFixtures}
import graft.tables.Tables._

/** Reference-core operators as declared queries: ordered CDC apply (O5/O6),
  * envelope construction (O7/O9), table statistics (O15/O16).
  *
  * The CDC queries replay the reference's exact golden change set
  * (lib/query.py:16-27) through the engine's distributed apply; the oracle is
  * the same 11 ops as a VALUES list with last-op-per-PK window SQL — for
  * full-row-image ops the sequential fold and the window form agree on final
  * state, which is what makes the oracle expressible.
  */
object CdcQueries {

  /** The 11 reference ops as a DuckDB VALUES list (seq, op, tbl, sch, v1..v5),
    * NULL-padded to fixed arity.
    */
  private val opsValuesSql: String = {
    val rows = ReferenceFixtures.cdcLines.zipWithIndex.map { case (line, i) =>
      val p = line.split(",", -1).map(_.trim)
      val vals = p.drop(3).padTo(5, null).map(v => if (v == null) "NULL" else s"'$v'")
      s"(${i + 1}, '${p(0)}', '${p(1)}', '${p(2)}', ${vals.mkString(", ")})"
    }
    s"(VALUES ${rows.mkString(", ")})"
  }

  val entries: Map[String, QueryDef] = Map(
    "q_cdc_apply" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val recs = CdcParser.parseLines(ReferenceFixtures.cdcLines)
        val outcomes = CdcApply.run(s, s.createDataset(recs))
        outcomes
          .filter($"kind" === "state")
          .select(
            $"schema".as("schema_name"),
            $"table".as("table_name"),
            $"pk".cast("long").as("pk_id"),
            get($"values", lit(1)).as("c1"),
            get($"values", lit(2)).as("c2"),
            get($"values", lit(3)).as("c3"),
            get($"values", lit(4)).as("c4"))
          .orderBy($"schema_name", $"table_name", $"pk_id")
      },
      Some(s"""WITH ops(seq, op, tbl, sch, v1, v2, v3, v4, v5) AS $opsValuesSql,
              |last AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY sch, tbl, v1 ORDER BY seq DESC) AS rn
              |  FROM ops)
              |SELECT sch AS schema_name, tbl AS table_name, CAST(v1 AS BIGINT) AS pk_id,
              |       v2 AS c1, v3 AS c2, v4 AS c3, v5 AS c4
              |FROM last WHERE rn = 1 AND op <> 'DELETE'
              |ORDER BY schema_name, table_name, pk_id""".stripMargin)
    ),

    "q_envelope_json" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val ts = "2024-01-01T00:00:00Z"
        nation(s, d).select(
          $"n_nationkey",
          Envelope.partitionKey("tpch", "nation").as("partition_key"),
          to_json(
            struct(
              struct($"n_nationkey", $"n_name", $"n_regionkey").as("data"),
              Envelope.metadataStruct("data", lit("load"), "tpch", "nation",
                lit(ts), lit(0L)).as("metadata")),
            Envelope.jsonOpts).as("envelope"))
          .orderBy($"n_nationkey")
      },
      Some("""SELECT n_nationkey, 'tpch.nation' AS partition_key,
             |  json_object(
             |    'data', json_object('n_nationkey', n_nationkey, 'n_name', n_name, 'n_regionkey', n_regionkey),
             |    'metadata', json_object(
             |      'timestamp', '2024-01-01T00:00:00Z', 'record-type', 'data',
             |      'operation', 'load', 'partition-key-type', 'schema-table',
             |      'schema-name', 'tpch', 'table-name', 'nation',
             |      'transaction-id', 0))::VARCHAR AS envelope
             |FROM nation ORDER BY n_nationkey""".stripMargin)
    ),

    "q_table_stats" -> QueryDef(
      // O15/O16: per-(schema, table) operation counters over a change set,
      // sorted report. groupBy + conditional counts = partial-aggregatable.
      (s, d) => {
        import s.implicits._
        val recs = CdcParser.parseLines(ReferenceFixtures.cdcLines)
        s.createDataset(recs)
          .groupBy($"schema".as("schema_name"), $"table".as("table_name"))
          .agg(
            count(when($"op" === "INSERT", 1)).as("inserts"),
            count(when($"op" === "UPDATE", 1)).as("updates"),
            count(when($"op" === "DELETE", 1)).as("deletes"),
            count(lit(1)).as("total_ops"))
          .orderBy($"schema_name", $"table_name")
      },
      Some(s"""WITH ops(seq, op, tbl, sch, v1, v2, v3, v4, v5) AS $opsValuesSql
              |SELECT sch AS schema_name, tbl AS table_name,
              |  COUNT(CASE WHEN op = 'INSERT' THEN 1 END) AS inserts,
              |  COUNT(CASE WHEN op = 'UPDATE' THEN 1 END) AS updates,
              |  COUNT(CASE WHEN op = 'DELETE' THEN 1 END) AS deletes,
              |  COUNT(*) AS total_ops
              |FROM ops GROUP BY sch, tbl
              |ORDER BY schema_name, table_name""".stripMargin)
    )
  )
}
