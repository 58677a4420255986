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

    "q_cdc_apply_scale" -> QueryDef(
      // The reference's apply operator at data scale: the events table mapped
      // to a change stream (signup→INSERT, purchase→UPDATE, error→DELETE,
      // seq = event_id) and run through the DISTRIBUTED CdcApply.run path —
      // one shuffle on the PK, per-key sequential fold, no driver state. The
      // oracle derives the same final images with window SQL: an op takes
      // effect iff it's an INSERT, or an UPDATE whose latest prior
      // INSERT/DELETE is an INSERT; a key survives iff its last INSERT/DELETE
      // is an INSERT. Values travel as integer-cent strings (identical
      // rendering in both engines).
      (s, d) => {
        import s.implicits._
        val ops = events(s, d)
          .filter($"event_type".isin("signup", "purchase", "error"))
          .select(
            $"event_id".as("seq"),
            when($"event_type" === "signup", "INSERT")
              .when($"event_type" === "purchase", "UPDATE")
              .otherwise("DELETE").as("op"),
            lit("app").as("schema"),
            lit("users").as("table"),
            $"user_id".cast("string").as("pk"),
            array($"user_id".cast("string"),
              round($"value" * 100, 0).cast("long").cast("string")).as("values"))
          .as[graft.cdc.CdcRecord]
        graft.cdc.CdcApply.run(s, ops)
          .filter($"kind" === "state")
          .select(
            $"pk".cast("long").as("user_id"),
            get($"values", lit(1)).cast("long").as("last_cents"),
            $"lastSeq".as("last_seq"))
          .orderBy($"user_id")
      },
      Some("""WITH ops AS (
             |  SELECT user_id AS pk, event_id AS seq,
             |    CASE event_type WHEN 'signup' THEN 'INSERT'
             |         WHEN 'purchase' THEN 'UPDATE' ELSE 'DELETE' END AS op,
             |    CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR) AS cents
             |  FROM events WHERE event_type IN ('signup', 'purchase', 'error')),
             |w AS (
             |  SELECT *,
             |    last_value(CASE WHEN op IN ('INSERT', 'DELETE') THEN op END IGNORE NULLS)
             |      OVER (PARTITION BY pk ORDER BY seq ROWS UNBOUNDED PRECEDING) AS last_id
             |  FROM ops),
             |eff AS (
             |  SELECT pk, seq, cents FROM w
             |  WHERE op = 'INSERT' OR (op = 'UPDATE' AND last_id = 'INSERT')),
             |last_eff AS (
             |  SELECT pk, seq, cents,
             |    ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
             |  FROM eff),
             |survivors AS (
             |  SELECT pk FROM (
             |    SELECT pk, op, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
             |    FROM ops WHERE op IN ('INSERT', 'DELETE')) t
             |  WHERE rn = 1 AND op = 'INSERT')
             |SELECT CAST(l.pk AS BIGINT) AS user_id,
             |       CAST(l.cents AS BIGINT) AS last_cents,
             |       l.seq AS last_seq
             |FROM last_eff l JOIN survivors sv ON l.pk = sv.pk
             |WHERE l.rn = 1
             |ORDER BY user_id""".stripMargin)
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
