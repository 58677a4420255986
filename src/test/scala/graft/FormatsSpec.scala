package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source-format coverage: the same relation written and re-read as parquet,
  * JSON-lines, and headered CSV yields identical contents (schema applied
  * explicitly for the text formats — the engine's declared-schema discipline,
  * SURVEY §1.1).
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("parquet / orc / json-lines / csv round-trip identically") {
    import spark.implicits._
    val src = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang", $"n_chars") // scalar columns round-trip everywhere
    val dir = Files.createTempDirectory("graft-formats").toString
    src.write.mode("overwrite").parquet(s"$dir/p")
    src.write.mode("overwrite").orc(s"$dir/o")
    src.write.mode("overwrite").json(s"$dir/j")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/c")

    val schema = src.schema
    val p = spark.read.parquet(s"$dir/p")
    val o = spark.read.orc(s"$dir/o")
    val j = spark.read.schema(schema).json(s"$dir/j")
    val c = spark.read.schema(schema).option("header", "true").csv(s"$dir/c")

    assert(p.count() == src.count())
    Seq("orc" -> o, "json" -> j, "csv" -> c).foreach { case (name, df) =>
      assert(df.schema == schema, s"$name schema drifted")
      assert(df.exceptAll(p).isEmpty && p.exceptAll(df).isEmpty, s"$name contents differ")
    }
  }
}
