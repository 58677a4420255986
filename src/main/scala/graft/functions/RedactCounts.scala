package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Two-stage regex redaction with match counts, fused into one codegen'd
  * expression — the PII-masking kernel behind `q_text_redact`.
  *
  * Returns `struct(clean: string, n1: bigint, n2: bigint)` where
  *  - `clean` = `regexp_replace(regexp_replace(text, p1, r1), p2, r2)`,
  *  - `n1`    = match count of `p1` in the ORIGINAL text,
  *  - `n2`    = match count of `p2` in the post-`p1`-replacement text —
  * exactly the values the composed form computes with FIVE regex passes
  * (the replace chain plus `size(split(..)) - 1` counters re-running each
  * pattern). Each matcher pass here both replaces and counts, so the text
  * is scanned once per pattern — the structural minimum for these
  * semantics.
  *
  * Parity: the same `java.util.regex` engine Spark's `regexp_replace`
  * uses; replacements are literal-quoted, so `$`/`\` in replacement
  * strings behave as raw characters (the composed form's replacements are
  * plain literals, where quoting is a no-op). Match counting equals
  * `size(split(text, p, -1)) - 1` — split keeps trailing empties at
  * limit -1, so pieces = matches + 1. Null text nulls the whole struct,
  * matching the composed form's per-field null propagation.
  *
  * Zero-WIDTH matches are REJECTED, at two layers: patterns matching the
  * empty string (e.g. `a*`) fail ANALYSIS, and context-dependent zero-width
  * patterns that slip past that probe (`(?=a)`, `\b` — they never match ""
  * yet produce zero-length matches on real text) fail at RUNTIME the moment
  * a zero-length match is observed in the count loop. Java 8+ `split`
  * suppresses a leading empty token on a zero-width match — on empty AND
  * non-empty input — so the split-minus-one identity above breaks for
  * exactly this class; since the kernel is registered as a general SQL
  * function taking arbitrary pattern literals, the restriction is enforced
  * for the whole class, not just the analysis-detectable subset. (The
  * shipped email/digit patterns all consume at least one character.)
  */
case class RedactCounts(
    child: Expression,
    pattern1: String, repl1: String,
    pattern2: String, repl2: String)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = true),
    StructField("n1", LongType, nullable = false),
    StructField("n2", LongType, nullable = false)))

  override def prettyName: String = "redact_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        // zero-width-matching patterns break the documented split identity
        // (see class scaladoc) — fail analysis, not silently mis-count
        Seq(pattern1, pattern2).find(p =>
          try java.util.regex.Pattern.compile(p).matcher("").find()
          catch { case _: java.util.regex.PatternSyntaxException => false }
        ) match {
          case Some(p) =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"redact_counts pattern must not match the empty string: '$p'")
          case None =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        }
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"redact_counts expects string, got ${other.sql}")
    }

  @transient private lazy val p1 = java.util.regex.Pattern.compile(pattern1)
  @transient private lazy val p2 = java.util.regex.Pattern.compile(pattern2)
  @transient private lazy val q1 = java.util.regex.Matcher.quoteReplacement(repl1)
  @transient private lazy val q2 = java.util.regex.Matcher.quoteReplacement(repl2)

  /** One replace-and-count pass; called from eval/codegen via [[redact]]. */
  private def pass(
      text: String, p: java.util.regex.Pattern, q: String): (String, Long) = {
    val m = p.matcher(text)
    var n = 0L
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      if (m.end() == m.start())
        // context-dependent zero-width match (lookaround, \b): the
        // split-minus-one count identity does not hold — refuse, don't
        // silently mis-count (see class scaladoc)
        throw new IllegalArgumentException(
          s"redact_counts pattern '${p.pattern}' produced a zero-length match " +
            s"at offset ${m.start()}; zero-width patterns are unsupported")
      m.appendReplacement(sb, q); n += 1
    }
    m.appendTail(sb)
    (sb.toString, n)
  }

  /** Called from eval/codegen once per row. */
  def redact(input: UTF8String): InternalRow = {
    val (t1, n1) = pass(input.toString, p1, q1)
    val (t2, n2) = pass(t1, p2, q2)
    InternalRow(UTF8String.fromString(t2), n1, n2)
  }

  override def nullSafeEval(input: Any): Any =
    redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("redactCounts", this, classOf[RedactCounts].getName)
      s"${ev.value} = $self.redact($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RedactCounts {
  val FunctionName = "redact_counts"

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `redactCounts($"text", p1, r1, p2, r2)`. */
  def redactCounts(
      spark: SparkSession, text: Column,
      pattern1: String, repl1: String,
      pattern2: String, repl2: String): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function(FunctionName, text,
      lit(pattern1), lit(repl1), lit(pattern2), lit(repl2))
  }
}
