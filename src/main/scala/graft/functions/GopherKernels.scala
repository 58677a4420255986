package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the Gopher-style quality gate (q_quality_gopher and
  * both curation funnels' gates). The gate's three statistics were three
  * interpreted HOF chains plus a materialized `array_sort` column; each
  * kernel here is ONE compiled pass. They are deliberately three SEPARATE
  * expressions (not one struct): the funnels consume the flags in
  * Filters, where predicate pushdown inlines each column's defining
  * expression into the condition once — a struct-returning kernel would be
  * inlined once PER FIELD access and evaluated three times per row.
  */

/** Character-count sum of a token array — value-identical to
  * `aggregate(tok, 0L, (a, x) -> a + length(x))` including the sticky null:
  * `length(NULL)` nulls the accumulator, so ANY null token nulls the sum.
  */
case class TokCharSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "tok_char_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tok_char_sum expects array<string>, got ${other.sql}")
    }

  /** Boxed Long or null; called from eval/codegen once per row. */
  def charSum(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null // aggregate's null is sticky
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val r = charSum(input.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("tokCharSum", this, classOf[TokCharSum].getName)
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Long $boxed = $self.charSum($v);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Longest adjacent-equal run in the SORTED token array — value-identical
  * to `Q.maxRunSql` applied to `array_sort(tok)` (i.e. max multiplicity):
  * binary UTF8String order with nulls last (array_sort's order), `x = y`
  * equality in which nulls never extend a run, `size <= 1` returns size.
  * Sorting happens INSIDE the kernel, so callers drop their materialized
  * `st` column entirely.
  */
case class MaxRunSorted(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "max_run_sorted"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_run_sorted expects array<string>, got ${other.sql}")
    }

  /** Called from eval/codegen once per row. */
  def maxRun(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n <= 1) return n.toLong
    val a = new Array[UTF8String](n)
    var nonNull = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { a(nonNull) = arr.getUTF8String(i); nonNull += 1 }
      i += 1
    }
    // nulls sort last and never compare equal — they can't extend any run,
    // so only the non-null prefix matters
    java.util.Arrays.sort(a, 0, nonNull,
      new java.util.Comparator[UTF8String] {
        override def compare(x: UTF8String, y: UTF8String): Int = x.compareTo(y)
      })
    var best = 0L
    var run = 0L
    i = 1
    while (i < nonNull) {
      if (a(i).equals(a(i - 1))) { run += 1L; if (run > best) best = run }
      else run = 0L
      i += 1
    }
    1L + best
  }

  override def nullSafeEval(input: Any): Any =
    maxRun(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("maxRunSorted", this, classOf[MaxRunSorted].getName)
      s"${ev.value} = $self.maxRun($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** How many of the `words` appear in the token array — value-identical to
  * `size(filter(array(words...), w -> array_contains(tok, w)))`: a word
  * counts iff some token equals it (filter drops array_contains's
  * not-found-with-null-tokens NULL exactly like a false).
  */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty, "stopword_hits needs a non-empty word list")

  override def dataType: DataType = LongType
  override def prettyName: String = "stopword_hits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"stopword_hits expects array<string>, got ${other.sql}")
    }

  @transient private lazy val targets: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  /** Called from eval/codegen once per row. */
  def hits(arr: ArrayData): Long = {
    val n = arr.numElements()
    val found = new Array[Boolean](targets.length)
    var remaining = targets.length
    var i = 0
    while (i < n && remaining > 0) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        while (j < targets.length) {
          if (!found(j) && t.equals(targets(j))) { found(j) = true; remaining -= 1 }
          j += 1
        }
      }
      i += 1
    }
    (targets.length - remaining).toLong
  }

  override def nullSafeEval(input: Any): Any =
    hits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("stopwordHits", this, classOf[StopwordHits].getName)
      s"${ev.value} = $self.hits($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** How many TOKENS of the array are members of the `words` set —
  * value-identical to `size(filter(tok, x -> x IN (words...)))`: every
  * matching occurrence counts (unlike [[StopwordHits]]'s distinct-word
  * count), null tokens are dropped by the filter (NULL lambda result),
  * and the result is the INT the HOF's size() returns, cast to long by
  * callers as needed.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty, "token_set_count needs a non-empty word list")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_set_count expects array<string>, got ${other.sql}")
    }

  @transient private lazy val targets: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Called from eval/codegen once per row. */
  def countIn(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && targets.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    countIn(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("tokenSetCount", this, classOf[TokenSetCount].getName)
      s"${ev.value} = $self.countIn($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherKernels {
  /** The gate's shared stopword list (same literals as every oracle). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(
      spark, "tok_char_sum", "max_run_sorted", "stopword_hits", "token_set_count")

  def tokCharSum(spark: SparkSession, tok: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("tok_char_sum", tok)
  }

  def maxRunSorted(spark: SparkSession, tok: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("max_run_sorted", tok)
  }

  /** Gate-list stopword hit count (the registered SQL surface takes the
    * word array as a literal; this binding pins the shared gate list).
    */
  def stopwordHits(spark: SparkSession, tok: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("stopword_hits", tok,
      org.apache.spark.sql.functions.typedlit(Stopwords))
  }

  /** Occurrence count of tokens in `words` (`x IN (...)` filter twin). */
  def tokenSetCount(spark: SparkSession, tok: Column, words: Seq[String]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("token_set_count", tok,
      org.apache.spark.sql.functions.typedlit(words))
  }
}
