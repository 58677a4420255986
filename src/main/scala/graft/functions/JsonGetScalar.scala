package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Top-level scalar JSON key extraction, fused into one codegen'd
  * expression — the hot-path twin of `get_json_object(json, '$.key')` for
  * the (overwhelmingly common) flat-props shape, without the per-row
  * Jackson parser setup that dominates tiny-document extraction.
  *
  * Contract (pinned against `get_json_object` in Round11OpsSpec):
  *  - returns the value of the FIRST top-level occurrence of `key` in a
  *    JSON object: strings unescaped (\" \\ \/ \b \f \n \r \t \uXXXX),
  *    numbers/booleans as their raw token text;
  *  - JSON `null` values, missing keys, non-object roots and malformed
  *    JSON all return SQL NULL — exactly `get_json_object`'s behavior;
  *  - OBJECT/ARRAY values return SQL NULL. This is the one DOCUMENTED
  *    divergence (`get_json_object` re-serializes the subtree); callers
  *    that cast to a numeric/boolean type are value-identical anyway,
  *    since a re-serialized subtree never casts successfully. Use
  *    `get_json_object` when structural extraction is needed.
  *  - DUPLICATE top-level keys return the FIRST occurrence — measured
  *    PARITY, not divergence: `get_json_object` also emits the first
  *    top-level match ('{"k":1,"k":2}' → "1" on both sides; pinned in
  *    Round12OpsSpec).
  *
  * The scanner is a real STRICT JSON walker, and strictness extends past
  * the matched member: the whole root object is validated left-to-right
  * (recursive descent through skipped subtrees with per-type closers and
  * strict scalar grammars, Jackson-style 1000-deep nesting cap), so inputs
  * like '{"k":1, junk}' or mismatched '[...}' closers return NULL exactly
  * as `get_json_object` does when Jackson throws walking to END_OBJECT.
  * Content after the root object's closing brace is ignored, also matching
  * Jackson's early stop ('{"k":1} junk' → "1" in both). Pinned against
  * `get_json_object` in Round11OpsSpec + Round12OpsSpec (malformed-suffix
  * class).
  */
case class JsonGetScalar(child: Expression, key: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "json_get_scalar"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"json_get_scalar expects string, got ${other.sql}")
    }

  override def nullable: Boolean = true

  /** Called from eval/codegen once per row; null on any malformed input.
    * The matched value is HELD, not returned, until the remaining members
    * of the root object validate — a malformed suffix voids the match,
    * exactly like Jackson throwing on the walk to END_OBJECT.
    */
  def extract(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    var i = skipWs(s, 0)
    if (i >= n || s.charAt(i) != '{') return null
    i = skipWs(s, i + 1)
    if (i < n && s.charAt(i) == '}') return null // empty object: no such key
    var found: UTF8String = null
    var haveMatch = false
    while (i < n) {
      // parse member key
      if (s.charAt(i) != '"') return null
      val keyEnd = scanString(s, i)
      if (keyEnd < 0) return null
      val matches = !haveMatch && stringEquals(s, i + 1, keyEnd - 1, key)
      i = skipWs(s, keyEnd)
      if (i >= n || s.charAt(i) != ':') return null
      i = skipWs(s, i + 1)
      if (i >= n) return null
      if (matches) { found = scalarValue(s, i); haveMatch = true }
      i = skipValue(s, i, 0) // validates the value's own syntax either way
      if (i < 0) return null
      i = skipWs(s, i)
      if (i < n && s.charAt(i) == ',') i = skipWs(s, i + 1)
      // root object closed validly: content PAST it is ignored (Jackson
      // stops at the root's END_OBJECT too)
      else if (i < n && s.charAt(i) == '}') return found
      else return null
    }
    null
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** `i` at the opening quote; returns index AFTER the closing quote, or -1. */
  private def scanString(s: String, i0: Int): Int = {
    var i = i0 + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** Raw-vs-unescaped comparison of s[from, until) against `key`. */
  private def stringEquals(s: String, from: Int, until: Int, k: String): Boolean = {
    // keys in this fast path are plain identifiers; an escaped key in the
    // JSON can still match after unescape
    if (until - from == k.length && s.regionMatches(from, k, 0, k.length) &&
      s.indexOf('\\', from) < 0) return true
    val un = unescape(s, from, until)
    un != null && un == k
  }

  private def unescape(s: String, from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (i + 1 >= until) return null
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            if (i + 6 > until) return null
            try {
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            } catch { case _: Exception => return null }
            i += 6
          case _ => return null
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `i` at a value's first char: scalar → its text; object/array/null →
    * SQL NULL; malformed → SQL NULL.
    */
  private def scalarValue(s: String, i: Int): UTF8String = {
    val n = s.length
    s.charAt(i) match {
      case '"' =>
        val end = scanString(s, i)
        if (end < 0) return null
        val un = unescape(s, i + 1, end - 1)
        if (un == null) null else UTF8String.fromString(un)
      case '{' | '[' => null // structural value: documented NULL
      case 'n' =>
        if (s.regionMatches(i, "null", 0, 4)) null else null
      case 't' =>
        if (s.regionMatches(i, "true", 0, 4)) UTF8String.fromString("true") else null
      case 'f' =>
        if (s.regionMatches(i, "false", 0, 5)) UTF8String.fromString("false") else null
      case c if c == '-' || (c >= '0' && c <= '9') =>
        var j = i + 1
        while (j < n && (s.charAt(j) == '+' || s.charAt(j) == '-' ||
          s.charAt(j) == '.' || s.charAt(j) == 'e' || s.charAt(j) == 'E' ||
          (s.charAt(j) >= '0' && s.charAt(j) <= '9'))) j += 1
        val tok = s.substring(i, j)
        if (!validJsonNumber(tok)) null
        // get_json_object round-trips float-shaped numbers through Jackson's
        // double (1.5e3 → "1500.0"); integer tokens pass through verbatim
        else if (tok.indexOf('.') >= 0 || tok.indexOf('e') >= 0 || tok.indexOf('E') >= 0)
          UTF8String.fromString(java.lang.Double.toString(java.lang.Double.parseDouble(tok)))
        else UTF8String.fromString(tok)
      case _ => null
    }
  }

  /** Strict JSON number grammar: -?(0|[1-9][0-9]*)(.[0-9]+)?([eE][+-]?[0-9]+)? */
  private def validJsonNumber(tok: String): Boolean = {
    var i = 0
    val n = tok.length
    if (i < n && tok.charAt(i) == '-') i += 1
    if (i >= n) return false
    if (tok.charAt(i) == '0') i += 1
    else if (tok.charAt(i) >= '1' && tok.charAt(i) <= '9') {
      while (i < n && tok.charAt(i) >= '0' && tok.charAt(i) <= '9') i += 1
    } else return false
    if (i < n && tok.charAt(i) == '.') {
      i += 1
      if (i >= n || tok.charAt(i) < '0' || tok.charAt(i) > '9') return false
      while (i < n && tok.charAt(i) >= '0' && tok.charAt(i) <= '9') i += 1
    }
    if (i < n && (tok.charAt(i) == 'e' || tok.charAt(i) == 'E')) {
      i += 1
      if (i < n && (tok.charAt(i) == '+' || tok.charAt(i) == '-')) i += 1
      if (i >= n || tok.charAt(i) < '0' || tok.charAt(i) > '9') return false
      while (i < n && tok.charAt(i) >= '0' && tok.charAt(i) <= '9') i += 1
    }
    i == n
  }

  /** Jackson's default nesting-depth constraint; deeper input is treated
    * as malformed on both sides. */
  private val MaxDepth = 1000

  /** Skip one complete value starting at `i0`; returns index after it, -1
    * on malformed. STRICT recursive descent: skipped objects/arrays are
    * fully validated (per-type closers — '[' can never close with '}' —
    * member/element grammar, strict scalar tokens), so any garbage inside
    * a skipped subtree voids the document exactly as Jackson's
    * skipChildren (which tokenizes everything it skips) would.
    */
  private def skipValue(s: String, i0: Int, depth: Int): Int = {
    if (depth > MaxDepth) return -1
    s.charAt(i0) match {
      case '"' => scanString(s, i0)
      case '{' =>
        val n = s.length
        var i = skipWs(s, i0 + 1)
        if (i < n && s.charAt(i) == '}') return i + 1
        while (i < n) {
          if (s.charAt(i) != '"') return -1
          val keyEnd = scanString(s, i)
          if (keyEnd < 0) return -1
          i = skipWs(s, keyEnd)
          if (i >= n || s.charAt(i) != ':') return -1
          i = skipWs(s, i + 1)
          if (i >= n) return -1
          i = skipValue(s, i, depth + 1)
          if (i < 0) return -1
          i = skipWs(s, i)
          if (i < n && s.charAt(i) == ',') i = skipWs(s, i + 1)
          else if (i < n && s.charAt(i) == '}') return i + 1
          else return -1
        }
        -1
      case '[' =>
        val n = s.length
        var i = skipWs(s, i0 + 1)
        if (i < n && s.charAt(i) == ']') return i + 1
        while (i < n) {
          i = skipValue(s, i, depth + 1)
          if (i < 0) return -1
          i = skipWs(s, i)
          if (i < n && s.charAt(i) == ',') i = skipWs(s, i + 1)
          else if (i < n && s.charAt(i) == ']') return i + 1
          else return -1
        }
        -1
      case _ =>
        val n = s.length
        var i = i0
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != '}' &&
          s.charAt(i) != ']' && s.charAt(i) != ' ' && s.charAt(i) != '\t' &&
          s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
        // reject junk literals (Jackson would): only true/false/null and
        // STRICT-grammar numbers are valid non-structural values
        val tok = s.substring(i0, i)
        val ok = tok == "true" || tok == "false" || tok == "null" ||
          validJsonNumber(tok)
        if (ok) i else -1
    }
  }

  override def nullSafeEval(input: Any): Any =
    extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("jsonGetScalar", this, classOf[JsonGetScalar].getName)
      // extract() nulls on missing/structural/malformed — propagate to isNull
      s"""
         |${ev.value} = $self.extract($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonGetScalar {
  val FunctionName = "json_get_scalar"

  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, FunctionName)

  /** Column-API surface: `jsonGetScalar($"props", "k")`. */
  def jsonGetScalar(spark: SparkSession, json: Column, key: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      FunctionName, json, org.apache.spark.sql.functions.lit(key))
  }
}
