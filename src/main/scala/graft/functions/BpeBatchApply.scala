package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ORDERED list of BPE merges to one wrapped-symbol string in a
  * single kernel pass — the batched trainer's vocabulary step
  * (CorpusOpsQueries.bpeTrainBatched).
  *
  * VALUE-IDENTICAL to the chained one-replace-per-merge composition
  * `replace(...replace(symstr, '|a1||b1|', '|a1b1|')..., '|aM||bM|', '|aMbM|')`
  * (pinned in Round16OpsSpec): under the wrapped representation every
  * string-level match of '|a||b|' is symbol-aligned (symbols contain no
  * '|'), so each merge is exactly one greedy left-to-right non-overlapping
  * pass over the SYMBOL ARRAY — merge at i, continue at i+2, which
  * resolves a==b chains greedily ('aaaaa' → [aa,aa,a]).
  *
  * Why one kernel beats M chained replaces: the replace chain pays one
  * full string scan + string allocation per merge per row (~85 ms/merge
  * over the sf4 vocabulary — the batched trainer's measured floor); the
  * kernel parses the symbols ONCE, keeps a presence set, and runs a merge
  * pass only when both symbols are (possibly) present — for a typical
  * word almost every merge is a single hash lookup. The set is maintained
  * as a SUPERSET (concatenations added on application, consumed symbols
  * never removed), so a stale entry costs one wasted scan and can never
  * skip an applicable merge — exactness does not depend on the trainer's
  * selection rule.
  *
  * Input contract: a wrapped symstr ('|t||h||e|'); empty input returns
  * empty. Null-intolerant (UnaryExpression default).
  */
case class BpeBatchApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_batch_apply"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_batch_apply expects string, got ${other.sql}")
    }

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  /** Called from eval/codegen once per row. */
  def applyMerges(input: UTF8String): UTF8String = {
    val s = input.toString
    if (s.isEmpty) return input
    // parse '|s1||s2|...|sn|' into the symbol array
    var syms = new java.util.ArrayList[String](16)
    var i = 1 // skip leading '|'
    val len = s.length
    while (i < len) {
      val end = s.indexOf('|', i)
      syms.add(s.substring(i, end))
      i = end + 2 // skip '||' (or the trailing '|' past len)
    }
    val present = new java.util.HashSet[String](syms.size * 2)
    var j = 0
    while (j < syms.size) { present.add(syms.get(j)); j += 1 }

    var m = 0
    while (m < mergeArr.length) {
      val (a, b) = mergeArr(m)
      if (present.contains(a) && present.contains(b)) {
        val n = syms.size
        var out: java.util.ArrayList[String] = null
        var k = 0
        var applied = false
        while (k < n) {
          if (k + 1 < n && syms.get(k) == a && syms.get(k + 1) == b) {
            if (out == null) { // copy-on-first-merge
              out = new java.util.ArrayList[String](n - 1)
              var c = 0
              while (c < k) { out.add(syms.get(c)); c += 1 }
            }
            out.add(a + b); k += 2; applied = true
          } else {
            if (out != null) out.add(syms.get(k))
            k += 1
          }
        }
        if (applied) { syms = out; present.add(a + b) }
      }
      m += 1
    }

    val sb = new java.lang.StringBuilder(len)
    var p = 0
    while (p < syms.size) {
      sb.append('|').append(syms.get(p)).append('|')
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    applyMerges(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("bpeBatchApply", this, classOf[BpeBatchApply].getName)
      s"${ev.value} = $self.applyMerges($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
