package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native twin of
  * [[graft.pipeline.StatementTransforms.processStatement]] (SURVEY §2 O10 —
  * the reference's `process_statement`, `/root/reference/src/main.rs:647-672`).
  * CodegenFallback by measurement: the speedup comes from replacing eight
  * regex scans with four builder passes (fast `eval`), and per-row cost is
  * the char scan itself — a doGenCode would save only the one boxed call
  * per row (see MinhashSignatureExpr's measured bound; o14 already runs
  * 2.6× under its r01 baseline).
  *
  * Applies the composed semantics in four builder passes
  * instead of eight regex scans per row:
  *   A. normalize each maximal backslash run: odd length → 2, even → 4
  *   B. strip ALL leading/trailing `"` characters
  *   C. literal `\'` → `\\'`   (sequential, like Rust's `str::replace`)
  *   D. literal `'`  → `\'`
  */
case class ProcessStatementExpr(child: Expression) extends StringUnary {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_process_statement"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // A: backslash-run normalization
    val a = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        var j = i
        while (j < s.length && s.charAt(j) == '\\') j += 1
        val run = j - i
        a.append(if (run % 2 == 1) "\\\\" else "\\\\\\\\")
        i = j
      } else { a.append(c); i += 1 }
    }
    // B: trim all leading/trailing double quotes
    var lo = 0
    var hi = a.length
    while (lo < hi && a.charAt(lo) == '"') lo += 1
    while (hi > lo && a.charAt(hi - 1) == '"') hi -= 1
    val trimmed = a.substring(lo, hi)
    // C + D: sequential literal replaces (order matters — C's output quotes
    // are re-escaped by D, exactly like the reference)
    val c2 = trimmed.replace("\\'", "\\\\'")
    UTF8String.fromString(c2.replace("'", "\\'"))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
