package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing (MOSS) fingerprints of a string, one compiled pass per row:
  * tokenize, hash every k-token gram (sha256 prefix, 60 bits), slide a
  * window of `w` gram hashes, keep each window's minimum, emit the distinct
  * selected hashes in first-occurrence order.
  *
  * Twin of [[graft.analytics.TextAnalysis.winnowFingerprintsDeclarative]] —
  * which is the semantics contract and the shape the DuckDB oracle mirrors,
  * but pays the interpreted-HOF re-evaluation tax: `transform(idx, i ->
  * array_min(slice(hashes, i, w)))` re-computes the CAPTURED `hashes`
  * expression (sha256 over every gram) once per window element, O(grams²)
  * sha256 calls per document (measured 87 s for the sf0.1 corpus vs ~1 s
  * compiled). Here: one sha256 per gram, one O(grams·w) min scan, one pass.
  *
  * Edge regimes (shared with the twin and the oracle):
  *   - fewer than k tokens (no grams) → empty array
  *   - 1 ≤ grams < w → one fingerprint: the global min gram hash
  *
  * CodegenFallback deliberately: per-row cost is sha256-dominated (same
  * measurement argument as [[MinhashSignatureExpr]]).
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val nGrams = toks.length - (k - 1)
    if (nGrams < 1) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("SHA-256")
    val sb = new java.lang.StringBuilder(64)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      hashes(i) = h >>> 4 // first 15 hex chars == conv(substr(sha2,1,15),16,10)
      md.reset()
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nGrams < w) {
      var m = hashes(0)
      var t = 1
      while (t < nGrams) { if (hashes(t) < m) m = hashes(t); t += 1 }
      seen.add(m): Unit
    } else {
      var start = 0
      while (start <= nGrams - w) {
        var m = hashes(start)
        var t = start + 1
        while (t < start + w) { if (hashes(t) < m) m = hashes(t); t += 1 }
        seen.add(m): Unit
        start += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(): java.lang.Long; idx += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
