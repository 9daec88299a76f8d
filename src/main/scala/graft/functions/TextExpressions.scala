package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text-analysis expressions for the per-row hot paths.
  *
  * Each has a declarative HOF twin (documented per class) with identical
  * semantics — these exist purely because interpreted per-element lambda
  * dispatch dominated the measured cost at sf0.1 (e.g. the per-character
  * fingerprint fold: 18.7 s → sub-second). The DuckDB oracles are written
  * against the HOF semantics and stay valid bit-for-bit.
  */
private[functions] trait StringUnary extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
}

/** Rolling polynomial fingerprint:
  * `fold(codepoints)(acc*31 + cp) mod 1e9+7` — twin of
  * `aggregate(transform(split(text,''), ascii), 0L, (acc,x) -> (acc*31+x)%M)`
  * and DuckDB `list_reduce(list_prepend(0, list_transform(string_split(text,
  * ''), ascii)), …)`. Iterates real code points (what `ascii` returns per
  * single-char string). */
case class PolyFingerprint(child: Expression) extends StringUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit frequency-weighted SimHash over `\s+` token occurrences; token
  * hash = first 15 hex chars of sha256 as int64 (identical to
  * [[graft.analytics.Dedup.hash60]] and the oracle's
  * `('0x'||substr(sha256(t),1,15))::BIGINT`). Bit i of the result is set
  * iff more token occurrences have bit i set than clear. The sha256 per
  * DISTINCT token is memoized per row (tokens repeat heavily). */
case class SimHash60(child: Expression) extends StringUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val memo = new java.util.HashMap[String, java.lang.Long](toks.length * 2)
    val counts = new Array[Int](60)
    val md = MessageDigest.getInstance("SHA-256")
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var hBoxed = memo.get(tok)
      if (hBoxed == null) {
        val digest = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        // first 15 hex chars = high 60 bits of the first 8 bytes, shifted:
        // hex[0..14] == digest bits [0, 60)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = h >>> 4 // drop the 16th hex char of the first 8 bytes
        md.reset()
        hBoxed = java.lang.Long.valueOf(h)
        memo.put(tok, hBoxed): Unit
      }
      val h = hBoxed.longValue()
      var i = 0
      while (i < 60) {
        counts(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 60) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stopword-inventory language ID; twin of the
  * `size(filter(tokens, _.isin(list)))` CASE cascade in
  * [[graft.analytics.TextAnalysis.langId]] (en ≥ es ≥ de tie-break,
  * 'unknown' when all zero). One tokenization for all three inventories. */
case class StopwordLangId(child: Expression, en: Seq[String], es: Seq[String], de: Seq[String])
    extends StringUnary {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val enSet = en.toSet
  @transient private lazy val esSet = es.toSet
  @transient private lazy val deSet = de.toSet

  override def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    var (hEn, hEs, hDe) = (0, 0, 0)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (enSet.contains(t)) hEn += 1
      if (esSet.contains(t)) hEs += 1
      if (deSet.contains(t)) hDe += 1
      i += 1
    }
    val label =
      if (hEn == 0 && hEs == 0 && hDe == 0) "unknown"
      else if (hEn >= hEs && hEn >= hDe) "en"
      else if (hEs >= hDe) "es"
      else "de"
    UTF8String.fromString(label)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass quality score; exact twin of
  * [[graft.analytics.TextAnalysis.qualityScore]] — identical component
  * formulas, identical left-associated double addition, identical HALF_UP
  * rounding at 4 decimals — so the DuckDB oracle written against the HOF
  * form stays valid bit-for-bit. The declarative form pays interpreted
  * lambda dispatch per token (and CollapseProject re-inlines it into every
  * consumer); this evaluates one token scan + one code-point scan per row. */
case class QualityScore(child: Expression, stopwords: Seq[String])
    extends StringUnary {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_quality"

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val stopSet = stopwords.toSet

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = ws.split(s, -1)
    var sumLen = 0L
    var hits = 0
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      sumLen += tok.codePointCount(0, tok.length)
      if (stopSet.contains(tok)) hits += 1
      t += 1
    }
    // punct = code points outside [A-Za-z0-9] and \s (Java ASCII class)
    var punct = 0
    var total = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val isAlnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!isAlnum && !isWs) punct += 1
      total += 1
      i += Character.charCount(cp)
    }
    // Empty string: the declarative twin's punct/total Divide is 0/0, which
    // Spark evaluates to NULL (not NaN) and NULL-propagates through the sum
    // — return null here too so the twins agree under null-safe comparison.
    if (total == 0) return null
    val nTok = toks.length.toDouble
    val m1 = 0.3 * math.min(1.0, nTok / 100.0)
    val m2 = 0.3 * (1.0 - punct.toDouble / total.toDouble)
    val m3 = 0.2 * (hits.toDouble / nTok)
    val m4 = 0.2 * math.min(1.0, (sumLen.toDouble / nTok) / 8.0)
    val q = ((m1 + m2) + m3) + m4
    if (java.lang.Double.isNaN(q)) q
    else java.math.BigDecimal.valueOf(q)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Credit-card redaction with Luhn verification: maximal ASCII-digit runs
  * of exactly 16 digits that pass the Luhn checksum are replaced with
  * `<CARD>`; everything else (shorter/longer runs, Luhn-invalid numbers,
  * separated groups like phone numbers) is preserved byte-for-byte. A
  * pattern alone cannot distinguish a card from any other 16-digit id —
  * the checksum is the discriminator, and it needs a per-digit fold, which
  * is exactly what a compiled expression does in one pass with zero
  * allocation per run. */
case class CardRedact(child: Expression) extends StringUnary {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_card_redact"

  private def luhnValid16(s: String, from: Int): Boolean = {
    // positions from the right, 1-based: odd as-is, even doubled (−9 if >9)
    var sum = 0
    var k = 0
    while (k < 16) {
      val d = s.charAt(from + 15 - k) - '0'
      sum += (if (k % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d)
      k += 1
    }
    sum % 10 == 0
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < s.length && { val d = s.charAt(j); d >= '0' && d <= '9' }) j += 1
        if (j - i == 16 && luhnValid16(s, i)) sb.append("<CARD>")
        else sb.append(s, i, j)
        i = j
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
