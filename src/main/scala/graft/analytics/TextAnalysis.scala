package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization stats, language-ID heuristic, quality scoring, and document
  * fingerprinting. All pure Catalyst expressions (array/lambda built-ins, no
  * UDFs) so they stay inside whole-stage codegen — at 100 TB these run as
  * narrow per-row transforms with zero shuffle.
  *
  * Every function is deterministic and has an exact DuckDB-SQL counterpart
  * (driver correctness oracle); doubles are rounded by callers at the output
  * boundary only.
  */
object TextAnalysis {

  /** Whitespace tokenization (same regex class as the oracle's
    * `string_split_regex(text, '\s+')`). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  /** Ratio of non-alphanumeric, non-whitespace chars (punctuation density —
    * a standard low-quality-text signal). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") / length(text)

  /** Fraction of tokens found in `stopwords` (quality + language signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isin(stopwords.map(lit): _*))).cast("double") / size(t)
  }

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deliberately small + deterministic (the point is
    * the operator shape, not linguistic accuracy). */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "to", "and")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "los", "y")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist")

  /** Language-ID: argmax of stopword hits with a fixed tie-break order
    * (en > es > de > unknown). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    def hits(ws: Seq[String]) = size(filter(t, x => x.isin(ws.map(lit): _*)))
    val en = hits(StopwordsEn); val es = hits(StopwordsEs); val de = hits(StopwordsDe)
    when(en === 0 && es === 0 && de === 0, lit("unknown"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Composite quality score in [0,1]: length saturation, punctuation
    * cleanliness, stopword presence, mean-token-length saturation. */
  def qualityScore(text: Column): Column =
    round(
      lit(0.3) * least(lit(1.0), tokenCount(text).cast("double") / 100.0) +
        lit(0.3) * (lit(1.0) - punctRatio(text)) +
        lit(0.2) * stopwordRatio(text, StopwordsEn) +
        lit(0.2) * least(lit(1.0), avgTokenLen(text) / 8.0),
      4)

  /** Rolling polynomial fingerprint over the character stream:
    * `fp = fold(chars)(acc*31 + ascii(c)) mod 1e9+7`. Left-fold order matches
    * the oracle's `list_reduce` exactly; modulus keeps every intermediate
    * below 2^36 so both engines stay in exact int64 arithmetic. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)
}
