package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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
    * a standard low-quality-text signal). `try_divide` pins the
    * empty-string contract to NULL — the DuckDB oracle's 0/0 is NULL too,
    * while Spark's ANSI-mode `/` would throw DIVIDE_BY_ZERO instead. */
  def punctRatio(text: Column): Column =
    try_divide(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double"),
      length(text))

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

  /** PII redaction: emails, dashed/dotted phone numbers, and IPv4 literals
    * replaced with typed placeholders, in that order (emails first — an
    * address contains digit runs a later pass could half-match). Patterns
    * are RE2-safe (no lookaround/backrefs) so the redaction is portable
    * across regex engines; three `regexp_replace` passes, fully
    * codegen-friendly, zero shuffle at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
      "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>")

  /** Sliding word bigrams WITH multiplicity (unlike [[Dedup.shingles]],
    * which dedups for Jaccard) — repetition measurement needs the counts.
    *
    * Built by zipping two row-level slices, NOT by indexing into the token
    * array inside a lambda: interpreted HOF lambdas re-evaluate captured
    * expressions per ELEMENT (no common-subexpression elimination), so
    * `element_at(split(text), i)` re-tokenizes the document once per
    * bigram — O(tokens²) per row (measured 6 s vs 1.4 s at sf0.1). The
    * slices evaluate `split` a fixed number of times per ROW. */
  def bigrams(text: Column): Column = bigramsOfTokens(tokens(text))

  /** Bigrams from an already-tokenized array — lets callers that persist a
    * (doc_id, tokens) frame derive bigrams without re-tokenizing the text
    * (see [[Search.bigramSurprisal]]'s single-scan contract). */
  def bigramsOfTokens(t: Column): Column =
    when(size(t) >= 2,
      zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))

  /** Gopher-style repetition signals per document: fraction of tokens that
    * are repeats of an earlier token, the most-frequent token's share, and
    * the repeated-bigram fraction. Computed distributed — explode to a
    * (doc, term) stream, two-level aggregate — rather than per-row lambda
    * folds: partial aggregation combines map-side, the only shuffle is
    * doc_id-keyed, and doc_id is skew-free by construction, so the shape
    * holds at 100 TB where a per-row O(tokens²) HOF would not. */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val uni = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("cnt").as("max_cnt"))
    val bi = docs.select(col(idCol).as("doc_id"),
        explode(bigrams(col(textCol))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bi"))
    uni.join(bi, Seq("doc_id"))
      .select(col("doc_id"),
        round((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"), 4)
          .as("dup_tok_frac"),
        round(col("max_cnt").cast("double") / col("n_tokens"), 4).as("top_tok_frac"),
        round((col("n_bigrams") - col("n_distinct_bi")).cast("double") / col("n_bigrams"), 4)
          .as("dup_2gram_frac"))
  }

  /** Rolling polynomial fingerprint over the character stream:
    * `fp = fold(chars)(acc*31 + ascii(c)) mod 1e9+7`. Left-fold order matches
    * the oracle's `list_reduce` exactly; modulus keeps every intermediate
    * below 2^36 so both engines stay in exact int64 arithmetic. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Gopher-style document quality gates (Rae et al. 2021 §A1.1, adapted to
    * this corpus' thresholds): token-count bounds, mean-token-length bounds,
    * minimum distinct-stopword presence, and a repeated-token-fraction cap.
    * A training-data pipeline runs these as the FIRST filter — they are the
    * cheapest signal per byte and remove the bulk of junk before any
    * dedup/similarity stage spends a shuffle on it.
    *
    * Shape at 100 TB: one explode + two-level aggregate, identical to
    * [[repetitionStats]] — partials combine map-side, the only shuffle is
    * doc_id-keyed (skew-free by construction). Everything downstream of the
    * aggregate is a per-row projection. Gate flags are int 0/1 (not boolean)
    * so the oracle hash is engine-neutral.
    */
  def gopherGates(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id",
                  minTokens: Long = 30, maxTokens: Long = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minStopHits: Long = 2, maxDupFrac: Double = 0.75): DataFrame = {
    val stats = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(length(col("tok")) * col("cnt")).as("sum_len"),
        count(when(col("tok").isin(StopwordsEn.map(lit): _*), 1)).as("n_stop"))
    val meanLen = col("sum_len").cast("double") / col("n_tokens")
    val dupFrac = (col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens")
    stats.select(
      col("doc_id"),
      col("n_tokens"),
      round(meanLen, 4).as("mean_tok_len"),
      col("n_stop"),
      round(dupFrac, 4).as("dup_tok_frac"),
      (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
        .cast("int").as("gate_len"),
      (meanLen >= minMeanLen && meanLen <= maxMeanLen).cast("int").as("gate_wordlen"),
      (col("n_stop") >= minStopHits).cast("int").as("gate_stop"),
      (dupFrac <= maxDupFrac).cast("int").as("gate_rep"))
      .withColumn("keep",
        (col("gate_len") === 1 && col("gate_wordlen") === 1 &&
          col("gate_stop") === 1 && col("gate_rep") === 1).cast("int"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS local fingerprinting scheme), at token granularity: hash every
    * k-token gram, slide a window of `w` consecutive gram hashes, select
    * each window's minimum, emit the distinct selected hashes. Guarantee:
    * any match of `w + k - 1` or more contiguous tokens between two
    * documents shares at least one selected fingerprint — the indexable
    * artifact for SUBSTRING-level dedup, which whole-document Jaccard and
    * simhash both miss.
    *
    * Scale shape: pure narrow per-row computation with zero shuffle;
    * density is 2/(w+1) of grams, so the emitted index is a fraction of the
    * corpus and the downstream pair-join shuffles 8-byte fingerprints only.
    * Gram hashes are sha256-prefix 60-bit ints, the same engine-neutral
    * formula as [[Dedup.hash60]]. Backed by the compiled
    * [[graft.functions.WinnowFingerprintsExpr]]; the declarative twin below
    * is the semantics contract (and what the DuckDB oracle mirrors), but its
    * window-min lambda re-evaluates the captured gram-hash array per WINDOW
    * (interpreted HOFs do no CSE) — O(grams²) sha256 calls per document,
    * measured 87 s vs ~1 s on the sf0.1 corpus.
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    graft.functions.GraftFunctions.winnowFast(text, k, w)

  /** Declarative twin of [[winnowFingerprints]] — parity-tested against the
    * compiled expression; do not use on a hot path (see scaladoc above). */
  def winnowFingerprintsDeclarative(text: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val t = tokens(text)
    val nGrams = size(t) - (k - 1)
    // k-gram strings by zipping k row-level slices (k fixed at plan time).
    val grams = (2 to k).foldLeft(slice(t, lit(1), nGrams)) { (acc, j) =>
      zip_with(acc, slice(t, lit(j), nGrams), (a, b) => concat_ws(" ", a, b))
    }
    val hashes = transform(grams,
      g => conv(substring(sha2(g, 256), 1, 15), 16, 10).cast("long"))
    val mins = transform(sequence(lit(1), nGrams - (w - 1)),
      i => array_min(slice(hashes, i, lit(w))))
    // Guard BOTH degenerate regimes: sequence(1, n) with n < 1 generates a
    // DESCENDING list (step -1), and slice with negative length throws.
    when(nGrams >= w, array_distinct(mins))
      .when(nGrams >= 1, array_distinct(array(array_min(hashes))))
      .otherwise(array().cast("array<long>"))
  }

  // ---------------------------------------------------------------------
  // Encoding repair (ftfy-style mojibake fix)
  // ---------------------------------------------------------------------

  /** The classic double-encoding table: a UTF-8 byte sequence read back
    * through cp1252 turns one character into the 2–3 character "mojibake"
    * on the left; repair maps it back. Longest sequences first so the
    * 3-char punctuation forms never half-match after a 2-char repair.
    * Only cleanly cp1252-mappable sequences are listed (bytes 0x81/0x8D/
    * 0x8F/0x90/0x9D have no cp1252 mapping and survive a real decode as
    * replacement chars — out of scope for the deterministic repair).
    *
    * Reference-class operator: the text-cleaning pass every web-scale
    * training corpus runs before tokenization (ftfy's `fix_encoding`). */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", // â€™ -> right single quote
    "â€œ" -> "“", // â€œ -> left double quote
    "â€”" -> "—", // â€" -> em dash
    "â€¦" -> "…", // â€¦ -> ellipsis
    "Ã©" -> "é",       // Ã© -> é
    "Ã¶" -> "ö",       // Ã¶ -> ö
    "Ã¼" -> "ü",       // Ã¼ -> ü
    "Ã±" -> "ñ",       // Ã± -> ñ
    "Ã¤" -> "ä")       // Ã¤ -> ä

  /** Repair cp1252 mojibake: a fixed chain of `replace` calls (pure
    * built-ins, codegen'd, zero shuffle at any scale). Deterministic: the
    * table order is part of the contract and the DuckDB oracle applies the
    * identical chain. */
  def fixMojibake(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** The corruption inverse of [[fixMojibake]] — renders clean text the way
    * a UTF-8→cp1252 mis-decode would. Test/demo helper: lets a query
    * synthesize deterministic mojibake on an ASCII corpus and prove the
    * repair round-trips (`fixMojibake(mojibakeEncode(s)) == s` for any `s`
    * free of mojibake sequences). */
  def mojibakeEncode(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (acc, (bad, good)) =>
      replace(acc, lit(good), lit(bad))
    }

  // ---------------------------------------------------------------------
  // HTML boilerplate extraction
  // ---------------------------------------------------------------------

  /** Whitespace-collapse + trim (the normalization both engines share). */
  def collapseWs(s: Column): Column = regexp_replace(trim(s), "\\s+", " ")

  /** HTML entity decode for the common named + numeric forms. `&amp;` is
    * replaced LAST so a literal `&amp;lt;` decodes to `&lt;` (text), not
    * `<` — the standard single-pass contract. Fixed chain, codegen'd. */
  def decodeEntities(s: Column): Column =
    Seq("&quot;" -> "\"", "&#39;" -> "'", "&lt;" -> "<", "&gt;" -> ">",
        "&copy;" -> "©", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(s) { case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch)) }

  /** Inter-tag text segments of an HTML document: split on tags, collapse
    * whitespace, drop empties. One narrow per-row projection. */
  def htmlSegments(html: Column): Column =
    filter(transform(split(html, "<[^>]*>"), s => collapseWs(s)),
      s => length(s) > 0)

  /** Main-content extraction by segment token density — the trafilatura/
    * jusText-family heuristic reduced to its deterministic core: segments
    * with fewer than `minTokens` tokens are boilerplate (nav menus,
    * footers, style payloads), the rest joins in document order and
    * entity-decodes. Zero shuffle; the whole pass is per-row built-ins so
    * it rides a parquet scan at 100 TB. */
  def htmlExtract(html: Column, minTokens: Int = 7): Column =
    decodeEntities(concat_ws(" ",
      filter(htmlSegments(html), s => size(split(s, " ")) >= minTokens)))

  // ---------------------------------------------------------------------
  // Character-entropy gate
  // ---------------------------------------------------------------------

  /** Per-document Shannon character entropy (nats) — the cheap gibberish /
    * binary-spill / repeated-char-flood gate a curation pipeline runs
    * before the token-level quality scores.
    *
    * Shape at 100 TB: explode to a (doc, char) stream and aggregate — the
    * (doc_id, ch) key has at most |alphabet| rows per doc, map-side combine
    * collapses each partition's counts before the only shuffle (doc_id is
    * skew-free by construction). The per-doc total joins back on the same
    * doc_id partitioning. No per-row O(n·alphabet) lambda folds.
    *
    * Cross-engine determinism: the only transcendental is `ln`, quantized
    * per (count, total) pair to integer micro-nats exactly like
    * [[Search.idfMicro]] — entropy = Σ c·round(ln(N/c)·1e6) / N / 1e6 with
    * the integer sum exact (≤ N·ln(N)·1e6 ≪ 2^53 for any real document)
    * and the final double division a fixed two-step chain. */
  def charEntropy(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val cnt = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("doc_id").agg(sum(col("c")).as("n"))
    cnt.join(tot, "doc_id")
      .withColumn("s_micro",
        round(log(col("n").cast("double") / col("c")) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("c") * col("s_micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        round(col("sum_micro").cast("double") / col("n_chars") / 1e6, 4)
          .as("entropy_nats"))
  }

  /** Per-ROW twin of [[charEntropy]] for STATELESS streaming maps: appends
    * (n_chars, n_distinct_chars, entropy_nats) computed entirely from the
    * row's own text — no explode, no shuffle, usable inside a
    * micro-batch's narrow projection.
    *
    * EXACT equality with the distributed aggregate: both sum the same set
    * of integer micro-nat terms c·round(ln(N/c)·1e6) (integer addition is
    * order-free) and apply the same final two-step double division, so a
    * streaming gate against a batch-calibrated threshold decides
    * identically to the batch gate (proven row-for-row in
    * Round10TextSpec and end-to-end in WebIngestParitySpec).
    *
    * Cost: O(len·alphabet) per row (the per-distinct-char count scans the
    * char array) vs the aggregate's O(len) — the right trade ONLY inside
    * a per-row map; corpus-scale batch scoring should use [[charEntropy]].
    * All intermediates are materialized attributes, so no captured
    * expression re-evaluates per lambda element. */
  def withRowEntropy(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__chars", split(col(textCol), ""))
      .withColumn("__dc", array_distinct(col("__chars")))
      .withColumn("n_chars", size(col("__chars")).cast("long"))
      .withColumn("n_distinct_chars", size(col("__dc")).cast("long"))
      .withColumn("__sum_micro",
        aggregate(
          transform(col("__dc"),
            c => size(filter(col("__chars"), x => x === c)).cast("long")),
          lit(0L),
          (acc, cnt) => acc + cnt *
            round(log(col("n_chars").cast("double") / cnt) * 1e6).cast("long")))
      .withColumn("entropy_nats",
        round(col("__sum_micro").cast("double") / col("n_chars") / 1e6, 4))
      .drop("__chars", "__dc", "__sum_micro")

  /** Per-source corpus mix report — the dashboard aggregate a curation
    * pipeline monitors per ingest: document/token mass, mean length,
    * language share, and exact-duplicate rate, one row per source.
    *
    * Shape at 100 TB: ONE corpus scan into a two-level aggregate. Level 1
    * groups on (source, text-hash-60) carrying count/token/char/lang
    * partials — the shuffle key is a digest, never the text, and map-side
    * combine collapses exact duplicates before the exchange; level 2
    * collapses to one row per source (dup_docs = members of >1-sized hash
    * groups). Output is sources-sized; ratios are rounded at the output
    * boundary only, over exact integer sums. */
  def corpusReport(docs: DataFrame): DataFrame = {
    val perHash = docs
      .groupBy(col("source"), Dedup.hash60(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"),
        sum(size(tokens(col("text"))).cast("long")).as("tk"),
        sum(col("n_chars").cast("long")).as("ch"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("en"))
    perHash.groupBy("source").agg(
        sum(col("cnt")).as("n_docs"),
        sum(col("tk")).as("n_tokens"),
        sum(col("ch")).as("n_chars_sum"),
        sum(col("en")).as("n_en"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_chars_sum").cast("double") / col("n_docs"), 4).as("avg_chars"),
        round(col("n_en").cast("double") / col("n_docs"), 4).as("pct_en"),
        col("dup_docs"),
        round(col("dup_docs").cast("double") / col("n_docs"), 4).as("dup_rate"))
      .orderBy(col("source"))
  }

  /** Term-blocklist gate (the C4 badwords-filter shape): per document, the
    * count of DISTINCT blocklist terms present, total occurrences, severe
    * occurrences, and the block verdict — any severe term blocks outright;
    * otherwise ≥ `minDistinct` distinct ordinary terms block.
    *
    * The blocklist arrives as a DataFrame (term, severe) because real
    * blocklists are config data in the thousands of terms — too big for a
    * literal IN-array expression, trivially broadcastable. The token stream
    * inner-joins the broadcast list (only matching tokens survive the
    * probe), aggregates per doc with map-side combine, and left-joins back
    * so clean docs still get a verdict row. At 100 TB: one narrow token
    * pass, broadcast probe, doc-keyed combine — no corpus-sized wide rows
    * on the wire.
    *
    * `docs` is referenced twice, deliberately: the tokenize pass lives only
    * on the singly-referenced hits branch (it runs ONCE), and the join-back
    * branch prunes to the id column — a second columnar scan of one
    * column, far cheaper than pinning (id, text) with localCheckpoint.
    * Contract: `docs` must be deterministic (a table/file scan, not e.g. a
    * sample or shuffle-order-dependent frame); otherwise the two branches
    * can see different row sets — callers with non-deterministic frames
    * pin upstream. (Keeping hits-only aggregation also matters at scale:
    * folding the verdict into one pass via explode_outer would drag the
    * ENTIRE token stream through the count_distinct expand instead of just
    * the rare blocklist hits.) */
  def blocklistGate(docs: DataFrame, blocklist: DataFrame, minDistinct: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val hits = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .join(broadcast(blocklist.select(col("term"), col("severe"))), "term")
      .groupBy("doc_id")
      .agg(count_distinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_hits"),
        sum(when(col("severe"), 1L).otherwise(0L)).as("n_severe"))
    docs.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_severe"), lit(0L)).as("n_severe"))
      .withColumn("blocked",
        col("n_severe") > 0 || col("n_terms") >= minDistinct)
  }
}
