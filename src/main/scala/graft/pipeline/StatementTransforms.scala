package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level transforms reproducing the reference's per-record statement
  * processing (SURVEY §2 O4–O10), as pure Catalyst expressions — everything
  * here stays inside whole-stage codegen; no UDFs.
  *
  * Reference citations are into `/root/reference/` (read-only snapshot).
  */
object StatementTransforms {

  /** O6 — actor-name normalization (`src/main.rs:627-634`).
    *
    * The reference computes `name.split('@').next().or_else(|| name.split(':')
    * .last()).unwrap_or(name)`. In Rust, `split('@').next()` is ALWAYS `Some`
    * (even with no `'@'` it yields the whole string), so the `':'` fallback is
    * dead code. The *actual* semantics — which we reproduce — are:
    * everything before the first `'@'`; the whole string when no `'@'`;
    * empty result (e.g. `"@x"` or `""`) is an error → record skipped
    * (`src/main.rs:633-635`).
    */
  def normalizeActorName(name: Column): Column =
    when(name.contains("@"), substring_index(name, "@", 1)).otherwise(name)

  /** O6 error branch: empty normalized value ⇒ invalid (`src/main.rs:633`). */
  def isValidActorName(name: Column): Column =
    name.isNotNull && length(normalizeActorName(name)) > 0

  /** O7 — salted, tenant-scoped SHA-256 anonymization (`src/main.rs:637-641`):
    * `sha256(salt ∥ tenant ∥ normalized_name)` as lowercase hex. Deterministic
    * per tenant so the same user always maps to the same hash (which is what
    * makes the opt-out membership join O11 work). Pure built-in — codegen'd.
    */
  def anonymizeActor(name: Column, salt: String, tenant: String): Column =
    sha2(concat(lit(salt), lit(tenant), normalizeActorName(name)), 256)

  /** O10 — the reference's `process_statement` escaping chain
    * (`src/main.rs:647-672`, regexes at `:33-37`), needed only because the
    * reference embeds values into INSERT SQL by string concatenation. We keep
    * it byte-compatible behind this function (the Spark sink itself binds
    * parameters and does NOT need it).
    *
    * The reference chains three regex passes over backslash runs. Their net
    * effect has a closed form (derived by composing the passes; unit-tested
    * against literal vectors in `StatementTransformsSpec`):
    *   - every maximal ODD-length backslash run  → `\\`   (2 backslashes)
    *   - every maximal EVEN-length backslash run → `\\\\` (4 backslashes)
    * then strip ALL leading/trailing `"` chars, then `\'` → `\\'`, then
    * `'` → `\'` (sequential literal replaces, `src/main.rs:665-669`).
    *
    * Implemented without lookbehind (so the same 4 regex steps also express
    * the oracle in DuckDB's RE2): pair-collapse runs to a U+0001 marker,
    * tag the odd leftover as U+0002, then expand both markers.
    */
  def processStatement(statement: Column): Column = {
    val pairMark = "\u0001" // stands for one *pair* of backslashes
    val oddMark = "\u0002"  // stands for an odd-length run's net result
    val s1 = regexp_replace(statement, "\\\\\\\\", pairMark)         // 2 backslashes -> pair marker
    val s2 = regexp_replace(s1, pairMark + "*\\\\", oddMark)          // odd leftover (with its pairs) -> odd marker
    val s3 = regexp_replace(s2, pairMark + "+", "\\\\\\\\\\\\\\\\")   // even run -> 4 backslashes
    val s4 = regexp_replace(s3, oddMark, "\\\\\\\\")                  // odd run -> 2 backslashes
    val trimmed = regexp_replace(regexp_replace(s4, "^\"+", ""), "\"+$", "")
    val r1 = regexp_replace(trimmed, "\\\\'", "\\\\\\\\'")            // \'  ->  \\'
    regexp_replace(r1, "'", "\\\\'")                                  // '   ->  \'
  }

  /** O14 value formatting — event timestamp rendered for the sink exactly as
    * the reference's `%Y-%m-%d %H:%M:%S%.3f` (`src/main.rs:857-862`). */
  def sinkTimestamp(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm:ss.SSS")
}
