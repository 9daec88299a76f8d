package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and canonical-URL deduplication — the first guard a
  * web-crawl pipeline runs: the same page arrives under `http`/`https`,
  * `WWW.`/bare host, with and without default ports, trailing slashes,
  * fragments, and tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`),
  * and every variant must collapse to ONE canonical key before any
  * content-level dedup spends cycles on it.
  *
  * Everything here is closed-form Catalyst expressions (regexp extract /
  * replace + one array filter) — fully codegen'd, zero shuffle for the
  * canonicalization itself; the dedup is one groupBy on the canonical
  * string (whole-stage map-side combine, 8-byte-ish keys after Spark's
  * hash exchange). At 100 TB the canonical pass is a narrow projection over
  * the crawl manifest (URLs, not page bodies), so the exchange moves URL
  * strings only — page content never shuffles.
  */
object UrlOps {

  /** Params stripped during canonicalization (shared with the SQL oracle
    * via [[trackingParamRegex]] so the two can never drift). */
  val trackingParamRegex: String = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

  /** Canonical form of an absolute `scheme://host[:port]/path[?q][#f]` URL:
    *
    *   1. scheme and host lowercased (path/query case is significant);
    *   2. leading `www.` stripped; the scheme's OWN default port stripped
    *      (`:80` for http, `:443` for https — never cross-scheme);
    *   3. fragment dropped entirely;
    *   4. tracking query params ([[trackingParamRegex]]) removed, the
    *      survivors kept in their original order (sorting would conflate
    *      semantically ordered params; order-insensitive callers can sort
    *      the array before joining);
    *   5. trailing slashes stripped from the path (`/a/` ≡ `/a`; the root
    *      path collapses to the bare authority).
    *
    * Non-URL input (no `scheme://`) canonicalizes to the empty-ish string
    * the regexes produce — callers screening crawl manifests filter those
    * rows first. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // A port is "default" only for ITS scheme: http://h:443 and https://h:80
    // are real non-default ports and must survive, or urlDedup conflates
    // distinct origins and drops non-duplicate documents (r10 ADVICE).
    val noDefaultPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noDefaultPort, "^www\\.", "")
    // path+query with the fragment dropped ([^#]*), then split at '?'
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"),
      p => !p.rlike(trackingParamRegex) && p =!= "")
    val q = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Canonical-URL dedup: per input row, its canonical URL, the group's
    * keeper (min id — the earliest crawl wins), whether THIS row is the
    * keeper, and the group size.
    *
    * Group stats come from window aggregates over `canonical_url`, not a
    * groupBy + join-back: the canon frame is referenced ONCE (no recompute
    * of the regex chain, no divergence risk on non-deterministic inputs —
    * the r9 multi-referenced-stage lesson, flagged again by r10 ADVICE),
    * and the plan is one hash exchange + sort instead of the self-join's
    * two exchanges. Canonical URLs are near-unique keys (dup groups are
    * small), so the window partitions are tiny — no skew concern. */
  def urlDedup(df: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canon = df.select(col(idCol).as("doc_id"),
      canonicalizeUrl(col(urlCol)).as("canonical_url"))
    val w = Window.partitionBy("canonical_url")
    canon
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col("doc_id"), col("canonical_url"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("is_keeper"), col("n_copies"))
  }
}
