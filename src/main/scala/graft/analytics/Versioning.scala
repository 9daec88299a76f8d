package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the dataset-versioning primitive: given two
  * releases of a corpus, classify every document as `added`, `removed`,
  * `changed`, or `unchanged`. This is what a training-data pipeline runs
  * between crawl refreshes to (a) scope incremental dedup/curation to the
  * `added`+`changed` delta instead of reprocessing 100 TB, and (b) audit a
  * release ("what exactly moved since v3?") for the dataset card.
  *
  * Shape at 100 TB: each side collapses FIRST to (id, sha256(content)) —
  * a narrow ~72-byte row — so the full-outer join exchanges fingerprints,
  * never document bodies. The join key is the doc id (skew-free by
  * construction in any id-assigned corpus); with both releases stored
  * bucketed by id the exchange disappears entirely (see BucketingSpec's
  * bucket-join evidence for the identical pattern).
  */
object Versioning {

  /** Per-document diff of two corpus snapshots. Output: one row per id
    * present in EITHER side — (doc_id, old_hash, new_hash, status) with
    * status ∈ added | removed | changed | unchanged. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol).as("doc_id"),
      sha2(col(textCol), 256).as("old_hash"), lit(true).as("old_present"))
    val n = newDocs.select(col(idCol).as("doc_id"),
      sha2(col(textCol), 256).as("new_hash"), lit(true).as("new_present"))
    // Presence comes from the JOIN (side markers), never from hash
    // nullability: sha2 of a null text is null, so a doc present in both
    // snapshots with null text would otherwise read as 'added' and
    // null==null could never yield 'unchanged' (r10 ADVICE). Hash equality
    // is null-safe (<=>) for the same reason.
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_present").isNull, lit("added"))
          .when(col("new_present").isNull, lit("removed"))
          .when(col("old_hash") <=> col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("old_present", "new_present")
  }

  /** Release-note rollup of [[corpusDiff]]: one row per status with doc
    * counts — the four numbers a dataset card quotes per version bump. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("status").agg(count(lit(1)).as("n_docs"))
}
