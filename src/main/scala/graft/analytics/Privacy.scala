package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-time privacy screens beyond per-row redaction
  * ([[TextAnalysis.redactPii]] handles emails/phones/cards in-place):
  * k-anonymity suppression over quasi-identifier tuples — a document whose
  * (source, language, size-band, …) combination is shared by fewer than k
  * documents is identifying even with its text scrubbed, so the release
  * gate withholds the whole group.
  *
  * Shape at 100 TB: the quasi-identifier frame is bounded by the PRODUCT of
  * the QI cardinalities (sources × langs × bands — config-sized, not
  * corpus-sized), so the group-count aggregate is map-side combinable down
  * to that tiny frame and the verdict join broadcasts it back. Two narrow
  * passes over the QI projection (group aggregate + verdict probe), no
  * corpus-sized shuffle — deliberately NOT a window over the QI keys,
  * which would shuffle the whole corpus into a handful of group-sized
  * partitions. QI derivations must be deterministic (the two passes
  * evaluate them independently).
  */
object Privacy {

  /** Per-document k-anonymity verdict over the given quasi-identifier
    * columns: (id, QI…, group_n, released) where released ⇔ the QI group
    * has ≥ k members. `quasiIds` must be LOW-cardinality derivations
    * (band, not raw value) — that is the operator's contract, and what
    * keeps the group frame broadcastable.
    *
    * NULL-valued quasi-identifiers form a group like any other (r16 review
    * sweep: the previous plain equi-join-back silently DROPPED null-QI
    * docs from the verdict frame — a release gate must emit one row per
    * document, and an absent verdict is indistinguishable from released
    * depending on the consumer's join direction). The join-back is
    * null-safe (`<=>`), matching groupBy's null handling. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[(String, Column)], k: Int = 5,
                 idCol: String = "doc_id"): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    val qiNames = quasiIds.map(_._1)
    val tagged = df.select(
      (col(idCol).as("doc_id") +: quasiIds.map { case (n, c) => c.as(n) }): _*)
    val groups = tagged.groupBy(qiNames.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .select((qiNames.map(n => col(n).as(s"__g_$n")) :+ col("group_n")): _*)
    val cond = qiNames.map(n => tagged(n) <=> col(s"__g_$n")).reduce(_ && _)
    tagged.join(broadcast(groups), cond)
      .withColumn("released", col("group_n") >= k)
      .select((col("doc_id") +: qiNames.map(col)) ++
        Seq(col("group_n"), col("released")): _*)
  }
}
