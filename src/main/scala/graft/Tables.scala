package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic corpus (see TESTDATA.md).
  *
  * Every loader is a plain parquet scan: Catalyst handles column pruning and
  * predicate pushdown into the scan (verified via `.explain("formatted")` —
  * `PushedFilters` / `ReadSchema`), so callers should filter/select on the
  * returned DataFrame rather than pre-materializing.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; we then truncate ns→µs with
    * *integer* division (a double roundtrip would lose precision: 2024 epoch
    * ns ≈ 1.7e18 > 2^53) and surface a proper TimestampType column. */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.sql.functions.{col, expr}
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
