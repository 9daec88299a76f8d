package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source-format matrix: the engine's dataflow is format-agnostic — the
  * same events frame written as parquet / ORC / JSON-lines / CSV reads
  * back row-identical through [[Sources.formatScan]] with an explicit
  * schema. Doubles survive because Spark writes shortest-round-trip
  * representations; timestamps are compared at epoch precision. */
class FormatMatrixSpec extends SparkSpec {

  test("parquet, orc, json, and csv round-trip the events frame row-identically") {
    val base = Files.createTempDirectory("fmt").toString
    val ev = graft.Tables(spark, sf("sf0.001")).events.persist()

    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, String, Double, String)] =
      df.select(col("event_id"), col("ts").cast("long").as("ts_l"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5)))
        .toSet

    val want = canon(ev)
    assert(want.size == ev.count().toInt)
    for (format <- Seq("parquet", "orc", "json", "csv")) {
      val path = s"$base/$format"
      ev.write.format(format).option("header", "true").save(path)
      val got = canon(Sources.formatScan(spark, format, path, ev.schema))
      assert(got == want, s"format $format round-trip diverged")
    }
    ev.unpersist()
  }

  test("corrupt JSON lines quarantine under PERMISSIVE; valid rows survive (skip accounting)") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("corrupt").toString
    val lines = Seq(
      """{"id": 1, "name": "ok-one"}""",
      """this is not json at all""",
      """{"id": 2, "name": "ok-two"}""",
      """{"id": "not-a-number", "name": "bad-type"}""",
      """{"id": 3, "name": "ok-three"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "data.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    // the reference's skip-and-count semantics at the format level:
    // malformed records land in the corrupt column instead of killing the
    // job, and the skip COUNT is queryable (O5's failed_docs analog)
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(base)
      .cache() // Spark disallows corrupt-column-only queries on the raw scan
    assert(df.filter(col("_corrupt_record").isNull)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
    df.unpersist()
  }
}
