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

  /** The timestamp-encoding CONTRACT: `events.ts` has shipped as parquet
    * TIMESTAMP(NANOS) (surfacing as LongType under `nanosAsLong=true`), as
    * µs TIMESTAMP_NTZ (isAdjustedToUTC=false), and as µs UTC-adjusted
    * TimestampType across driver regens — and a round went red when the
    * engine silently assumed one of them. This case pins the contract:
    * whatever the physical encoding, [[graft.Tables.events]] yields ONE
    * logical schema (UTC TimestampType) and byte-identical epoch math, so
    * `cast("long")` window/sessionize/range-join code can never notice a
    * regen again. */
  test("events.ts contract: ns-as-long, us-NTZ, and us-UTC encodings yield one schema and identical epoch math") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.expressions.Window
    val base = Files.createTempDirectory("tsenc").toString
    val ev = graft.Tables(spark, sf("sf0.001")).events.persist()

    // (1) ns-as-long: exactly what `spark.sql.legacy.parquet.nanosAsLong=true`
    // surfaces for parquet TIMESTAMP(NANOS) — a raw LongType nanosecond count.
    ev.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.parquet(s"$base/ns/events.parquet")
    // (2) µs wall-clock, isAdjustedToUTC=false → TimestampNTZType on read.
    ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$base/ntz/events.parquet")
    // (3) µs UTC-adjusted instant → TimestampType on read.
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try ev.write.parquet(s"$base/utc/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)

    // Preconditions: the raw scans really do surface three DIFFERENT physical
    // types — otherwise this case would pass vacuously.
    assert(spark.read.parquet(s"$base/ns/events.parquet").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$base/ntz/events.parquet").schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$base/utc/events.parquet").schema("ts").dataType == TimestampType)

    // Contract 1: one logical schema out of the loader, whatever went in.
    val frames = Seq("ns", "ntz", "utc").map(e => e -> graft.Tables(spark, s"$base/$e").events)
    frames.foreach { case (e, df) =>
      assert(df.schema("ts").dataType == TimestampType, s"encoding $e not normalized")
    }

    // Contract 2: w3_sessionize-shaped epoch math (cast("long"), lag-gap
    // session breaks) is value-identical across encodings AND matches the
    // already-normalized source frame.
    def sessions(df: DataFrame): Set[(Long, Long, Long, Long)] = {
      val w = Window.partitionBy("user_id").orderBy("tl")
      df.select(col("user_id"), col("ts").cast("long").as("tl"))
        .withColumn("gap", col("tl") - lag("tl", 1).over(w))
        .withColumn("brk", when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("brk").as("n_sessions"), min("tl").as("first_s"), max("tl").as("last_s"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    val want = sessions(ev)
    frames.foreach { case (e, df) =>
      assert(sessions(df) == want, s"encoding $e epoch math diverged")
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
