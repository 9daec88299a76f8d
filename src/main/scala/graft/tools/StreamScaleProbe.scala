package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale measurement for the streaming twins (VERDICT r12 #3): EventTimeSpec
  * proves batch/stream PARITY at test scale, but the state-growth bounds
  * argued in the scaladocs (`streamingRetention` state ∝ users × distinct
  * weeks, `streamingDau` state ∝ active user-days inside the watermark,
  * `streamingAdmit` state ∝ distinct sources) were never MEASURED. This
  * probe drives each twin over a real corpus chopped into micro-batch
  * drops and records, per operator:
  *   - input rows and wall-clock (rows/s throughput),
  *   - number of micro-batches and the max batch duration,
  *   - peak state-store rows and bytes (StreamingQueryProgress
  *     stateOperators — the number that decides executor memory at 100 TB).
  *
  * Run at two SFs, the state-bytes ratio against the corpus-size ratio
  * tests each operator's claimed bound: retention state ∝ distinct users
  * (ScaleUp replicates events under remapped ids, so users grow with SF
  * and proportional state CONFIRMS the per-user bound — the per-user
  * byte constant is the number to watch), dau state ∝ user-days inside
  * the watermark, admit state ∝ distinct sources (should stay ~flat).
  *
  * Usage: StreamScaleProbe [sfDir] [chunks=8] [filesPerTrigger=1]
  * Env: SPARK_GRAFT_MASTER / SPARK_GRAFT_JARS / SPARK_GRAFT_EXEC_MEM /
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_OUT — same contract as graft.Bench.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val chunks = if (args.length > 1) args(1).toInt else 8
    val perTrigger = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b0 = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val b1 = sys.env.get("SPARK_GRAFT_JARS").fold(b0)(j => b0.config("spark.jars", j))
    implicit val spark: SparkSession = sys.env.get("SPARK_GRAFT_EXEC_MEM")
      .fold(b1)(m => b1.config("spark.executor.memory", m))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val t = graft.Tables(spark, dir)
    val scratch = java.nio.file.Files.createTempDirectory("stream-scale").toString

    /** Chop a frame into `chunks` drop files so the stream runs real
      * micro-batches, then drive `mk` over a file stream of them with
      * AvailableNow and collect the progress counters. */
    def drive(name: String, src: DataFrame, mk: DataFrame => DataFrame): String = {
      val in = s"$scratch/$name/in"
      src.repartition(chunks).write.mode("overwrite").parquet(in)
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(in)
      val t0 = System.nanoTime()
      val q = mk(stream).writeStream
        .option("checkpointLocation", s"$scratch/$name/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .format("noop").start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val inputRows = progress.map(_.numInputRows).sum
      val batchMs = progress.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.longValue()))
      val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
      s"""{"op":"$name","sf":"$dir","input_rows":$inputRows,""" +
        s""""wall_s":${f3(wall)},"rows_per_s":${f3(inputRows / math.max(wall, 1e-9))},""" +
        s""""batches":${batchMs.size},"max_batch_s":${f3(batchMs.maxOption.getOrElse(0L) / 1e3)},""" +
        s""""state_rows_peak":${stateRows.maxOption.getOrElse(0L)},""" +
        s""""state_bytes_peak":${stateBytes.maxOption.getOrElse(0L)}}"""
    }

    val ev = t.events.select(col("user_id"), col("ts"))
    val evT = t.events.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type"))
    val docs = t.documents.select(col("source"), col("doc_id"), col("text"))
    val nDocs = docs.count()
    val lines = Seq(
      drive("streamingRetention", ev,
        df => graft.streaming.EventTimeOps.streamingRetention(df).toDF()),
      drive("streamingDau", ev,
        df => graft.streaming.EventTimeOps.streamingDau(df)),
      drive("streamingAdmit", docs,
        df => graft.streaming.EventTimeOps.streamingAdmit(df, cap = nDocs / 4,
          threshold = 5000.0)),
      // the one twin whose exactness needs the FULL ordered history per
      // user (adjacency splicing) - the family's worst-case state bound;
      // r14 made the per-user buffer BOUNDED by default (10k events), so
      // this leg now measures the bounded default
      drive("streamingTransitions", evT,
        df => graft.streaming.EventTimeOps.streamingTransitions(df).toDF())) ++ {
      // hostile-key leg (r14, VERDICT r13 #2): ONE user, 120k events -
      // organic corpora never push a single user past the default bound,
      // so the default-vs-unbounded state contract is measured on the
      // adversarial shape it exists for. Expected: default state bytes
      // PLATEAU near maxBuffer x ~94 B while the explicit unbounded
      // opt-in grows with every event ingested.
      val hostile = spark.range(120000).select(
        lit(1L).as("user_id"), col("id").as("event_id"),
        expr("timestamp_micros(id * 1000000)").as("ts"),
        concat(lit("e"), pmod(col("id"), lit(5))).as("event_type"))
      Seq(
        drive("streamingTransitionsHostileBounded", hostile,
          df => graft.streaming.EventTimeOps.streamingTransitions(df).toDF()),
        drive("streamingTransitionsHostileUnbounded", hostile,
          df => graft.streaming.EventTimeOps.streamingTransitions(df,
            unbounded = true).toDF()))
    }
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        lines.mkString("", "\n", "\n")): Unit)
    spark.stop()
    lines.foreach(println)
  }
}
