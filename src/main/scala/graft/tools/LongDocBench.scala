package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Dedup

/** Dev tool: long-document microbench for `intraDocSpanDedup` — the
  * TIMING companion to IntradocLeakageSpec's semantic parity tests.
  *
  * The r9 form computed first-occurrence with
  * `filter(__spans, (s,i) -> array_position(__spans, s) = i + 1)` —
  * an O(spans²) string-compare scan per row. At the composed admission
  * DAG's `spanTokens=2`, a 100k-token document is 50k spans → 2.5e9
  * compares in ONE task with no parallelism to recover it. The r10 form
  * is `array_distinct` — Spark's linear hash-set walk that preserves
  * first-occurrence order (identical semantics, proven row-for-row here
  * before timing).
  *
  * Synthesizes documents of growing token counts (default 5k→80k,
  * doubling) with a repeated-boilerplate tail (the looping-scraper shape
  * the operator exists for), then times both forms per size. Near-linear
  * time-vs-tokens for array_distinct and super-linear blowup for the
  * array_position form is the expected report; numbers go to SCALING.md.
  *
  * Usage: LongDocBench [docsPerSize=64] [maxTokens=80000]
  */
object LongDocBench {
  /** The r9 quadratic form, kept verbatim for the A/B. */
  def quadraticForm(docs: DataFrame, spanTokens: Int): DataFrame = {
    val st = spanTokens
    docs
      .select(col("doc_id"),
        graft.analytics.TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__spans", expr(
        s"""transform(sequence(0L, (size(__toks) + ${st - 1}L) div ${st}L - 1L),
           |  i -> array_join(slice(__toks, int(i * $st + 1), $st), ' '))""".stripMargin))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("__spans")).cast("long").as("n_spans"),
        expr("filter(__spans, (s, i) -> array_position(__spans, s) = i + 1)").as("__kept"))
      .select(col("doc_id"), col("n_spans"),
        (col("n_spans") - org.apache.spark.sql.functions.size(col("__kept")))
          .cast("long").as("n_removed"),
        array_join(col("__kept"), " ").as("kept_text"))
  }

  /** Deterministic corpus: `n` docs of `tokens` tokens each; the second
    * half of every doc repeats a 200-token block (so the trim has real
    * work at every size; vocabulary is doc-salted so spans rarely collide
    * across the informative prefix). */
  def synth(spark: SparkSession, n: Int, tokens: Int): DataFrame = {
    import spark.implicits._
    (1 to n).toDF("doc_id")
      .withColumn("text", expr(
        s"""array_join(transform(sequence(1, $tokens),
           |  i -> CASE WHEN i > $tokens / 2 THEN concat('rep', pmod(i, 200))
           |            ELSE concat('w', doc_id, 'x', i) END), ' ')""".stripMargin))
      .repartition(16)
      .localCheckpoint(true)   // synthesis cost must not ride the timing
  }

  def main(args: Array[String]): Unit = {
    val docsPerSize = args.headOption.map(_.toInt).getOrElse(64)
    val maxTokens = if (args.length > 1) args(1).toInt else 80000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // semantic parity gate before any timing: both forms row-for-row equal
    val probe = synth(spark, 8, 4000)
    val a = Dedup.intraDocSpanDedup(probe, spanTokens = 2).orderBy("doc_id").collect()
    val b = quadraticForm(probe, spanTokens = 2).orderBy("doc_id").collect()
    require(a.sameElements(b), "array_distinct form diverges from array_position form")
    println("parity: OK (8 docs x 4000 tokens, row-for-row)")

    // warmup both paths
    time(Dedup.intraDocSpanDedup(probe, spanTokens = 2))
    time(quadraticForm(probe, spanTokens = 2))

    // cdc leg: the round-10 chunking claims O(tokens*w) per document —
    // timed on the same ladder (chunk stream materialized via noop)
    time(Dedup.cdcChunks(probe))
    println(f"${"tokens"}%8s ${"spans"}%8s ${"linear_s"}%10s ${"quadratic_s"}%12s ${"ratio"}%8s ${"cdc_s"}%8s")
    var sizes = List.empty[(Int, Double, Double, Double)]
    var t = 5000
    while (t <= maxTokens) {
      val d = synth(spark, docsPerSize, t)
      val lin = time(Dedup.intraDocSpanDedup(d, spanTokens = 2))
      val quad = time(quadraticForm(d, spanTokens = 2))
      val cdc = time(Dedup.cdcChunks(d))
      println(f"$t%8d ${t / 2}%8d $lin%10.2f $quad%12.2f ${quad / lin}%8.1f $cdc%8.2f")
      sizes ::= ((t, lin, quad, cdc))
      d.unpersist()
      t *= 2
    }
    // fitted exponents over the doubling ladder (log2 slope, last/first)
    val s = sizes.reverse
    def exp(f: ((Int, Double, Double, Double)) => Double): Double =
      math.log(f(s.last) / f(s.head)) / math.log(s.last._1.toDouble / s.head._1)
    println(f"fitted exponent linear=${exp(_._2)}%.2f quadratic=${exp(_._3)}%.2f " +
      f"cdc=${exp(_._4)}%.2f " +
      s"over tokens=${s.head._1}..${s.last._1}")
    spark.stop()
  }
}
