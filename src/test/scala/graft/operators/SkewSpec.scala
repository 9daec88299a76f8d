package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key stress for the per-user window family (VERDICT r8 #2): one user
  * holds ~10% of all events — the shape that pins 10% of a 100 TB table on
  * one core under `Window.partitionBy(user_id)`, because AQE can split
  * skewed shuffle blocks for joins/aggregates but never a window
  * partition. The [[ChunkedWindows]] forms split every event-sized window
  * onto (user_id, chunk) and repair boundaries through chunk-level
  * frames; these tests prove them EQUAL to the vanilla queries on both
  * the natural and the skewed corpus, and that the hot key really does
  * spread across many chunk partitions.
  */
class SkewSpec extends SparkSpec {

  private val HotUser = 7L

  /** sf0.01 events with ~10% of rows re-assigned to one hot user. */
  private lazy val skewed: DataFrame = {
    val ev = graft.Tables(spark, sf("sf0.01")).events
    ev.withColumn("user_id",
      when(col("event_id") % 10 === 0, lit(HotUser)).otherwise(col("user_id")))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def vanillaSessionize(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    ev.withColumn("es", col("ts").cast("long"))
      .withColumn("gap", col("es") - lag(col("es"), 1).over(w))
      .withColumn("new_s", when(col("gap") >= 1800, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  private def vanillaTwa(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev.select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .withColumn("dt_ms", expr("(next_us - us) div 1000"))
      .filter(col("dt_ms").isNotNull && col("dt_ms") > 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("dt_ms")).as("sum_dt_ms"),
        sum(col("cents") * col("dt_ms")).as("sum_w_cents"))
      .withColumn("twa",
        round(col("sum_w_cents").cast("double") / col("sum_dt_ms") / 100.0, 4))
      .select(col("user_id"), col("n"), col("sum_dt_ms"), col("twa"))
      .orderBy(col("user_id"))
  }

  private def vanillaScd2(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    ev.select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts_s"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_s", lead(col("ts_s"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"))
      .orderBy(col("user_id"), col("version"))
  }

  test("the synthesized corpus is genuinely hot-keyed and multi-chunk") {
    val total = skewed.count()
    val hot = skewed.filter(col("user_id") === HotUser).count()
    assert(hot.toDouble / total >= 0.09, s"hot user holds $hot/$total")
    // the mitigation's parallelism: the hot user's history spans many chunks
    val chunks = skewed.filter(col("user_id") === HotUser)
      .select((col("ts").cast("long") / 86400L).cast("long")).distinct().count()
    assert(chunks >= 10, s"hot user spans only $chunks day-chunks")
  }

  test("chunked sessionize equals vanilla on natural and skewed corpora") {
    val natural = graft.Tables(spark, sf("sf0.01")).events
    assert(rows(ChunkedWindows.sessionize(natural)) == rows(vanillaSessionize(natural)))
    val got = rows(ChunkedWindows.sessionize(skewed))
    assert(got == rows(vanillaSessionize(skewed)))
    assert(got.nonEmpty)
  }

  test("chunked time-weighted average equals vanilla on natural and skewed corpora") {
    val natural = graft.Tables(spark, sf("sf0.01")).events
    assert(rows(ChunkedWindows.timeWeightedAvg(natural)) == rows(vanillaTwa(natural)))
    assert(rows(ChunkedWindows.timeWeightedAvg(skewed)) == rows(vanillaTwa(skewed)))
  }

  test("chunked SCD-2 equals vanilla on natural and skewed corpora") {
    val natural = graft.Tables(spark, sf("sf0.01")).events
    assert(rows(ChunkedWindows.scd2(natural)) == rows(vanillaScd2(natural)))
    assert(rows(ChunkedWindows.scd2(skewed)) == rows(vanillaScd2(skewed)))
  }

  test("AdaptiveWindows probes the key distribution and both branches trigger per the measured rule") {
    val natural = graft.Tables(spark, sf("sf0.01")).events
    // probe tells the truth on both corpora
    val (hotN, totalN) = AdaptiveWindows.hotKeyStats(natural)
    val (hotS, totalS) = AdaptiveWindows.hotKeyStats(skewed)
    assert(totalN == totalS)
    assert(hotS.toDouble / totalS >= 0.09 && hotN.toDouble / totalN < 0.05)
    // the rule compares the hot key to `factor` × a core's even share;
    // the test box's parallelism is whatever SparkSpec runs at, so derive
    // factors that straddle the skewed fixture's measured ratio instead
    // of assuming a scheduler width
    val par = spark.sparkContext.defaultParallelism.toDouble
    val hotRatio = hotS / (totalS / par) // hot rows in units of a core share
    val engages = hotRatio * 0.5         // bar below the ratio -> chunked
    val staysVanilla = hotRatio * 2.0    // bar above the ratio -> vanilla
    assert(!AdaptiveWindows.wouldChunk(natural, factor = staysVanilla))
    assert(!AdaptiveWindows.wouldChunk(skewed, factor = staysVanilla))
    assert(AdaptiveWindows.wouldChunk(skewed, factor = engages))
    // both dispatch branches emit rows identical to this spec's
    // independent vanilla reference
    assert(rows(AdaptiveWindows.sessionize(skewed, factor = staysVanilla)) ==
      rows(vanillaSessionize(skewed)))
    assert(rows(AdaptiveWindows.sessionize(skewed, factor = engages)) ==
      rows(vanillaSessionize(skewed)))
    // and the dispatch really switches plans: chunked branch carries
    // (user_id, chunk) windows, vanilla branch has none
    def chunkWindows(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.flatMap(_.references.map(_.name))
            .exists(_.startsWith("chunk")) => w
      }.size
    assert(chunkWindows(AdaptiveWindows.sessionize(skewed, factor = engages)) >= 2)
    assert(chunkWindows(AdaptiveWindows.sessionize(skewed, factor = staysVanilla)) == 0)
    // twa + scd2 dispatch through the same probe — chunked branch parity
    assert(rows(AdaptiveWindows.timeWeightedAvg(skewed, factor = engages)) ==
      rows(vanillaTwa(skewed)))
    assert(rows(AdaptiveWindows.scd2(skewed, factor = engages)) ==
      rows(vanillaScd2(skewed)))
  }

  test("Salting.adaptiveJoin probes the key distribution and both branches trigger (r10 #8)") {
    val natural = graft.Tables(spark, sf("sf0.01")).events
    // a per-user dim table: the classic broadcast-sized enrich side
    val dim = natural.select(col("user_id").as("uid")).distinct()
      .withColumn("segment", pmod(col("uid"), lit(7L)))
    // engagement bars derived from the measured hot ratio, as in the
    // AdaptiveWindows test above (no assumption about scheduler width)
    val par = spark.sparkContext.defaultParallelism.toDouble
    val (hotS, totalS) = AdaptiveWindows.hotKeyStats(skewed)
    val hotRatio = hotS / (totalS / par)
    val engages = hotRatio * 0.5
    val staysVanilla = hotRatio * 2.0
    assert(Salting.wouldSalt(skewed, "user_id", factor = engages))
    assert(!Salting.wouldSalt(skewed, "user_id", factor = staysVanilla))
    assert(!Salting.wouldSalt(natural, "user_id", factor = staysVanilla))
    // parity: both branches emit identical rows on the SKEWED corpus
    def sorted(df: DataFrame): Seq[Seq[Any]] =
      rows(df.orderBy(df.columns.map(col): _*))
    val ref = sorted(skewed.join(dim, skewed("user_id") === dim("uid")))
    val saltedOut = Salting.adaptiveJoin(skewed, dim, "user_id", "uid", factor = engages)
    val vanillaOut = Salting.adaptiveJoin(skewed, dim, "user_id", "uid", factor = staysVanilla)
    assert(sorted(saltedOut) == ref)
    assert(sorted(vanillaOut) == ref)
    // and the dispatch really switches plans: the salted branch replicates
    // the small side via explode (a Generate node); vanilla has none
    def generates(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.size
    assert(generates(saltedOut) >= 1)
    assert(generates(vanillaOut) == 0)
  }

  test("skew_join_agg (the oracled adaptiveJoin query) dispatches salted vs vanilla and both agree") {
    // the query synthesizes the same 10%-hot corpus as `skewed` above and
    // routes its join through Salting.adaptiveJoin (VERDICT r11 #6); derive
    // engagement bars from the measured ratio so the test holds at any
    // scheduler width (the query's default factor=2.0 engages at the
    // driver's 32-way parallelism: 10% of rows = 3.2 core shares > 2)
    val par = spark.sparkContext.defaultParallelism.toDouble
    val (hotS, totalS) = AdaptiveWindows.hotKeyStats(skewed)
    val hotRatio = hotS / (totalS / par)
    val engages = hotRatio * 0.5
    val staysVanilla = hotRatio * 2.0
    def generates(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.size
    val salted = graft.queries.AnalyticsQueries.skewJoinAgg(spark, sf("sf0.01"), factor = engages)
    val vanilla = graft.queries.AnalyticsQueries.skewJoinAgg(spark, sf("sf0.01"), factor = staysVanilla)
    // the dispatch really switches plans: salted replicates the dim side
    // via explode (a Generate node); vanilla has none
    assert(generates(salted) >= 1)
    assert(generates(vanilla) == 0)
    // and both branches produce the identical oracled answer
    val got = rows(salted)
    assert(got == rows(vanilla))
    assert(got.nonEmpty)
  }

  test("event-sized windows in the chunked plan partition by (user_id, chunk)") {
    val plan = ChunkedWindows.sessionize(skewed).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    def parts(w: org.apache.spark.sql.catalyst.plans.logical.Window): Set[String] =
      w.partitionSpec.flatMap(_.references.map(_.name)).toSet
    // the event-sized windows carry the chunk split...
    assert(windows.count(w => parts(w).exists(_.startsWith("chunk"))) >= 2)
    // ...and every user-only window sits DIRECTLY on a chunk-level
    // aggregate (reachable without crossing a join — i.e. it windows the
    // tiny boundary frame, never the event stream)
    def aggregateBeforeJoin(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
        case _: org.apache.spark.sql.catalyst.plans.logical.Join => false
        case other if other.children.nonEmpty => other.children.forall(aggregateBeforeJoin)
        case _ => false
      }
    val userOnly = windows.filter(w => !parts(w).exists(_.startsWith("chunk")))
    assert(userOnly.nonEmpty) // the boundary frames exist
    userOnly.foreach { w =>
      assert(aggregateBeforeJoin(w.child),
        s"user-only window over non-aggregated input:\n$w")
    }
  }
}
