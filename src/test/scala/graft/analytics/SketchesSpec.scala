package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min sketch semantics: the never-undercount invariant, the probe
  * contract, and MERGEABILITY — shard sketches merged associatively answer
  * exactly like one sketch of the union, which is what makes the aggregate
  * shape (map-side partials → merge) correct at any partition count. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cmsTopTokens: exact ranks with uniformly-true guarantee flags") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d d")).toDF("doc_id", "text")
    val out = Sketches.cmsTopTokens(docs, k = 3).collect()
    assert(out.map(r => (r.getAs[Long]("rank"), r.getAs[String]("tok"),
      r.getAs[Long]("cnt"))).toSeq == Seq((1L, "a", 4L), (2L, "b", 3L), (3L, "d", 2L)))
    assert(out.forall(r => r.getAs[Boolean]("cms_ok_lower") &&
      r.getAs[Boolean]("cms_ok_upper")))
  }

  test("shard sketches merged == union sketch (estimates agree token for token)") {
    def sketchOf(texts: Seq[String]): CountMinSketch = {
      val bin = texts.toDF("text")
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("sk"))
        .head().getAs[Array[Byte]]("sk")
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bin))
    }
    val shard1 = Seq("x x y", "z")
    val shard2 = Seq("x y y", "w w")
    val merged = sketchOf(shard1)
    merged.mergeInPlace(sketchOf(shard2))
    val union = sketchOf(shard1 ++ shard2)
    for (t <- Seq("x", "y", "z", "w", "absent"))
      assert(merged.estimateCount(t) == union.estimateCount(t),
        s"merge/union estimate mismatch for '$t'")
  }

  test("HLL registers: shard-built + merged == corpus-built, row for row") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
    val mid = ev.agg(max("event_id")).head().getLong(0) / 2
    val shardA = HllSketch.registers(
      ev.filter(col("event_id") <= mid), Seq("event_type"), col("user_id"))
    val shardB = HllSketch.registers(
      ev.filter(col("event_id") > mid), Seq("event_type"), col("user_id"))
    val merged = HllSketch.mergeRegisters(shardA.unionByName(shardB), Seq("event_type"))
    val direct = HllSketch.registers(ev, Seq("event_type"), col("user_id"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
        r.getAs[Int]("rho"))).sorted.toSeq
    assert(rows(merged).nonEmpty && rows(merged) == rows(direct))
  }

  test("HLL estimate lands within 3 standard errors of exact distinct") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
    val regs = HllSketch.registers(ev, Seq("event_type"), col("user_id"))
    val est = HllSketch.estimate(regs, Seq("event_type")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("est_users")).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("nd"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("nd")).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    val rse3 = 3 * 1.04 / math.sqrt(HllSketch.M.toDouble) // ≈ 19.5%
    exact.foreach { case (et, nd) =>
      val rel = math.abs(est(et) - nd) / nd.toDouble
      assert(rel < rse3, s"$et: est=${est(et)} exact=$nd rel=$rel")
    }
  }

  test("quantile sketch: shard-built + merged == corpus-built, row for row") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
      .withColumn("cents", round(col("value") * 100).cast("long")).persist()
    val mid = ev.agg(max("event_id")).head().getLong(0) / 2
    val a = QuantileSketch.histogram(
      ev.filter(col("event_id") <= mid), Seq("event_type"), col("cents"))
    val b = QuantileSketch.histogram(
      ev.filter(col("event_id") > mid), Seq("event_type"), col("cents"))
    val merged = QuantileSketch.mergeHistograms(a.unionByName(b), Seq("event_type"))
    val direct = QuantileSketch.histogram(ev, Seq("event_type"), col("cents"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
        r.getAs[Long]("rep"), r.getAs[Long]("cnt"))).sorted.toSeq
    assert(rows(merged).nonEmpty && rows(merged) == rows(direct))
    ev.unpersist(): Unit
  }

  test("quantile sketch: estimates sit within the 1/32 relative bucket width of exact") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
      .withColumn("cents", round(col("value") * 100).cast("long")).persist()
    val est = QuantileSketch.quantiles(
      QuantileSketch.histogram(ev, Seq("event_type"), col("cents")),
      Seq("event_type")).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("p50"), r.getAs[Long]("p95"), r.getAs[Long]("p99"))).toMap
    // the sketch targets the ⌈q·n⌉-th ORDER STATISTIC (not an interpolated
    // percentile); its report is the lower bound of the bucket CONTAINING
    // that value, so the two-sided bound is exact: rep ≤ x < rep·(1+1/32)
    val byType = ev.select("event_type", "cents").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (et, xs) => et -> xs.map(_._2).sorted }
    assert(est.keySet == byType.keySet && est.nonEmpty)
    est.foreach { case (et, (p50, p95, p99)) =>
      val xs = byType(et)
      for ((got, q) <- Seq((p50, 0.5), (p95, 0.95), (p99, 0.99))) {
        val x = xs(math.ceil(q * xs.length).toInt - 1)
        assert(got <= x, s"$et q=$q: rep $got above order stat $x")
        assert(x < got * (1 + 1.0 / 32) + 1, s"$et q=$q: order stat $x outside bucket of $got")
      }
    }
    ev.unpersist(): Unit
  }

  test("HLL cube: day-cell rollup answers the range query without rescanning events") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
      .withColumn("day", to_date(col("ts"))).persist()
    val daily = HllSketch.registers(ev, Seq("day", "event_type"), col("user_id"))
      .persist() // the "stored cube"
    daily.count()
    // answer distinct-users for ONLY the first half of the days from cells
    val days = ev.select("day").distinct().collect().map(_.getDate(0)).sorted
    val cut = days(days.length / 2)
    val ranged = HllSketch.estimate(
      HllSketch.mergeRegisters(daily.filter(col("day") <= cut), Seq("event_type")),
      Seq("event_type")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("s_sum")).toMap
    // equals the sketch built directly over that event range
    val direct = HllSketch.estimate(
      HllSketch.registers(ev.filter(col("day") <= cut), Seq("event_type"), col("user_id")),
      Seq("event_type")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("s_sum")).toMap
    assert(ranged.nonEmpty && ranged == direct)
    daily.unpersist(); ev.unpersist(): Unit
  }
}
