package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The optimizer rule version of the RangeJoin contract: a NAIVE inequality
  * join, written by a user who never heard of interval bucketing, comes out
  * of the optimizer as a hash equi-join with identical results. */
class RangeJoinRuleSpec extends SparkSpec {

  private def naiveJoin() = {
    val t = graft.Tables(spark, sf("sf0.001"))
    val iv = t.events.orderBy(col("value").desc, col("event_id")).limit(20)
      .select(col("event_id").as("win_id"), col("ts").cast("long").as("w_start"))
      .withColumn("w_end", col("w_start") + lit(7200L))
    val pts = t.events.select(col("event_id"), col("ts").cast("long").as("es"))
    pts.join(iv, col("es") >= col("w_start") && col("es") < col("w_end"))
      .select("event_id", "win_id")
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("rule rewrites the naive inequality join to a hash join with identical results") {
    val before = collectPairs(naiveJoin())
    assert(before.nonEmpty)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite(bucketWidth = 3600L)
    try {
      val df = naiveJoin()
      assert(collectPairs(df) == before)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("HashJoin"), plan)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("degenerate intervals (e <= s) neither crash nor match") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite(bucketWidth = 3600L)
    try {
      import spark.implicits._
      val pts = Seq((1L, 86400L), (2L, 100L)).toDF("id", "p")
      // second interval is zero-length ON a bucket boundary: bucket(s)=24 >
      // bucket(e-1)=23 — a step-1 Sequence would throw without the guard
      val iv = Seq((10L, 0L, 200L), (11L, 86400L, 86400L)).toDF("iid", "s", "e")
      val out = pts.join(iv, $"p" >= $"s" && $"p" < $"e")
        .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out == Seq((2L, 10L)))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("non-long operands (timestamps) are left to the normal planner") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite(bucketWidth = 3600L)
    try {
      import spark.implicits._
      val pts = Seq(1L, 7200L).toDF("p0")
        .select(col("p0"), col("p0").cast("timestamp").as("p"))
      val iv = Seq((10L, 0L, 3600L)).toDF("iid", "s0", "e0")
        .select(col("iid"), col("s0").cast("timestamp").as("s"),
          col("e0").cast("timestamp").as("e"))
      // must not fire (the rewrite is typed for integral epochs): the plain
      // nested-loop result comes back, no optimizer crash
      val out = pts.join(iv, col("p") >= col("s") && col("p") < col("e"))
        .select("p0", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out == Seq((1L, 10L)))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule leaves joins with extra or different conditions untouched") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite(bucketWidth = 3600L)
    try {
      import spark.implicits._
      val a = Seq((1L, 5L), (2L, 15L)).toDF("id", "x")
      val b = Seq((10L, 0L, 10L)).toDF("bid", "lo", "hi")
      // strict > on the lower bound — NOT the half-open shape; must stay a
      // nested loop and still be correct
      val df = a.join(b, $"x" > $"lo" && $"x" < $"hi")
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
      assert(df.queryExecution.executedPlan.toString.contains("NestedLoop"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("bucket ids stay exact past 2^52: nanosecond-scale epochs keep their matches") {
    // the old double-cast floor lost integer precision at this magnitude
    // (double ulp at 2^60 is 256): an interval starting 100 below a bucket
    // boundary rounded UP across it, its true first bucket never exploded,
    // and the boundary-straddling match silently vanished from the rewrite
    import spark.implicits._
    val w = 3600L
    val k = (1L << 60) / w
    val boundary = k * w // a bucket edge near 2^60
    val pts = Seq((1L, boundary - 50L), (2L, boundary + 50L)).toDF("id", "x")
    val iv = Seq((10L, boundary - 100L, boundary + 100L)).toDF("win", "lo", "hi")
    def run() = pts.join(iv, $"x" >= $"lo" && $"x" < $"hi")
      .select("id", "win").collect().map(_.getLong(0)).sorted.toSeq
    val before = run()
    assert(before == Seq(1L, 2L))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite(bucketWidth = w)
    try {
      assert(run() == before,
        "the rewritten equi-join must keep boundary-straddling matches at 2^60 epochs")
    } finally spark.experimental.extraOptimizations = prev
  }
}
