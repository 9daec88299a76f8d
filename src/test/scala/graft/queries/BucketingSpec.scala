package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB co-location claim, demonstrated: bucketing both join sides on
  * the join key removes the shuffle entirely (SCALING.md "co-partitioning
  * both sides by orderkey (bucketing) removes it"). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with ZERO shuffle exchanges") {
    val t = graft.Tables(spark, sf("sf0.001"))
    t.lineitem.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    t.orders.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b")

    // Count shuffles in the FINAL adaptive plan: AdaptiveSparkPlanExec hides
    // its current plan from TreeNode.collect until executed, so run the
    // query first and inspect the final plan string.
    def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
      assert(df.count() > 0)
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
    }

    // disable auto-broadcast so the join would otherwise shuffle both sides
    withSql("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
      // the ONLY allowed exchange is the final tiny group-by on orderstatus —
      // the join itself must consume bucketed outputs directly
      assert(shuffleCount(joined) <= 1,
        joined.queryExecution.executedPlan.toString)

      // control: the same join over plain parquet shuffles BOTH fact sides
      val plain = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_extendedprice")))
      assert(shuffleCount(plain) >= 3, plain.queryExecution.executedPlan.toString)
    }
  }

  private def withSql(kv: (String, String))(body: => Unit): Unit = {
    val old = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try body finally old match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }
}
