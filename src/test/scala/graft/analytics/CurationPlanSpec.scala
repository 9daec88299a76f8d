package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan shape assertions for the round-4 curation operators: each
  * one's 100 TB claim, checked against the executed plan. */
class CurationPlanSpec extends SparkSpec {
  private val d = sf("sf0.001")
  private def docs = graft.Tables(spark, d).documents

  private def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case x => x }.flatMap {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s) ++ allNodes(s.plan)
      case a: AdaptiveSparkPlanExec => Seq(a) ++ allNodes(a.executedPlan)
      case x => Seq(x)
    }

  test("winnowFingerprints is narrow: ZERO shuffles from scan to fingerprint set") {
    import org.apache.spark.sql.functions._
    val df = docs.select(col("doc_id"),
      explode(TextAnalysis.winnowFingerprints(col("text"))).as("fp"))
    assert(df.collect().nonEmpty)
    val shuffles = allNodes(finalPlan(df)).count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 0, finalPlan(df).toString)
  }

  test("gopherGates: exactly the two doc_id-path aggregate shuffles, no join") {
    val df = TextAnalysis.gopherGates(docs)
    assert(df.collect().nonEmpty)
    val nodes = allNodes(finalPlan(df))
    // (doc_id, tok) agg + doc_id agg — nothing else moves data
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 2, finalPlan(df).toString)
    assert(!nodes.exists(_.nodeName.contains("Join")), finalPlan(df).toString)
  }

  test("spanDedupStats: hash-keyed keeper agg + doc rollup; no nested loop, no sort join at test scale") {
    val df = Dedup.spanDedupStats(docs, spanTokens = 16)
    assert(df.collect().nonEmpty)
    val nodes = allNodes(finalPlan(df))
    assert(!nodes.exists(n => n.nodeName.contains("CartesianProduct") ||
      n.nodeName.contains("BroadcastNestedLoop")), finalPlan(df).toString)
    // span text never shuffles: every shuffle's output carries the hash or
    // ids/counters, not a token-array or span-string column
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty)
    shuffles.foreach { s =>
      val cols = s.output.map(_.name).mkString(",")
      assert(!cols.contains("__sl") && !cols.contains("__toks") && !cols.contains("text"),
        s"span/token payload crossed a shuffle: $cols")
    }
  }

  test("linearClassifierScore: weight table broadcasts; corpus never joins shuffled") {
    val docs = graft.Tables(spark, d).documents
    val df = Search.linearClassifierScore(docs, Search.derivedWeights(docs))
    assert(df.collect().nonEmpty)
    val nodes = allNodes(finalPlan(df))
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")), finalPlan(df).toString)
    assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")), finalPlan(df).toString)
  }

  test("winnowDupPairs: equi-join only (the pair stage must never nested-loop)") {
    val df = Dedup.winnowDupPairs(docs, minShared = 1, maxDf = Some(100L))
    df.collect(): Unit // may be empty at sf0.001; shape is the assertion
    val nodes = allNodes(finalPlan(df))
    assert(!nodes.exists(n => n.nodeName.contains("CartesianProduct") ||
      n.nodeName.contains("BroadcastNestedLoop")), finalPlan(df).toString)
  }
}
