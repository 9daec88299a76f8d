package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves the two-stage top-k claim with measured row counts (the SCALING
  * analog of BucketingSpec): the bounded-heap aggregate reduces map-side, so
  * the shuffle carries at most |queries| heap rows per map partition — the
  * scored corpus never reaches an exchange. */
class TopKPlanSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  /** All physical nodes including those inside materialized AQE query
    * stages (QueryStageExec is a tree leaf — plain collect won't descend). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case x => x }.flatMap {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s) ++ allNodes(s.plan)
      case x => Seq(x)
    }

  test("bruteForceTopK matches the windowed formulation exactly") {
    val emb = graft.Tables(spark, sf("sf0.01")).embeddings
    val q = emb.filter(col("vec_id") < 10)
    val got = Similarity.bruteForceTopK(emb, q, k = 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq

    // reference: the plain window-rank formulation over the same scored pairs
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    val scored = Similarity.bruteForceTopK(emb, q, k = 500) // full ranking via heap...
    assert(scored.count() > 0)
    val ref = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("query_id"), col("rn").as("rank"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(got == ref)
    assert(got.size == 50)
  }

  test("only bounded heaps reach the shuffle — the scored corpus does not") {
    val emb = graft.Tables(spark, sf("sf0.01")).embeddings
    val nQueries = 10
    val df = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < nQueries), k = 5)
    // execute THIS df's QueryExecution (collect, not count — count builds a
    // separate QueryExecution and would leave these metrics at zero)
    assert(df.collect().length == 5 * nQueries)

    val nodes = allNodes(finalPlan(df))
    val partials = nodes.collect {
      case o: ObjectHashAggregateExec if o.aggregateExpressions.exists(_.mode == Partial) => o
    }
    val finals = nodes.collect {
      case o: ObjectHashAggregateExec if o.aggregateExpressions.exists(_.mode == Final) => o
    }
    assert(partials.nonEmpty && finals.nonEmpty, finalPlan(df).toString)

    // Partial-side output = rows entering the exchange: ≤ |queries| heaps per
    // map partition, and orders of magnitude below the ~5000 scored pairs.
    val mapParts = emb.rdd.getNumPartitions
    val shuffled = partials.map(_.metrics("numOutputRows").value).sum
    assert(shuffled > 0, "metrics must reflect a real execution (not a fresh plan)")
    assert(shuffled <= nQueries.toLong * mapParts, s"shuffled=$shuffled mapParts=$mapParts")
    val corpusPairs = (emb.count() - 1) * nQueries
    assert(shuffled < corpusPairs / 10, s"shuffled=$shuffled vs scored=$corpusPairs")
  }

  test("heap aggregate is exact for k larger than any group") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val df = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 2), k = 10000)
    assert(df.count() == (emb.count() - 1) * 2)
    // best-first ordering within each query
    val byQ = df.orderBy(col("query_id"), col("rank")).collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val coses = rows.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(coses == coses.sorted(Ordering[Double].reverse))
    }
  }
}
