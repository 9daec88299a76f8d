package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the round-10 evaluation/curation additions: corpus-level
  * boilerplate-line removal ([[Dedup.boilerplateLines]]), the integer-exact
  * classifier evaluation pair ([[Search.classifierAuc]] /
  * [[Search.classifierPrCurve]]), and D4 prototypicality pruning
  * ([[Clustering.clusterPrototypes]]). The oracled queries
  * (text_boilerplate_lines, clf_auc, clf_pr_curve, embed_prototypes) gate
  * end-to-end equality; these tests pin the operator semantics on corpora
  * built to hit each edge. */
class Round10EvalSpec extends SparkSpec {
  import spark.implicits._

  // ---- boilerplateLines -------------------------------------------------

  test("boilerplateLines: df >= minDocs strips every occurrence, order survives, empty rebuild allowed") {
    val docs = Seq(
      (1L, "nav bar\nalpha content\nfooter line"),
      (2L, "nav bar\nbeta content\nfooter line"),
      (3L, "nav bar\ngamma content\nfooter line"),
      // doc of nothing but boilerplate: rebuilds to the empty string
      (4L, "nav bar\nfooter line"),
      // a line repeated WITHIN one doc only: within-doc repetition is not
      // boilerplate (distinct-doc frequency is the signal)
      (5L, "solo line\nsolo line\ndelta content")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateLines(docs, minDocs = 3)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(out.length == 5)
    assert(byId(1L).getAs[String]("kept_text") == "alpha content")
    assert(byId(2L).getAs[String]("kept_text") == "beta content")
    assert(byId(3L).getAs[String]("kept_text") == "gamma content")
    assert(byId(4L).getAs[String]("kept_text") == "" &&
      byId(4L).getAs[Long]("n_kept") == 0L &&
      byId(4L).getAs[Long]("n_lines") == 2L)
    assert(byId(5L).getAs[String]("kept_text") == "solo line\nsolo line\ndelta content")
  }

  test("boilerplateLines: multi-line order is preserved around a stripped interior line") {
    val docs = Seq(
      (1L, "keep a\nshared\nkeep b\nkeep c"),
      (2L, "shared\nx only"),
      (3L, "y only\nshared")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateLines(docs, minDocs = 3).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("kept_text") == "keep a\nkeep b\nkeep c")
    assert(out(0).getAs[Long]("n_lines") == 4L && out(0).getAs[Long]("n_kept") == 3L)
  }

  // ---- classifier evaluation --------------------------------------------

  /** Brute-force AUC twin: score every (pos, neg) pair directly. */
  private def bruteAuc(scored: Seq[(Long, Boolean)]): (Long, Long) = {
    val pos = scored.collect { case (s, true) => s }
    val neg = scored.collect { case (s, false) => s }
    val num = (for { p <- pos; n <- neg } yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    (num, 2L * pos.length * neg.length)
  }

  test("classifierAuc equals the all-pairs Mann-Whitney count (ties at half weight)") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val w = Search.derivedWeights(docs)
    val row = Search.classifierAuc(docs, w).collect().head
    // independent recomputation: per-doc logits + labels, then all pairs
    val scored = Search.linearClassifierScore(docs, w)
      .join(docs.select(col("doc_id"),
        (graft.functions.GraftFunctions.langIdFast(col("text")) === "en").as("p")), "doc_id")
      .select("logit", "p").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val (num, den) = bruteAuc(scored)
    assert(row.getAs[Long]("auc_num") == num)
    assert(row.getAs[Long]("auc_den") == den)
    assert(row.getAs[Long]("auc_permicro") == 1000000L * num / den)
    assert(row.getAs[Long]("n_pos") == scored.count(_._2).toLong)
  }

  test("classifierPrCurve: endpoints and monotone recall") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val w = Search.derivedWeights(docs)
    val rows = Search.classifierPrCurve(docs, w).orderBy(col("threshold")).collect()
    val p = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fn")
    // lowest threshold predicts everything positive: tp = P, recall = 1000
    assert(rows.head.getAs[Long]("tp") == p)
    assert(rows.head.getAs[Long]("recall_permille") == 1000L)
    // recall is non-increasing as the threshold rises
    val recalls = rows.map(_.getAs[Long]("recall_permille"))
    assert(recalls.zip(recalls.tail).forall { case (lo, hi) => hi <= lo })
    // every row's confusion cells are consistent
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == p)
      assert(r.getAs[Long]("precision_permille") ==
        1000L * r.getAs[Long]("tp") / (r.getAs[Long]("tp") + r.getAs[Long]("fp")))
    }
  }

  // ---- plan shapes ------------------------------------------------------

  private def planNodes(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect { case x => x }.flatMap {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          s.nodeName +: walk(s.plan)
        case x => Seq(x.nodeName)
      }
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case p => walk(p)
    }
  }

  test("boilerplateLines and classifier eval plans: no cartesian; only the 1-row scalar attach nests") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val bp = Dedup.boilerplateLines(docs)
    val pr = Search.classifierPrCurve(docs, Search.derivedWeights(docs))
    assert(bp.collect().nonEmpty && pr.collect().nonEmpty)
    val bpNodes = planNodes(bp)
    assert(!bpNodes.exists(n => n.contains("CartesianProduct") ||
      n.contains("BroadcastNestedLoop")), bpNodes.mkString("\n"))
    // the PR sweep deliberately crossJoins ONE broadcast totals row onto
    // the threshold-sized frame — that is the single allowed nested loop
    val prNodes = planNodes(pr)
    assert(!prNodes.exists(_.contains("CartesianProduct")), prNodes.mkString("\n"))
    assert(prNodes.count(_.contains("BroadcastNestedLoop")) <= 1, prNodes.mkString("\n"))
  }

  // ---- clusterPrototypes ------------------------------------------------

  test("clusterPrototypes: exactly floor(n/5) closest members drop per cluster, ids total") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val out = Clustering.clusterPrototypes(emb, centroidStep = 40, rounds = 2)
    val rows = out.collect()
    assert(rows.length == emb.count())
    val byCluster = rows.groupBy(_.getAs[Long]("cid"))
    byCluster.foreach { case (_, members) =>
      val n = members.length
      val dropped = members.filterNot(_.getAs[Boolean]("keep"))
      assert(dropped.length == n / 5)
      // dropped = the rank prefix = the (d2, vec_id)-smallest members
      val sorted = members.sortBy(r => (r.getAs[Long]("d2"), r.getAs[Long]("vec_id")))
      assert(sorted.take(n / 5).map(_.getAs[Long]("vec_id")).toSet ==
        dropped.map(_.getAs[Long]("vec_id")).toSet)
      // ranks are a 1..n permutation
      assert(members.map(_.getAs[Long]("proto_rank")).sorted.toSeq == (1L to n.toLong))
    }
    out.unpersist()
  }
}
