package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR diversified top-k and the per-domain admission cap. Corpus-level
  * parity is the DuckDB oracle (`embed_mmr`, `curate_domain_cap`); these
  * pin the semantics the oracle can't isolate: the diversity trade
  * actually firing, tie rules, quota arithmetic, and the window-group-
  * limit plan contract the literal cap buys. */
class MmrCapSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("mmrTopK: diversity penalty rejects the near-duplicate the relevance order would pick") {
    // q = e_x; c1/c2 nearly coincident near q (sim(c1,c2) ~ 0.9998);
    // c3 farther from q but diverse. Relevance order: c1, c2, c3.
    val e = emb(
      0L -> Seq(1.0, 0.0, 0.0),
      1L -> Seq(0.99, 0.10, 0.0),
      2L -> Seq(0.98, 0.12, 0.0),
      3L -> Seq(0.80, 0.0, 0.60))
    val got = Similarity.mmrTopK(e, e.filter($"vec_id" === 0L), k = 3, depth = 3,
        lamNum = 1L, lamCompl = 1L)
      .orderBy($"step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"))).toSeq
    // step 1 = pure relevance (c1); step 2 = c3 (c2's marginal score is
    // NEGATIVE: 0.9926 - sim(c2,c1)=0.9998); step 3 = the leftover c2
    assert(got == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("mmrTopK: with a zero diversity weight the selection is exactly the relevance top-k") {
    val e = emb(
      0L -> Seq(1.0, 0.0, 0.0),
      1L -> Seq(0.99, 0.10, 0.0),
      2L -> Seq(0.98, 0.12, 0.0),
      3L -> Seq(0.80, 0.0, 0.60))
    val mmr = Similarity.mmrTopK(e, e.filter($"vec_id" === 0L), k = 3, depth = 3,
        lamNum = 1L, lamCompl = 0L)
      .orderBy($"step").collect().map(_.getAs[Long]("vec_id")).toSeq
    val rel = Similarity.bruteForceTopK(e, e.filter($"vec_id" === 0L), k = 3)
      .orderBy($"rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(mmr == rel)
  }

  test("mmrTopK: score ties break to the lowest vec_id") {
    // two EXACTLY identical candidates: equal cos to q, equal everything
    val e = emb(
      0L -> Seq(1.0, 0.0),
      7L -> Seq(0.9, 0.1),
      5L -> Seq(0.9, 0.1),
      9L -> Seq(0.0, 1.0))
    val first = Similarity.mmrTopK(e, e.filter($"vec_id" === 0L), k = 1, depth = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(first == Seq(5L))
  }

  test("mmrTopK differential: matches an independent driver-side greedy on random corpora") {
    // exact replicas of the engine's arithmetic: sequential-fold cosine,
    // Spark's decimal-string HALF_UP rounding, integer micro-unit scores
    def round6(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def micro(x: Double): Long =
      new java.math.BigDecimal(java.lang.Double.toString(x * 1e6))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def cosq(a: Seq[Double], b: Seq[Double]): Long = {
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      def n(v: Seq[Double]) = math.sqrt(v.map(z => z * z).foldLeft(0.0)(_ + _))
      micro(round6(dot / (n(a) * n(b))))
    }
    for (seed <- 1 to 4) {
      // deterministic LCG vectors (floats first: the table column is float)
      var s = seed.toLong
      def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33).toDouble / (1L << 31).toDouble - 0.5) }
      val vecs = (0L until 9L).map(i =>
        i -> Seq.fill(5)(next().toFloat.toDouble)).toMap
      val (k, depth, ln, lc) = (3, 7, 7L, 3L)
      // independent greedy: top-depth by (cosq desc, id), then k argmax steps
      val q = vecs(0L)
      val cand = vecs.keys.filter(_ != 0L).toSeq
        .map(i => i -> cosq(q, vecs(i)))
        .sortBy { case (i, c) => (-c, i) }.take(depth)
      var selected = List.empty[(Long, Long, Long)] // (step, id, score)
      for (step <- 1 to k) {
        val rem = cand.filterNot { case (i, _) => selected.exists(_._2 == i) }
        if (rem.nonEmpty) {
          val scored = rem.map { case (i, cq) =>
            val maxsel =
              if (selected.isEmpty) 0L
              else selected.map(sel => cosq(vecs(i), vecs(sel._2))).max
            (i, if (selected.isEmpty) ln * cq else ln * cq - lc * maxsel)
          }
          val (id, sc) = scored.minBy { case (i, v) => (-v, i) }
          selected = selected :+ ((step.toLong, id, sc))
        }
      }
      val e = vecs.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      val got = Similarity.mmrTopK(e, e.filter($"vec_id" === 0L), k = k,
          depth = depth, lamNum = ln, lamCompl = lc)
        .orderBy($"step").collect()
        .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("mmr_score"))).toList
      assert(got == selected, s"seed $seed")
    }
  }

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")

  test("domainCap: over-quota source sheds its lowest-quality docs; under-quota untouched") {
    // srcA: 4 docs of stepped quality; srcB: 2 docs. share 1/2 of 6 = cap 3.
    val good = "the cat sat of the mat and the dog ran to the yard and all was good"
    val d = docs(
      (1L, "srcA", good + " " + good),          // long, clean
      (2L, "srcA", good),                       // clean
      (3L, "srcA", "a of to and the plain"),    // short
      (4L, "srcA", "@@@@ !!!! ???? %%%%"),      // pure punctuation: worst
      (5L, "srcB", good),
      (6L, "srcB", "x"))
    val kept = Sampling.domainCap(d, shareNum = 1, shareDen = 2, minKeep = 1)
      .collect()
    val bySrc = kept.groupBy(_.getAs[String]("source"))
    assert(kept.forall(_.getAs[Long]("src_cap") == 3L))
    assert(bySrc("srcA").map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
    assert(bySrc("srcB").map(_.getAs[Long]("doc_id")).toSet == Set(5L, 6L))
    // ranks are dense 1..n within each source, quality-descending (doc 3's
    // 5/6 stopword ratio outscores doc 2's longer prose under the formula)
    assert(bySrc("srcA").sortBy(_.getAs[Long]("src_rank"))
      .map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 2L))
  }

  test("domainCap: equal-quality ties admit the lowest doc_id") {
    val t = "the of and to a plain text body here"
    val d = docs(
      (9L, "s", t), (4L, "s", t), (7L, "s", t))
    val kept = Sampling.domainCap(d, shareNum = 1, shareDen = 3, minKeep = 1)
      .collect()
    // cap = max(1, 3/3) = 1: identical text => identical quality => id 4 wins
    assert(kept.map(_.getAs[Long]("doc_id")).toSeq == Seq(4L))
  }

  test("domainCap: the literal cap keeps the rank filter window-group-limit eligible") {
    val d = graft.Tables(spark, sf("sf0.001")).documents
    val plan = Sampling.domainCap(d).queryExecution.executedPlan.toString
    // the data-dependent cap was collected to a literal, so Spark's
    // InferWindowGroupLimit prunes each source's tail BEFORE the exchange
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }
}
