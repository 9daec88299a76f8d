package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit semantics for the round-10 curation operators: encoding repair
  * (mojibake), HTML main-content extraction, character entropy, and
  * content-defined chunking. The corpus-level parity proof is the DuckDB
  * oracle (text_fix_encoding / text_html_extract / text_entropy /
  * dedup_cdc); these pin the per-row semantics and the CDC edit-locality
  * property on hand-built cases. */
class Round10TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("t").select(expr.as("r")).as[String].head()

  test("fixMojibake repairs every table entry and round-trips encode∘fix") {
    // a string exercising all nine mojibake forms
    val clean = "it’s “fine” — café naïve…" // ’ “ ” — … é (ï not in table)
      .replace("ï", "i") + " über señor mädchen öl"
    val corrupted = one(TextAnalysis.mojibakeEncode(col("t")), clean)
    assert(corrupted != clean)
    assert(corrupted.contains("â€™") && corrupted.contains("Ã©") &&
      corrupted.contains("Ã¼") && corrupted.contains("Ã±"))
    val fixed = one(TextAnalysis.fixMojibake(col("t")), corrupted)
    assert(fixed == clean)
    // clean ASCII is a fixed point of the repair
    val ascii = "plain ascii text stays untouched 123"
    assert(one(TextAnalysis.fixMojibake(col("t")), ascii) == ascii)
  }

  test("decodeEntities: common entities decode; &amp; decodes LAST (single-pass contract)") {
    assert(one(TextAnalysis.decodeEntities(col("t")),
      "a &quot;b&quot; &lt;c&gt; d&#39;s &copy; x&nbsp;y") == "a \"b\" <c> d's © x y")
    // &amp;lt; is the TEXT "&lt;", not a tag open — the &amp; pass runs last
    assert(one(TextAnalysis.decodeEntities(col("t")), "show &amp;lt; here") ==
      "show &lt; here")
  }

  test("htmlExtract keeps dense content segments, drops nav/footer/style, decodes entities") {
    val html = "<html><head><style>p{color:red}</style></head><body>" +
      "<div>home | about</div>" +
      "<p>the quick brown fox jumps over the lazy dog</p>" +
      "<p>a second paragraph with &quot;entities&quot; &amp; seven tokens</p>" +
      "<div>footer 2026</div></body></html>"
    val got = one(TextAnalysis.htmlExtract(col("t"), minTokens = 7), html)
    assert(got == "the quick brown fox jumps over the lazy dog " +
      "a second paragraph with \"entities\" & seven tokens")
    // segments preserves document order and collapses intra-segment whitespace
    val segs = Seq("<p>a   b</p><p>c</p>").toDF("t")
      .select(TextAnalysis.htmlSegments(col("t")).as("r")).as[Seq[String]].head()
    assert(segs == Seq("a b", "c"))
  }

  test("charEntropy: constant string 0, two-symbol uniform ln2, matches a driver fold") {
    val df = Seq((1L, "aaaaaaaa"), (2L, "abababab"), (3L, "abcd abcd")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(df).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(r(0) == ((1L, 8L, 1L, 0.0)))
    assert(r(1)._4 == 0.6931) // round(ln 2, 4)
    // driver-side reference fold for the mixed case (micro-nat quantized
    // exactly like the operator)
    val s = "abcd abcd"
    val n = s.length.toLong
    val counts = s.groupBy(identity).map(_._2.length.toLong)
    val sumMicro = counts.map(c => c * math.round(math.log(n.toDouble / c) * 1e6)).sum
    val want = BigDecimal(sumMicro.toDouble / n / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(2)._4 == want)
    assert(r(2)._2 == 9L && r(2)._3 == 5L) // a b c d space
  }

  test("cdcChunks partitions each document: chunks concatenate back to the text") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents.limit(50)
    val rebuilt = Dedup.cdcChunks(docs)
      .groupBy("doc_id")
      .agg(concat_ws(" ", sort_array(collect_list(struct(col("chunk_idx"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val joined = docs.select(col("doc_id"), col("text")).join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt"))
    assert(joined.count() == 0)
  }

  test("CDC edit-locality: one mid-document insertion re-chunks only its neighborhood") {
    // identical 400-token documents except doc 2 has one token inserted at
    // position 200; every chunk outside the edit's chunk re-synchronizes
    // position-unique tokens: shifted spans can never coincide by accident
    val toks = (0 until 400).map(i => s"w$i")
    val a = toks.mkString(" ")
    val b = (toks.take(200) ++ Seq("INSERTED") ++ toks.drop(200)).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(df).select("doc_id", "chunk")
      .as[(Long, String)].collect()
    val ca = chunks.filter(_._1 == 1L).map(_._2).toSet
    val cb = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = ca.intersect(cb)
    // all chunks agree except the edited one (and at most its successor,
    // if the inserted token shifted a boundary before re-sync)
    assert(ca.size - shared.size <= 2,
      s"expected <=2 disturbed chunks, got ${ca.size - shared.size} of ${ca.size}")
    assert(shared.nonEmpty)
    // fixed-stride spans (the intradoc complement) would shift EVERY span
    // after the edit — CDC's whole point; sanity-check the contrast
    val spanA = a.split(" ").grouped(16).map(_.mkString(" ")).toSet
    val spanB = b.split(" ").grouped(16).map(_.mkString(" ")).toSet
    assert(spanA.intersect(spanB).size * 2 <= spanA.size)
  }

  test("plan shapes: repair/extract are shuffle-free transforms; entropy and CDC shuffle on digests only") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case x => x }.flatMap {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s) ++ allNodes(s.plan)
        case x => Seq(x)
      }
    def shuffles(df: DataFrame): Seq[SparkPlan] = {
      df.write.format("noop").mode("overwrite").save()
      allNodes(finalPlan(df)).collect { case e: ShuffleExchangeLike => e }
    }
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    // per-row transforms: zero exchanges of any kind
    assert(shuffles(docs.select(TextAnalysis.fixMojibake(col("text")))).isEmpty)
    assert(shuffles(docs.select(TextAnalysis.htmlExtract(col("text")))).isEmpty)
    // entropy: (doc,ch) agg + doc-keyed total/join/agg — every exchange key
    // is doc_id(+ch), never text; no CartesianProduct anywhere
    val ent = TextAnalysis.charEntropy(docs)
    val es = shuffles(ent)
    assert(es.nonEmpty && es.size <= 4, finalPlan(ent).toString)
    assert(!allNodes(finalPlan(ent)).exists(_.nodeName.contains("Cartesian")))
    // CDC dup rollup: chunking is narrow; the exchanges are the two-phase
    // distinct aggregate's (chunk_hash, doc_id) then (chunk_hash) — both
    // 8-byte-digest-keyed, both preceded by map-side partials
    val cdc = Dedup.cdcDupChunks(docs)
    val cs = shuffles(cdc)
    assert(cs.size == 2, finalPlan(cdc).toString)
    // and the Generate's inferred filter must NOT have duplicated the
    // chunking expression below the projections (the posexplode_outer
    // contract in cdcChunks): no Filter node mentions zip_with
    val badFilter = allNodes(finalPlan(cdc)).exists {
      case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.toString.contains("zip_with")
      case _ => false
    }
    assert(!badFilter, "chunk expression duplicated into a pushed-down filter")
  }

  test("withRowEntropy (per-row streaming twin) equals charEntropy (distributed agg) row-for-row") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val agg = TextAnalysis.charEntropy(docs)
      .select("doc_id", "n_chars", "n_distinct_chars", "entropy_nats")
    val row = TextAnalysis.withRowEntropy(docs.select("doc_id", "text"), "text")
      .select("doc_id", "n_chars", "n_distinct_chars", "entropy_nats")
    assert(row.exceptAll(agg).isEmpty && agg.exceptAll(row).isEmpty)
  }

  test("pipeline_web_ingest: every doc gets a verdict; the p25 gate rejects a calibrated share") {
    val r = graft.queries.AnalyticsQueries
      .pipelineWebIngest(spark, sf("sf0.001"))
      .select("doc_id", "verdict", "e_micro", "p25").collect()
    val docs = graft.Tables(spark, sf("sf0.001")).documents.count()
    assert(r.length == docs) // routable verdicts, not a silent filter
    val rejected = r.count(!_.getBoolean(1))
    // DDSketch p25 is approximate (bucketed reps): the rejected share must
    // be material and below half
    assert(rejected > 0 && rejected < docs / 2, s"rejected=$rejected of $docs")
    // the verdict is exactly the threshold predicate
    assert(r.forall(row => row.getBoolean(1) == (row.getLong(2) >= row.getLong(3))))
  }

  test("cdcRewrite: first occurrence survives, later copies vanish, novel docs untouched") {
    val shared = (0 until 100).map(i => s"t$i").mkString(" ")
    val novel = (0 until 60).map(i => s"n$i").mkString(" ")
    val df = Seq((5L, shared), (9L, shared), (11L, novel)).toDF("doc_id", "text")
    val r = Dedup.cdcRewrite(df).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    // doc 5 is the corpus-min occurrence of every one of its chunks
    assert(r(0)._1 == 5L && r(0)._3 == r(0)._2 && r(0)._4 == shared)
    // doc 9's every chunk appeared first in doc 5
    assert(r(1)._1 == 9L && r(1)._3 == 0L && r(1)._4 == "")
    // doc 11 shares nothing and survives verbatim
    assert(r(2)._1 == 11L && r(2)._3 == r(2)._2 && r(2)._4 == novel)
    // global invariant: kept occurrences == distinct chunks in the corpus
    val distinctChunks = Dedup.cdcChunks(df).select("chunk").distinct().count()
    assert(r.map(_._3).sum == distinctChunks)
  }

  test("cdcDupChunks: two identical docs duplicate every chunk; keeper is the min id") {
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val df = Seq((5L, text), (9L, text)).toDF("doc_id", "text")
    val dups = Dedup.cdcDupChunks(df)
      .select("n_occ", "n_docs", "keeper_id", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(dups.nonEmpty)
    assert(dups.forall { case (occ, nd, keep, _) => occ == 2 && nd == 2 && keep == 5 })
    assert(dups.map(_._4).sum == 100) // the dup chunks tile the whole doc
  }
}
