package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Intra-document span trim and the cross-split leakage audit. Corpus-level
  * parity is the DuckDB oracle (`dedup_intradoc`, `split_leakage`); these
  * pin the hand-checkable semantics and the zero-shuffle plan contract. */
class IntradocLeakageSpec extends SparkSpec {
  import spark.implicits._

  test("intraDocSpanDedup: repeated span dropped, first kept, tail partial span kept") {
    val d = Seq(
      (1L, "a b c d a b x y"),   // span "a b" repeats at idx 2
      (2L, "p q r s t"),         // no repeats; tail span "t" is partial
      (3L, "z z z z z"))         // spans: "z z","z z","z" -> one removal
      .toDF("doc_id", "text")
    val got = Dedup.intraDocSpanDedup(d, spanTokens = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 4L, 1L, "a b c d x y")))
    assert(got(1) == ((2L, 3L, 0L, "p q r s t")))
    assert(got(2) == ((3L, 3L, 1L, "z z z z z".take(5))))
  }

  test("intraDocSpanDedup: ZERO shuffles — a pure narrow map at any corpus size") {
    val d = graft.Tables(spark, sf("sf0.001")).documents
    val plan = Dedup.intraDocSpanDedup(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
  }

  test("splitLeakageReport: a planted cross-split 8-gram is counted once; disjoint docs are not") {
    // find real ids per split via the shared hash (split = f(doc_id) only)
    def splitOf(id: Long): String = {
      val b = Dedup.hash60Local(id.toString) % 1000
      if (b < 800) "train" else if (b < 900) "val" else "test"
    }
    val ids = (1L to 2000L)
    val trainId = ids.find(splitOf(_) == "train").get
    val testId1 = ids.find(splitOf(_) == "test").get
    val testId2 = ids.filter(splitOf(_) == "test").drop(1).head
    val valId   = ids.find(splitOf(_) == "val").get
    val shared = "one two three four five six seven eight"
    val d = Seq(
      (trainId, s"$shared plus unrelated training tail content here"),
      (testId1, s"prefix words then $shared and something else"), // leaked from train
      (testId2, "totally disjoint text with no overlap at all whatsoever ok"),
      (valId, "different val content sharing nothing with anyone here today"))
      .toDF("doc_id", "text")
    val got = Dedup.splitLeakageReport(d)
      .orderBy($"from_split", $"to_split").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("train", "test", 2L, 1L),
      ("train", "val", 1L, 0L),
      ("val", "test", 2L, 0L)))
  }
}
