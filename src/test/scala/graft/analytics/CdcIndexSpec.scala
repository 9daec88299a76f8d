package graft.analytics

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the persisted CDC chunk index: screening semantics, append
  * composition, and verdict totality (the oracled split semantics is the
  * dedup_cdc_admit gate). */
class CdcIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("screen: a history copy is pure duplicate mass, a novel doc is clean, every doc verdicts") {
    val shared = (0 until 120).map(i => s"h$i").mkString(" ")
    val novel = (0 until 90).map(i => s"n$i").mkString(" ")
    val half = (0 until 60).map(i => s"h$i").mkString(" ") + " " +
      (0 until 60).map(i => s"m$i").mkString(" ")
    val idx = tmp("cdcidx")
    CdcIndex.build(Seq((1L, shared)).toDF("doc_id", "text"), idx)
    val verdicts = CdcIndex.screenDelta(spark, idx,
        Seq((10L, shared), (11L, novel), (12L, half)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(verdicts.length == 3)
    val byId = verdicts.map(r => r.getLong(0) -> r).toMap
    assert(byId(10L).getAs[Long]("dup_permille") == 1000L && !byId(10L).getAs[Boolean]("admit"))
    assert(byId(11L).getAs[Long]("n_dup") == 0L && byId(11L).getAs[Boolean]("admit"))
    // the mixed doc: its h-prefix chunks hit history up to the boundary
    // chunk that spans the h/m seam (content-defined: the seam chunk is new)
    val m = byId(12L)
    assert(m.getAs[Long]("n_dup") > 0L && m.getAs[Long]("n_dup") < m.getAs[Long]("n_chunks"))
  }

  test("append composes: build(h1)+append(h2) screens exactly like build(h1 ∪ h2)") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val h1 = docs.filter(col("doc_id") % 3 === 0)
    val h2 = docs.filter(col("doc_id") % 3 === 1)
    val delta = docs.filter(col("doc_id") % 3 === 2)
    val (ia, ib) = (tmp("cdcA"), tmp("cdcB"))
    CdcIndex.build(h1, ia); CdcIndex.append(h2, ia)
    CdcIndex.build(h1.unionByName(h2), ib)
    val a = CdcIndex.screenDelta(spark, ia, delta)
    val b = CdcIndex.screenDelta(spark, ib, delta)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == delta.count())
  }
}
