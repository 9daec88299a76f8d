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
}
