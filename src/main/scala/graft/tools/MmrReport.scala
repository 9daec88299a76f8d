package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Similarity

/** Dev tool: measure the MMR relevance-vs-diversity trade on real data —
  * for a sweep of λ weights, the mean cos(query, selected) (relevance kept)
  * and the mean pairwise cos within each query's selection (redundancy
  * spent). The λ=(1,0) row IS the plain relevance top-k baseline, so the
  * other rows read as "how much redundancy each λ buys off for how much
  * relevance". Results recorded in SCALING.md.
  *
  * Usage: MmrReport [sfdir] [nQueries=20] [k=4] [depth=24]
  */
object MmrReport {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = if (args.length > 1) args(1).toInt else 20
    val k = if (args.length > 2) args(2).toInt else 4
    val depth = if (args.length > 3) args(3).toInt else 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables(spark, dir).embeddings
    val queries = emb.filter(col("vec_id") < nQueries)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    println(f"${"lamNum/lamCompl"}%-16s ${"relevance"}%10s ${"intra_sim"}%10s")
    for ((ln, lc) <- Seq((1L, 0L), (9L, 1L), (7L, 3L), (5L, 5L), (3L, 7L))) {
      val sel = Similarity.mmrTopK(emb, queries, k = k, depth = depth,
        lamNum = ln, lamCompl = lc)
      val withV = sel.join(vecs, "vec_id")
        .join(vecs.select(col("vec_id").as("query_id"), col("v").as("qv")), "query_id")
      val rel = withV.agg(avg(Similarity.cosine(col("qv"), col("v")))).head.getDouble(0)
      val a = withV.select(col("query_id"), col("vec_id").as("ia"), col("v").as("va"))
      val b = withV.select(col("query_id"), col("vec_id").as("ib"), col("v").as("vb"))
      val intra = a.join(b, Seq("query_id")).filter(col("ia") < col("ib"))
        .agg(avg(Similarity.cosine(col("va"), col("vb")))).head.getDouble(0)
      println(f"$ln%d/$lc%-14d $rel%10.4f $intra%10.4f")
    }
    spark.stop()
  }
}
