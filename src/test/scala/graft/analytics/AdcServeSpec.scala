package graft.analytics

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Build/serve split of flat ADC ([[ProductQuantization.adcBuild]]/
  * [[ProductQuantization.adcServe]], VERDICT r11 #4): serving from the
  * persisted codebooks+codes returns BIT-IDENTICAL rows to the one-shot
  * [[ProductQuantization.adcTopK]], so Bench's `index_split` row for
  * `sim_pq_adc` measures the same computation the oracled lifecycle query
  * runs — just split at the train/serve boundary. */
class AdcServeSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("query_id"), col("rank")).collect().toSeq.map(_.toSeq)

  test("adcServe over adcBuild state equals one-shot adcTopK bit-for-bit") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val oneShot = ProductQuantization.adcTopK(emb, queries, k = 5)
    val want = rows(oneShot)
    oneShot.unpersist()
    val dir = Files.createTempDirectory("adc-split").toString
    ProductQuantization.adcBuild(emb, dir)
    val got = rows(ProductQuantization.adcServe(spark, dir, queries, k = 5))
    assert(got == want)
    assert(got.nonEmpty)
    // the corpus contributes ONLY its stored state: the serve plan scans
    // dir/codes + dir/codebooks; the sole raw-vector scan is the query side
    val locs = ProductQuantization.adcServe(spark, dir, queries, k = 5)
      .queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
      }.flatten
    assert(locs.exists(_.contains("/codes")))
    assert(locs.exists(_.contains("/codebooks")))
    assert(locs.count(_.contains("embeddings")) <= 1)
  }

  test("the split survives the sampled-training default: build/serve equals sampled one-shot") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val target = 100L // force the bounded-sample branch on the 500-vec corpus
    val oneShot = ProductQuantization.adcTopK(emb, queries, k = 5,
      trainSampleTarget = target)
    val want = rows(oneShot)
    oneShot.unpersist()
    val dir = Files.createTempDirectory("adc-split-sampled").toString
    ProductQuantization.adcBuild(emb, dir, trainSampleTarget = target)
    assert(PqIndex.trainedMode(spark, dir) == "sampled",
      "above the target the default policy must engage the sampled branch")
    val got = rows(ProductQuantization.adcServe(spark, dir, queries, k = 5))
    assert(got.nonEmpty && got == want)
    // the stored codes still cover the FULL corpus (encoded under the
    // sampled quantizer), not just the training sample
    assert(spark.read.parquet(s"$dir/codes").count() == emb.count())
  }
}
