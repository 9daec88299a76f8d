package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OptOutRoutingSpec extends SparkSpec {

  test("latestPerKey keeps exactly the max-version row per key") {
    import spark.implicits._
    val dim = Seq(
      ("a@x", "h1", 1L), ("a@x", "h2", 3L), ("a@x", "h3", 2L),
      ("b@x", "h4", 7L),
    ).toDF("email", "hash", "version")
    val got = OptOutRouting.latestPerKey(dim, "email", "version", "hash")
      .orderBy("email").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a@x", "h2", 3L), ("b@x", "h4", 7L)))
  }

  test("withOptOutFlag + split route records by broadcast membership") {
    import spark.implicits._
    val recs = Seq(("r1", "hA"), ("r2", "hB"), ("r3", "hA"), ("r4", "hC")).toDF("id", "hashed_id")
    val optOut = Seq("hA", "hZ").toDF("hash")
    val routed = OptOutRouting.withOptOutFlag(recs, "hashed_id", optOut, "hash")
    val (main, opt) = OptOutRouting.split(routed)
    assert(opt.select("id").as[String].collect().sorted.toSeq == Seq("r1", "r3"))
    assert(main.select("id").as[String].collect().sorted.toSeq == Seq("r2", "r4"))
    // row count preserved (left join against distinct dim cannot fan out)
    assert(routed.count() == 4)
  }

  test("withOptOutFlag does not duplicate rows when the dim has duplicate hashes") {
    import spark.implicits._
    val recs = Seq(("r1", "hA")).toDF("id", "hashed_id")
    val optOut = Seq("hA", "hA", "hA").toDF("hash")
    assert(OptOutRouting.withOptOutFlag(recs, "hashed_id", optOut, "hash").count() == 1)
  }

  test("end-to-end routed DAG on sf0.001: routes are consistent per user") {
    val routed = EventStatements.routed(spark, sf("sf0.001"))
    // every user lands on exactly one route (hash is per-user deterministic)
    val bad = routed.groupBy("user_id").agg(countDistinct("route").as("n")).filter(col("n") > 1).count()
    assert(bad == 0)
    assert(routed.count() > 0)
    // both routes non-empty at this scale
    assert(routed.select("route").distinct().count() == 2)
  }
}
