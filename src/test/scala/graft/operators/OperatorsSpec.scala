package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  test("salted aggregation equals the unsalted aggregate exactly") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
    val plain = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val salted = Salting.saltedCountSum(ev, "user_id", "value", salts = 8)
    // join on key and compare; doubles summed in different order → compare rounded
    val joined = plain.alias("p").join(salted.alias("s"), Seq("user_id"))
      .filter(col("p.n") =!= col("s.n") ||
        round(col("p.sum_value"), 6) =!= round(col("s.sum_value"), 6))
    assert(joined.count() == 0)
    assert(plain.count() == salted.count())
  }

  test("salted join equals the plain join exactly (row multiset)") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf("sf0.001")).events
      .select(col("event_id"), col("user_id"))
    val dim = (0L until 150L).map(u => (u, s"seg${u % 7}")).toDF("u", "segment")
    val plain = ev.join(dim, col("user_id") === col("u"))
      .select(col("event_id"), col("segment"))
    val salted = Salting.saltedJoin(ev, dim, "user_id", "u", salts = 8)
      .select(col("event_id"), col("segment"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("window-sorted exact percentiles equal percentile() at the oracle boundary") {
    val li = graft.Tables(spark, sf("sf0.01")).lineitem
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    // compare at the round(4) output boundary (same as the DuckDB oracle):
    // the interpolation double arithmetic differs by ≤1 ULP from the
    // imperative aggregate's evaluation order
    def r4(x: Double): Double = math.rint(x * 1e4) / 1e4
    val viaWindow = Percentiles.exactByWindow(li, "l_returnflag", "l_extendedprice", ps)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r4(r.getDouble(1)), r4(r.getDouble(2)), r4(r.getDouble(3))))
    val viaAgg = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r4(r.getDouble(1)), r4(r.getDouble(2)), r4(r.getDouble(3))))
    assert(viaWindow.toSeq == viaAgg.toSeq)
  }

  test("percentile edge cases: single-row group, two-row interpolation, approx gate") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val got = Percentiles.exactByWindow(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("a", 10.0), ("b", 2.0)))
    // above the row limit the entry point switches to the sketch; at this
    // tiny accuracy the sketch is still rank-exact on 3 rows
    val approx = Percentiles.perGroup(df, "g", "v", Seq("p50" -> 0.5), exactRowLimit = 0)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(approx.length == 2 && approx(0)._1 == "a")
  }

  test("asof join: a NULL right value is kept, not replaced by a stale older value") {
    import spark.implicits._
    val left = Seq((1L, 25L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, Some(5L)), (1L, 20L, None))
      .toDF("k", "t", "rid")
    val row = AsofJoin.asofJoinLast(left, right, Seq("k"), "t", "t", Seq("rid"), "t")
      .select(col("asof_rid")).collect()(0)
    // the true as-of match (t=20) has rid=NULL; DuckDB ASOF would return NULL
    assert(row.isNullAt(0), s"expected NULL, got ${row}")
  }

  test("asof join: rows with no earlier right row get null") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 20L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 7L, 900L), (1L, 10L, 901L), (3L, 1L, 902L))
      .toDF("k", "t", "rid")
    val got = AsofJoin.asofJoinLast(left, right, Seq("k"), "t", "t", Seq("rid"), "rid")
      .select(col("lid"), col("asof_rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(101L) == -1L)  // t=5 before any right row for k=1
    assert(got(100L) == 901L) // t=10 ties with right t=10 → included
    assert(got(102L) == -1L)  // k=2 has no right rows at all
  }

  test("skew probes and salting guard their degenerate inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("user_id", "value")
    // empty frame: the agg row is all nulls — must answer (0, 0)/false,
    // not NPE (the vanilla forms return empty on the same input)
    assert(AdaptiveWindows.hotKeyStats(empty) == (0L, 0L))
    assert(!AdaptiveWindows.wouldChunk(empty))
    assert(!Salting.wouldSalt(empty, "user_id"))
    // salts = 0: pmod(x, 0) is NULL under non-ANSI semantics, so a salted
    // join would silently return ZERO rows — it must throw instead
    val df = Seq((1L, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Salting.saltedJoin(df, df.withColumnRenamed("k", "k2"), "k", "k2", salts = 0)
    }
    assert(e.getMessage.contains("salts"))
  }

  test("perGroup paths agree on schema and row set: integer values, all-null groups") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("x", Option.empty[Long]))
      .toDF("g", "v")
    val exact = Percentiles.exactByWindow(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect()
    val approx = Percentiles.approxPerGroup(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect()
    // INTEGER value column: both paths must return interpolating DOUBLEs
    // (the raw sketch would return a long element — same query flipping
    // type and value at the exactRowLimit gate)
    assert(exact.map(_.getString(0)).toSeq == Seq("a"))
    assert(approx.map(_.getString(0)).toSeq == Seq("a"),
      "an all-null group must be dropped by BOTH paths, not kept with null quantiles")
    assert(exact(0).getDouble(1) == 1.5)
    assert(approx(0).schema("p50").dataType.typeName == "double")
  }

  test("range join rejects fractional second columns (silent match loss near interval ends)") {
    import spark.implicits._
    val pts = Seq((1L, 100.2)).toDF("id", "es")
    val iv = Seq((10L, 99.0, 100.5)).toDF("win", "s", "e")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "es", iv, "s", "e", bucketSec = 100L)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
