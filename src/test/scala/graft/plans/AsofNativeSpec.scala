package graft.plans

import graft.SparkSpec
import graft.operators.AsofJoin
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native as-of exec against a brute-force ground truth (a plain left
  * join + greatest-(ts, tie) pick — exactly DuckDB `ASOF LEFT JOIN`
  * semantics, nulls and all), and against the compositional operator. The
  * fixture plants every edge the merge has to survive: ties at equal
  * (key, ts), a genuinely-NULL right value that must not resurrect an older
  * row, null keys / timestamps on both sides, keys with no matches on
  * either side, and a candidate left over from an earlier key group.
  */
class AsofNativeSpec extends SparkSpec {

  private def fixture: (DataFrame, DataFrame) = {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lt", LongType),
      StructField("lv", StringType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rt", LongType),
      StructField("tie", LongType), StructField("rv", StringType)))
    val lRows = Seq(
      Row("a", 10L, "l01"), Row("a", 5L, "l02"), Row("a", 4L, "l03"),
      Row("b", 7L, "l04"), Row("b", 100L, "l05"),
      Row("c", 1L, "l06"),          // key with no right rows at all
      Row(null, 10L, "l07"),        // null left key: never matches
      Row("a", null, "l08"),        // null left ts: never matches
      Row("d", 50L, "l09"),         // right side has only a null-ts row for d
      Row("f", 3L, "l10"))          // left rows BEFORE any right row of f
    val rRows = Seq(
      Row("a", 5L, 1L, "r1"), Row("a", 5L, 2L, "r2"), // tie at (a,5): tie=2 wins
      Row("a", 9L, 1L, null),       // genuine NULL right value stays NULL
      Row("b", 7L, 1L, "r4"), Row("b", 8L, 1L, "r5"),
      Row(null, 1L, 1L, "r6"),      // null right key: never a candidate
      Row("d", null, 1L, "r7"),     // null right ts: never a candidate
      Row("e", 1L, 1L, "r8"),       // right-only key: must not leak into f
      Row("f", 4L, 1L, "r9"))
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(lRows, 3), lSchema)
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(rRows, 2), rSchema)
    (l, r)
  }

  /** DuckDB ASOF LEFT JOIN semantics by brute force: all candidates with
    * equal key and rt <= lt, keep the greatest (rt, tie). Null comparisons
    * fail the join condition, which is exactly the null contract. */
  private def bruteForce(l: DataFrame, r: DataFrame): DataFrame = {
    val cand = l.join(
      r.toDF("rk", "rt", "tie", "rv"),
      col("k") === col("rk") && col("rt") <= col("lt"), "left")
    val w = Window.partitionBy("lv")
      .orderBy(col("rt").desc_nulls_last, col("tie").desc_nulls_last)
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("k"), col("lt"), col("lv"),
        col("rt").as("m_rt"), col("tie").as("m_tie"), col("rv").as("m_rv"))
  }

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.orderBy(col("lv")).collect().toSeq

  test("native as-of exec matches brute-force DuckDB semantics on ties and nulls") {
    val (l, r) = fixture
    val native = AsofJoinNative.join(l, r, Seq("k"), "lt", "rt", "tie")
      .select(col("k"), col("lt"), col("lv"),
        col("asof_rt").as("m_rt"), col("asof_tie").as("m_tie"),
        col("asof_rv").as("m_rv"))
    assert(sortedRows(native) == sortedRows(bruteForce(l, r)))
  }

  test("mismatched key/timestamp types fail fast instead of comparing garbage") {
    // the exec's merge orderings are built from LEFT types and applied to
    // right-projected rows — an Int right ts against a Long left ts would
    // silently mis-join (r16 review sweep), so construction must throw
    val (l, r) = fixture
    val rInt = r.withColumn("rt", col("rt").cast("int"))
    val e = intercept[IllegalArgumentException] {
      AsofJoinNative.join(l, rInt, Seq("k"), "lt", "rt", "tie")
    }
    assert(e.getMessage.contains("timestamp types must match"))
    val rIntKey = r.withColumn("k", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoinNative.join(l, rIntKey, Seq("k"), "lt", "rt", "tie")
    }
    assert(e2.getMessage.contains("key types must match"))
  }

  test("compositional as-of operator matches brute-force DuckDB semantics on ties and nulls") {
    val (l, r) = fixture
    val comp = AsofJoin
      .asofJoinLast(l, r, Seq("k"), "lt", "rt", Seq("rt", "tie", "rv"), "tie")
      .select(col("k"), col("lt"), col("lv"),
        col("asof_rt").as("m_rt"), col("asof_tie").as("m_tie"),
        col("asof_rv").as("m_rv"))
    assert(sortedRows(comp) == sortedRows(bruteForce(l, r)))
  }

  test("native as-of exec matches brute force on randomized corpora (seeded)") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lt", LongType),
      StructField("lv", StringType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rt", LongType),
      StructField("tie", LongType), StructField("rv", StringType)))
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      // small key space + small time range force heavy key groups, ties at
      // equal (key, ts), and both-null and no-match cases
      def key(): String = if (rnd.nextInt(10) == 0) null else ("k" + rnd.nextInt(6))
      def ts(): Any = if (rnd.nextInt(12) == 0) null else rnd.nextInt(40).toLong
      val lRows = (1 to 200).map(i => Row(key(), ts(), f"l$i%03d"))
      // tie = row index: unique per right row, so the greatest-(rt, tie)
      // winner is well-defined on both sides even at equal (k, rt)
      val rRows = (1 to 150).map(i =>
        Row(key(), ts(), i.toLong,
          if (rnd.nextInt(8) == 0) null else s"r$i"))
      val l = spark.createDataFrame(
        spark.sparkContext.parallelize(lRows, 5), lSchema)
      val r = spark.createDataFrame(
        spark.sparkContext.parallelize(rRows, 3), rSchema)
      val native = AsofJoinNative.join(l, r, Seq("k"), "lt", "rt", "tie")
        .select(col("k"), col("lt"), col("lv"),
          col("asof_rt").as("m_rt"), col("asof_tie").as("m_tie"),
          col("asof_rv").as("m_rv"))
      assert(sortedRows(native) == sortedRows(bruteForce(l, r)), s"seed=$seed")
    }
  }

  test("native as-of exec handles MULTI-column keys (randomized, seeded)") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("k2", LongType),
      StructField("lt", LongType), StructField("lv", StringType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("k2", LongType),
      StructField("rt", LongType), StructField("tie", LongType),
      StructField("rv", StringType)))
    val rnd = new scala.util.Random(11)
    def key(): String = if (rnd.nextInt(10) == 0) null else ("k" + rnd.nextInt(4))
    def key2(): Any = if (rnd.nextInt(10) == 0) null else rnd.nextInt(3).toLong
    def ts(): Any = if (rnd.nextInt(12) == 0) null else rnd.nextInt(30).toLong
    val l = spark.createDataFrame(spark.sparkContext.parallelize(
      (1 to 150).map(i => Row(key(), key2(), ts(), f"l$i%03d")), 4), lSchema)
    val r = spark.createDataFrame(spark.sparkContext.parallelize(
      (1 to 120).map(i => Row(key(), key2(), ts(), i.toLong, s"r$i")), 3), rSchema)
    val native = AsofJoinNative.join(l, r, Seq("k", "k2"), "lt", "rt", "tie")
      .select(col("k"), col("k2"), col("lt"), col("lv"),
        col("asof_rt").as("m_rt"), col("asof_tie").as("m_tie"),
        col("asof_rv").as("m_rv"))
    val cand = l.join(
      r.toDF("rk", "rk2", "rt", "tie", "rv"),
      col("k") === col("rk") && col("k2") === col("rk2") && col("rt") <= col("lt"),
      "left")
    val w = Window.partitionBy("lv")
      .orderBy(col("rt").desc_nulls_last, col("tie").desc_nulls_last)
    val brute = cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("k"), col("k2"), col("lt"), col("lv"),
        col("rt").as("m_rt"), col("tie").as("m_tie"), col("rv").as("m_rv"))
    assert(sortedRows(native) == sortedRows(brute))
  }

  test("native as-of exec matches the compositional operator on the events corpus") {
    import graft.queries.Relational
    val d = sf("sf0.001")
    val a = Relational.asofSignup(spark, d).collect().toSeq
    val b = Relational.asofSignupNative(spark, d).collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
