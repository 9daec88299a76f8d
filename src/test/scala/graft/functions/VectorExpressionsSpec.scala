package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the codegen'd dot product: bit-parity with the HOF
  * formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) INCLUDING the
  * degenerate shapes — mismatched lengths and null elements must yield
  * NULL exactly as the HOF twin does, so a truncated or corrupt embedding
  * drops out of top-k instead of contributing a plausible partial sum. */
class VectorExpressionsSpec extends SparkSpec {

  private def hof(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")

  test("graft_array_dot matches the HOF twin on values, length mismatch, and null elements") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 2.0)), // mismatch
      (3L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)), // null slot
      (4L, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double])
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.functions.GraftFunctions.arrayDot(col("a"), col("b")).as("dot"),
        hof("a", "b").as("hof"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"id ${r.getLong(0)}: nullability diverged from the HOF twin ($r)")
      if (!r.isNullAt(1))
        assert(r.getDouble(1) == r.getDouble(2), s"id ${r.getLong(0)}: $r")
    }
    assert(!got(0).isNullAt(1) && got(0).getDouble(1) == 32.0)
    assert(got(1).isNullAt(1), "length mismatch must be NULL, not a truncated sum")
    assert(got(2).isNullAt(1), "a null element must null the product, not read as 0.0")
    assert(!got(3).isNullAt(1) && got(3).getDouble(1) == 0.0)
  }

  test("graft_minhash_signature rejects k < 1 instead of emitting empty signatures") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a b c", "b c d"))).toDF("sh")
    val e = intercept[Exception] {
      df.select(expr("graft_minhash_signature(sh, 0)")).collect()
    }
    assert(e.getMessage.contains("k >= 1"), e.getMessage)
  }
}
