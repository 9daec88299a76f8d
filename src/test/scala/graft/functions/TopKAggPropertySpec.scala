package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-correctness laws for the bounded-heap top-k aggregate: any
  * partitioning of the input into partial buffers, serialized and merged in
  * any grouping, must equal the global top-k — the exact property Spark's
  * partial→shuffle→final aggregation relies on. Pure unit-level (no Spark
  * session): update/merge/serialize/eval are driven directly. */
class TopKAggPropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], n: Int = 80)(body: T => Unit): Unit =
    (0 until n).foreach(i => body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong))))

  private val caseGen: Gen[(Int, List[(Double, Long)], Int)] = for {
    k <- Gen.choose(1, 8)
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0, 5).map(_ / 4.0) // coarse scores force ties
      id <- Gen.choose(0L, 20L)
    } yield (s, id))
    splits <- Gen.choose(1, 5)
  } yield (k, rows, splits)

  private def expected(rows: List[(Double, Long)], k: Int): List[(Double, Long)] =
    rows.sortBy { case (s, id) => (-s, id) }.take(k)

  private def evalToList(agg: TopKByScore, buf: Any): List[(Double, Long)] = {
    val arr = agg.eval(buf.asInstanceOf[scala.collection.mutable.PriorityQueue[(Double, Long)]])
      .asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getDouble(0), r.getLong(1))
    }.toList
  }

  test("partial buffers + serialize + merge ≡ global top-k (any split, with ties)") {
    forAll(caseGen) { case (k, rows, splits) =>
      val agg = TopKByScore(BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = true), k)
      // single-buffer reference
      val whole = agg.createAggregationBuffer()
      rows.foreach { case (s, id) => agg.update(whole, InternalRow(s, id)) }
      val globalK = evalToList(agg, whole)
      assert(globalK == expected(rows, k))

      // partitioned: partial buffers per chunk, serialize/deserialize each
      // (the shuffle), then merge in order
      val chunks = rows.grouped(math.max(1, (rows.size + splits - 1) / splits)).toList
      val partials = chunks.map { chunk =>
        val b = agg.createAggregationBuffer()
        chunk.foreach { case (s, id) => agg.update(b, InternalRow(s, id)) }
        agg.deserialize(agg.serialize(b))
      }
      val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
      assert(evalToList(agg, merged) == globalK)
    }
  }

  test("null inputs are skipped, not ranked") {
    val agg = TopKByScore(BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), 3)
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow(null, 1L))
    agg.update(buf, InternalRow(0.5, null))
    agg.update(buf, InternalRow(0.9, 7L))
    assert(evalToList(agg, buf) == List((0.9, 7L)))
  }
}
