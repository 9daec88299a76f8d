package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k best (score desc, id asc)
  * pairs seen, in O(log k) per row and O(k) memory.
  *
  * This is the guaranteed-shape building block for distributed top-k
  * (`Similarity.bruteForceTopK`): as a [[TypedImperativeAggregate]] it runs
  * through ObjectHashAggregate with a map-side Partial stage, so the ONLY
  * rows that reach the shuffle are one serialized ≤k heap per (group ×
  * map-partition) — the scored corpus itself never shuffles. Spark's own
  * `InferWindowGroupLimit` rewrite achieves a similar two-stage plan for
  * `row_number() <= k` filters, but (a) it silently degrades to a full
  * shuffle+sort when `k > spark.sql.window.group.limit.threshold` (default
  * 1000), and (b) its Partial stage fully sorts every scored row per
  * partition (O(n log n)); the heap is O(n log k) and config-independent.
  *
  * Determinism: ties in `score` break toward the smaller `id`, matching
  * `ORDER BY score DESC, id` — so results are oracle-hashable.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"graft_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) arguments, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  // "Greater" per this ordering = worse (lower score, then higher id), so the
  // PriorityQueue head is always the eviction candidate.
  private val worseFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worseFirst)

  private def offer(heap: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (heap.size < k) heap.enqueue(e)
    else if (worseFirst.compare(e, heap.head) < 0) { heap.dequeue(); heap.enqueue(e) }

  override def update(heap: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) offer(heap, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    heap
  }

  override def merge(heap: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(heap, _))
    heap
  }

  /** Best-first array<struct<score,id>> (rank = array position + 1). */
  override def eval(heap: mutable.PriorityQueue[(Double, Long)]): Any = {
    val worstFirst: Seq[(Double, Long)] = heap.clone().dequeueAll
    new GenericArrayData(worstFirst.reverseIterator
      .map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(heap: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * heap.size)
    buf.putInt(heap.size)
    heap.foreach { case (s, i) => buf.putDouble(s); buf.putLong(i) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val heap = createAggregationBuffer()
    var n = buf.getInt
    while (n > 0) { heap.enqueue((buf.getDouble, buf.getLong)); n -= 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
