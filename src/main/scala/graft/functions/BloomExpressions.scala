package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe: `graft_bloom_contains(hash, bloomBytes)`.
  *
  * The runtime-filter pattern as a first-class expression: a serialized
  * [[BloomFilter]] rides into the plan as a BINARY LITERAL (foldable —
  * deserialized once per executor expression instance, not per row) and the
  * probe is `mightContainLong`. One-sided error: never a false negative, so
  * a negative probe is a PROOF of absence — the property that makes a bloom
  * screen sound as a pre-filter in front of an exact anti-join.
  *
  * Same [[CodegenFallback]] stance as the other compiled expressions here:
  * per-row cost is a few hash probes on a shared bitset; the win over a
  * broadcast join is that the filter is bit-packed (~10 bits/item at 1%
  * fpp vs ≥16 bytes/key in a hash relation). */
/** Broadcast-handle variant of [[BloomMightContainLong]] (r16, VERDICT r15
  * #4 advice): the serialized filter rides as a
  * [[org.apache.spark.broadcast.Broadcast]] REFERENCE in the expression
  * tree instead of a binary literal. At registry scale (1B shingles ≈
  * 1.2 GB of bits at 1% fpp) a literal is shipped inside every serialized
  * task binary; a broadcast ships once per executor over the torrent
  * protocol and the plan tree stays bytes-sized. Scala-API-only (a
  * broadcast cannot be named in SQL text) — the literal form remains
  * registered for SQL use at test scale. */
case class BloomMightContainBcast(child: Expression,
                                  bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains_bcast"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a long probe value")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloom.value))

  override def nullSafeEval(probe: Any): Any =
    bf.mightContainLong(probe.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BloomMightContainLong(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a long probe value")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary literal bloom filter")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(probe: Any, @annotation.unused blob: Any): Any =
    bloom.mightContainLong(probe.asInstanceOf[Long])

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
