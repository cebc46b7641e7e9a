package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Mergeable quantile sketch: a bounded uniform row sample selected by the
  * k SMALLEST hashes of a unique row key, carrying each sampled row's
  * value. Completes the engine's sketch family (KMV distinct counts,
  * Space-Saving heavy hitters) with rank statistics.
  *
  * Why min-k row sampling instead of GK/KLL/t-digest: those compact by
  * buffer-arrival order (KLL additionally by coin flips), so the result
  * depends on partitioning and shuffle-fetch order — unacceptable for an
  * engine whose correctness gates hash-compare against a SQL oracle. The
  * min-k-by-hash rule is a commutative idempotent semilattice: any merge
  * order, any partitioning, any retry yields the SAME sample, and when a
  * group holds ≤ k rows the sample IS the group, making every rank
  * statistic exact. Above k it is a uniform (hash-selected) sample with
  * standard O(1/sqrt(k)) quantile error.
  *
  * Scale shape: a `TypedImperativeAggregate` with partial aggregation —
  * per-partition update then sketch merge, so at most k (hash, value)
  * pairs per group cross the shuffle, map-side combined. Memory is O(k)
  * per group by construction. Hash collisions (two row keys with equal
  * hash) keep the smaller value, again order-independent.
  *
  * eval() returns the sampled VALUES sorted ascending, ready for rank
  * extraction: the engine's quantile convention (matching
  * `Sampling.quantileThresholdBy` and its oracle) is the smallest value
  * whose cumulative count reaches ceil(q·n) — `element_at(vals,
  * greatest(1, ceil(q * size)))` on the sorted array.
  */
case class QuantileSketchAgg(
    hashKey: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1, "sketch size k must be >= 1")

  override def left: Expression = hashKey
  override def right: Expression = value

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (hashKey.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch expects a BIGINT row-key hash, got ${hashKey.dataType.sql}")
    else if (value.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch expects a DOUBLE value, got ${value.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def offer(buffer: java.util.TreeMap[java.lang.Long, java.lang.Double],
                    h: Long, v: Double): Unit = {
    val existing = buffer.get(h)
    if (existing != null) {
      // collision on the row-key hash: keep the smaller value, so the
      // outcome is independent of arrival order
      if (v < existing) buffer.put(h, v)
    } else if (buffer.size < k || h < buffer.lastKey()) {
      buffer.put(h, v)
      if (buffer.size > k) buffer.pollLastEntry()
    }
  }

  override def update(buffer: java.util.TreeMap[java.lang.Long, java.lang.Double],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = hashKey.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      offer(buffer, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: java.util.TreeMap[java.lang.Long, java.lang.Double],
                     other: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buffer, e.getKey, e.getValue)
    }
    buffer
  }

  /** Sampled values sorted ascending (NOT by hash): rank extraction is a
    * plain element_at downstream. */
  override def eval(buffer: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val arr = new Array[Double](buffer.size)
    val it = buffer.values().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getDouble); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchAgg =
    copy(hashKey = newLeft, value = newRight)
}

object QuantileSketch {
  import org.apache.spark.sql.functions._

  /** Aggregate Column: ascending array of the values carried by the k
    * smallest row-key hashes. Exact sample of the group when it has ≤ k
    * rows. */
  def quantileSketch(rowKeyHash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(rowKeyHash),
        ColumnBridge.expression(value), k).toAggregateExpression())

  /** Rank extraction under the engine's quantile convention: smallest
    * value whose cumulative count reaches ceil(q·n) — 1-indexed
    * element ceil(q·size) of the ascending sample, floored at 1. */
  def sketchQuantile(sketch: Column, q: Double): Column = {
    require(q > 0.0 && q <= 1.0, s"quantile q must be in (0, 1], got $q")
    element_at(sketch,
      greatest(lit(1), ceil(lit(q) * size(sketch))).cast("int"))
  }
}
