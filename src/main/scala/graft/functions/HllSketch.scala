package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register aggregate with a FIXED deterministic hash split,
  * completing the sketch family (KMV distinct, Space-Saving heavy
  * hitters, min-k quantiles) with the constant-memory distinct counter
  * used when even KMV's k longs per group are too many.
  *
  * Unlike `approx_count_distinct` (whose HLL++ registers depend on
  * Spark's internal xxhash seed and dense/sparse encoding, so the answer
  * is engine-private), the register construction here is pure column
  * math on an md5 split — bucket = first 8 hash bits, rho = leading-zero
  * count of the next 40 bits + 1 — so the exact register state is
  * reproducible in ANSI SQL and the estimate is bit-identical across
  * engines, partitionings, and merge orders.
  *
  * Scale shape: a `TypedImperativeAggregate` whose buffer is m bytes per
  * group TOTAL (m = 2^p registers, one byte each) with partial
  * aggregation: per-partition register max, then elementwise-max merge —
  * m bytes per group cross the shuffle regardless of cardinality. The
  * merge is a commutative idempotent semilattice (elementwise max), so
  * any partitioning, any retry, any merge order yields the same state.
  *
  * eval() returns the raw register array (length m); estimate arithmetic
  * stays OUTSIDE the aggregate (see `Sketches.hllSummary`) so that the
  * scaled harmonic sum is exact integer math that an oracle can replay.
  */
case class HllSketchAgg(
    bucket: Expression,
    rho: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  // upper bound 2^13: Sketches.hllSummary's integer harmonic sum must be
  // 64-bit-safe INCLUDING the degenerate all-zero register state (a group
  // whose inputs are all null — update() skips nulls — sums to m·2^49,
  // which hits exactly 2^63 at m = 2^14 and wraps negative, one power of
  // two below where a ≥1-non-zero state would). m ≤ 2^13 keeps even that
  // state at 2^62; enforce here so no register array that can't be
  // summarized is ever produced
  require(m >= 16 && m <= 8192 && (m & (m - 1)) == 0,
    s"register count m must be a power of two in [16, 8192], got $m")

  override def left: Expression = bucket
  override def right: Expression = rho

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (bucket.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_sketch expects a BIGINT bucket, got ${bucket.dataType.sql}")
    else if (rho.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_sketch expects a BIGINT rho, got ${rho.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val b = bucket.eval(input)
    val r = rho.eval(input)
    if (b != null && r != null) {
      val bi = b.asInstanceOf[Long].toInt
      require(bi >= 0 && bi < m, s"bucket $bi out of range [0, $m)")
      val ri = r.asInstanceOf[Long]
      require(ri >= 1 && ri <= 127, s"rho $ri out of range [1, 127]")
      if (ri > buffer(bi)) buffer(bi) = ri.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  /** Raw registers, length m (0 = never touched). */
  override def eval(buffer: Array[Byte]): Any = {
    val arr = new Array[Int](m)
    var i = 0
    while (i < m) { arr(i) = buffer(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllSketchAgg =
    copy(bucket = newLeft, rho = newRight)
}

object HllSketch {
  /** Aggregate Column: the m HLL registers for precomputed (bucket, rho)
    * columns. */
  def registers(bucket: Column, rho: Column, m: Int): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(bucket),
        ColumnBridge.expression(rho), m).toAggregateExpression())
}
