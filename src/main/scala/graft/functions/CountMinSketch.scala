package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch aggregate: a d×w matrix of counters over
  * PRECOMPUTED per-row bucket positions (one bucket per hash row,
  * derived from the engine's md5 convention in plan space so the whole
  * matrix is replayable in ANSI SQL).
  *
  * The frequency-estimation member of the sketch family: Space-Saving
  * (TopKSketchAgg) answers "which items are frequent"; CMS answers "how
  * frequent is THIS item" for any item, with one-sided error
  * (est ≥ true; est ≤ true + εN with ε = e/w at confidence 1 − e^−d)
  * and NO per-item state — the d·w counter matrix is the entire sketch.
  *
  * Scale shape: a `TypedImperativeAggregate` with partial aggregation —
  * per-partition counting then elementwise-sum merge, so exactly d·w
  * longs per group cross the shuffle (map-side combined) no matter how
  * many billions of token instances stream through. The merge is
  * commutative/associative integer addition: any partitioning or merge
  * order yields the identical matrix.
  */
case class CountMinSketchAgg(
    buckets: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  override def child: Expression = buckets

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    buckets.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_sketch expects ARRAY<BIGINT> bucket positions, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = buckets.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"expected $depth bucket positions, got ${arr.numElements()}")
      var anyNull = false
      var j = 0
      while (j < depth) { if (arr.isNullAt(j)) anyNull = true; j += 1 }
      if (anyNull) return buffer // a row with null positions counts nowhere
      var i = 0
      while (i < depth) {
        val b = arr.getLong(i)
        require(b >= 0 && b < width, s"bucket $b out of range [0, $width)")
        buffer(i * width + b.toInt) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  /** Row-major d×w counter matrix, length d·w. */
  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](depth * width)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchAgg =
    copy(buckets = newChild)
}

object CountMinSketch {
  /** Aggregate Column: the row-major d×w counter matrix for precomputed
    * bucket-position arrays. */
  def matrix(buckets: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinSketchAgg(ColumnBridge.expression(buckets), depth, width)
        .toAggregateExpression())
}
