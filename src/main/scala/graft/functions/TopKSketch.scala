package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters state: capacity-bounded counters with the
  * classic evict-min-and-inherit rule (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams").
  *
  * Two views of the same entries: a hash map for O(1) item lookup and a
  * TreeSet ordered by (count, err, item) for O(log c) min eviction — the
  * stream-summary structure flattened onto JDK collections. All ordering
  * ties break on the item bytes, so eviction and truncation are
  * deterministic for a given arrival order.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  import SpaceSavingBuffer.Entry

  val byItem = new java.util.HashMap[UTF8String, Entry]()
  val order = new java.util.TreeSet[Entry](SpaceSavingBuffer.EntryOrder)

  /** One arrival. `item` may point into reused row memory — it is cloned
    * if (and only if) this call inserts a new entry. */
  def add(item: UTF8String, by: Long, errBy: Long): Unit = {
    val e = byItem.get(item)
    if (e != null) {
      order.remove(e)
      e.count += by
      e.err += errBy
      order.add(e)
    } else if (byItem.size < capacity) {
      val owned = item.clone()
      val ne = new Entry(owned, by, errBy)
      byItem.put(owned, ne)
      order.add(ne)
    } else {
      // evict the min-count entry; the newcomer inherits its count as the
      // overcount bound (count ≤ true + err invariant)
      val m = order.pollFirst()
      byItem.remove(m.item)
      val owned = item.clone()
      val ne = new Entry(owned, m.count + by, m.count + errBy)
      byItem.put(owned, ne)
      order.add(ne)
    }
  }

  /** Drop entries beyond capacity (after a merge), smallest counts first. */
  def truncate(): Unit =
    while (byItem.size > capacity) {
      val m = order.pollFirst()
      byItem.remove(m.item)
    }
}

object SpaceSavingBuffer {
  final class Entry(val item: UTF8String, var count: Long, var err: Long)

  /** (count asc, err asc, item bytes asc) — total and deterministic. */
  val EntryOrder: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Long.compare(a.count, b.count)
      if (c != 0) return c
      val e = java.lang.Long.compare(a.err, b.err)
      if (e != 0) return e
      a.item.compareTo(b.item)
    }
  }
}

/** Heavy-hitters aggregate: `topk_sketch(item, capacity)` → array of
  * (item, count, err) structs, count descending.
  *
  * The scale story mirrors [[KmvSketchAgg]]: a mergeable bounded summary,
  * so only `capacity` counters per group cross the shuffle with map-side
  * combine — the alternative (groupBy item + count + rank) shuffles every
  * distinct item. Guarantees, for N items seen and capacity c: any item
  * with true count > N/c is present, and `count − err ≤ true ≤ count`.
  * When c ≥ distinct(items) no eviction ever fires, every err is 0, and
  * the result is EXACT and arrival-order-independent — the regime the
  * DuckDB gate pins; the approximate regime is property-tested.
  *
  * Merge sums counts pointwise then truncates to capacity (Agarwal et
  * al., "Mergeable summaries": the union bound survives merging).
  */
case class TopKSketchAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(capacity >= 1, "sketch capacity must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_sketch expects a STRING item column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String], 1L, 0L)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    val it = other.order.iterator()
    while (it.hasNext) {
      val e = it.next()
      // pointwise sum — never the evict-inherit rule, which would double
      // count across sketches; truncation below restores the bound
      val mine = buffer.byItem.get(e.item)
      if (mine != null) {
        buffer.order.remove(mine)
        mine.count += e.count
        mine.err += e.err
        buffer.order.add(mine)
      } else {
        val ne = new SpaceSavingBuffer.Entry(e.item, e.count, e.err)
        buffer.byItem.put(e.item, ne)
        buffer.order.add(ne)
      }
    }
    buffer.truncate()
    buffer
  }

  /** (item, count, err) structs, count desc / err asc / item asc.
    * Emitted via an explicit sort rather than `order.descendingIterator`:
    * descending the TreeSet would reverse the WHOLE (count, err, item)
    * comparator, so count ties came out err desc / item desc —
    * contradicting this contract (harmless to hash gates, which re-sort,
    * but callers see the array order). */
  override def eval(buffer: SpaceSavingBuffer): Any = {
    val entries = new Array[SpaceSavingBuffer.Entry](buffer.order.size)
    buffer.order.toArray(entries)
    java.util.Arrays.sort(entries, new java.util.Comparator[SpaceSavingBuffer.Entry] {
      override def compare(a: SpaceSavingBuffer.Entry, b: SpaceSavingBuffer.Entry): Int = {
        val c = java.lang.Long.compare(b.count, a.count) // count DESC
        if (c != 0) return c
        val e = java.lang.Long.compare(a.err, b.err) // err ASC
        if (e != 0) return e
        a.item.compareTo(b.item) // item ASC
      }
    })
    val out = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      val e = entries(i)
      out(i) = InternalRow(e.item, e.count, e.err)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    var bytes = 8 // capacity + n
    val sit = buffer.order.iterator()
    while (sit.hasNext) { bytes += 4 + sit.next().item.numBytes() + 16 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.capacity)
    bb.putInt(buffer.order.size)
    val it = buffer.order.iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.item.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(e.count)
      bb.putLong(e.err)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SpaceSavingBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val e = new SpaceSavingBuffer.Entry(UTF8String.fromBytes(b), bb.getLong, bb.getLong)
      buf.byItem.put(e.item, e)
      buf.order.add(e)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKSketchAgg =
    copy(child = newChild)
}

object TopKSketch {
  /** Aggregate Column: Space-Saving heavy-hitters summary of a string
    * item column — array of (item, count, err), count descending. */
  def topK(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      TopKSketchAgg(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
