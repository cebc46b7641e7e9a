package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate `bloom.mightContainLong(child)` over a
  * BROADCAST Bloom filter — the first-pass scan of Bloom-prescreened
  * decontamination ([[graft.operators.TextAnalysis.contaminationBloom]]).
  *
  * Shape notes for 100 TB:
  *  - the filter rides an explicit `Broadcast`, not the task closure, so
  *    a production-sized filter (a benchmark suite's ~10⁷ 5-grams at 1%
  *    fpp ≈ 12 MB of bits) ships to each executor ONCE, not per task;
  *  - codegen caches `bloom.value` in a per-operator mutable slot at
  *    init, so the per-row work is one Murmur3 probe on a primitive long
  *    (the child is `xxhash64(gram)`, itself codegen'd) — the corpus
  *    never allocates, serializes, or shuffles anything for the
  *    prescreen;
  *  - Bloom filters have NO false negatives, so a prescreen that feeds
  *    an exact verify preserves exact semantics bit-for-bit.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = bloom.value

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val filterVar = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloom",
      v => s"$v = (${classOf[BloomFilter].getName}) $bloomRef.value();")
    defineCodeGen(ctx, ev, c => s"$filterVar.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  /** Column API: true when the broadcast filter might contain the long. */
  def column(hash: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(hash), bloom))
}
