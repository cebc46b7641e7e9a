package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing selection (Schleimer/Wilkerson/Aiken SIGMOD'03
  * "Winnowing: local algorithms for document fingerprinting"): from a
  * document's normalized text, return the `spanLen`-char spans its
  * sliding hash windows SELECT — each `w`-window's minimum hash,
  * rightmost on ties; a document with fewer than `w` hashes is one
  * window; shorter than `spanLen`, no spans at all (empty array).
  *
  * One codegen'd expression replaces what was a four-projection Catalyst
  * HOF pipeline (span array → md5 array → per-window slice/array_min/
  * reverse/array_position argmin → element_at) that made the winnowed-
  * span gate the most expensive line on the board: higher-order-function
  * lambdas evaluate INTERPRETED, so every window paid O(w) interpreted
  * steps and two array allocations, O(n·w) per document. Here the whole
  * document is one JVM pass: code-point boundaries scanned once, one
  * MD5 per window position (exactly Spark's `md5` on the span's UTF-8
  * bytes, first 48 hex-bits as the hash — bit-compatible with the
  * DuckDB oracle mirror), and a monotonic-deque sliding minimum, O(n)
  * amortized. Only the ~2/(w+1) SELECTED spans are materialized.
  */
case class WinnowSelectSpans(child: Expression, spanLen: Int, w: Int)
    extends UnaryExpression {
  require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
  require(w >= 2, s"winnow window w must be >= 2, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_select_spans"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.spans(input.asInstanceOf[UTF8String], spanLen, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowSelect.spans($c, $spanLen, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelectSpans {
  /** Column API over a normalized-text column. */
  def column(norm: Column, spanLen: Int, w: Int): Column =
    ColumnBridge.column(
      WinnowSelectSpans(ColumnBridge.expression(norm), spanLen, w))
}

/** Plain object (no companion class) so Scala emits a STATIC forwarder —
  * generated code can call `graft.functions.WinnowSelect.spans(...)` as
  * ordinary Java. */
object WinnowSelect {

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Monotonic-deque sliding minimum over `hashes`, rightmost ties;
    * window min(w, n); returns selected indices, 0-based, distinct
    * ascending (rightmost-tie argmins are non-decreasing as the window
    * slides, so consecutive-dedup is full dedup). */
  def positions(hashes: Array[Long], w: Int): Array[Int] = {
    val m = hashes.length
    if (m == 0) return Array.emptyIntArray
    val ww = if (m < w) m else w
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    val out = new Array[Int](m - ww + 1)
    var outN = 0
    var i = 0
    while (i < m) {
      val v = hashes(i)
      // >= : an equal newcomer evicts older indices → rightmost tie wins
      while (tail > head && hashes(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (i >= ww - 1) {
        while (deque(head) <= i - ww) head += 1
        val sel = deque(head)
        if (outN == 0 || out(outN - 1) != sel) { out(outN) = sel; outN += 1 }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, outN)
  }

  /** Hash every spanLen-window (Spark-md5-compatible, first 48 bits),
    * winnow-select, emit the selected spans. Char positions are CODE
    * POINTS (matching `substr`/the DuckDB oracle), resolved by one
    * boundary scan over the UTF-8 bytes. */
  def spans(norm: UTF8String, spanLen: Int, w: Int): ArrayData = {
    val bytes = norm.getBytes
    // byte offset of each code-point start, plus end sentinel
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    val m = nChars - spanLen + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = bytes.length
    val digest = md5.get()
    val hashes = new Array[Long](m)
    i = 0
    while (i < m) {
      digest.reset()
      digest.update(bytes, starts(i), starts(i + spanLen) - starts(i))
      val d = digest.digest()
      // conv(substring(md5(s), 1, 12), 16, 10): first 6 digest bytes,
      // big-endian, as an unsigned 48-bit value
      hashes(i) =
        ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    val sel = positions(hashes, w)
    val out = new Array[Any](sel.length)
    i = 0
    while (i < sel.length) {
      val s = sel(i)
      out(i) = UTF8String.fromBytes(bytes, starts(s),
        starts(s + spanLen) - starts(s))
      i += 1
    }
    new GenericArrayData(out)
  }
}
