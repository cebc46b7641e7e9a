package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `nfc_normalize(string)` — Unicode NFC normalization
  * via the JDK's `java.text.Normalizer` (the canonical-composition pass
  * every text pipeline runs before hashing, dedup, or tokenization:
  * decomposed `e +  ́` and precomposed `é` must be ONE key, or exact
  * dedup and n-gram statistics silently fragment by input source).
  *
  * Codegen'd (no UDF serialization, stays inside whole-stage codegen);
  * the common all-ASCII fast path is one `Normalizer.isNormalized` scan
  * with zero allocation. Matches DuckDB's `nfc_normalize` — which is
  * what lets the q172 oracle recompute it — and Spark has no built-in
  * equivalent (SPARK-46830-adjacent collation work notwithstanding).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API. */
  def column(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
