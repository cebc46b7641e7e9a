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
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  UnicodeNormalize.formOf(form) // validate at construction, not per row

  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[functions] def formOf(form: String): java.text.Normalizer.Form =
    form match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unknown Unicode normalization form '$other' (NFC/NFD/NFKC/NFKD)")
    }

  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = formOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column API for an arbitrary form. */
  def column(text: Column, form: String): Column =
    ColumnBridge.column(
      UnicodeNormalize(ColumnBridge.expression(text), form))
}

/** NFC convenience wrapper — the form DuckDB's `nfc_normalize` mirrors,
  * which is what the q172 oracle gates. NFKC (compatibility composition,
  * the form most LLM preprocessing uses: ligature ﬁ → fi, fullwidth →
  * ASCII) is spec-covered via [[UnicodeNormalize]]. */
object NfcNormalize {
  def column(text: Column): Column = UnicodeNormalize.column(text, "NFC")
}
