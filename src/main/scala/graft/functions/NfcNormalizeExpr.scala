package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the text-hygiene
  * stage every tokenizer pipeline runs before anything hashes or
  * shingles a string: canonically-equivalent byte sequences (composed
  * `é` vs `e` + U+0301) otherwise land in different dedup buckets, count
  * as different vocab entries, and split tf-idf mass. NFC (canonical
  * composition, Unicode TR#15) is the portable choice: both the JVM
  * (`java.text.Normalizer`) and the oracle engine (`nfc_normalize`)
  * implement the same published algorithm, so normalized output is
  * byte-identical across engines and the stage stays hash-checked.
  *
  * Stateless per-row scalar, wrapped as a codegen'd `UnaryExpression`
  * (one static call in generated code — no UDF boxing/closure): a corpus
  * scan streams through it at parquet speed.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(t: Any): Any =
    NfcNormalizeExpr.normalize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeExpr.normalize($c)")

  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** The raw kernel — shared by interpreted eval and generated code.
    * Already-normalized input (the overwhelmingly common case) is
    * detected by `Normalizer.isNormalized` and returned as-is, skipping
    * the re-encode.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    GraftColumnBridge.column(
      NfcNormalizeExpr(GraftColumnBridge.expression(c)))
}
