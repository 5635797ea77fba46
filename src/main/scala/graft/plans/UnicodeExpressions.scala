package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native expression.
  *
  * Spark has no builtin NFC normalizer (DuckDB ships `nfc_normalize`;
  * Spark's closest surface is a UDF over java.text.Normalizer, which
  * would break whole-stage codegen in the mojibake-gate hot path the
  * same way the hash HOFs did — see HashExpressions). NFC output is
  * fully determined by the Unicode standard, so the JDK normalizer and
  * DuckDB's utf8proc agree and the DuckDB oracle can certify this
  * expression bit-for-bit.
  */
object UnicodeUtil {
  /** NFC-normalize; the common already-normalized case (all-ASCII and
    * most real text) is detected without allocating. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)` — Unicode NFC canonical composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any =
    UnicodeUtil.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.UnicodeUtil.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}
