package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization: `nfc_normalize(string) -> string`
  * (canonical composition — `e` + U+0301 becomes `é`), the first step
  * of LLM text cleaning: dedup digests, shingles, and token counts all
  * change when the same text arrives in NFD from one source and NFC
  * from another.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation ladder): Spark
  * has no normalization built-in, and a Scala UDF on the ingest path
  * breaks whole-stage codegen for every downstream text operator.
  * This node stays inside codegen, and its eval fast-paths the common
  * case — `Normalizer.isNormalized` is a scan-only check, so
  * already-NFC text (all ASCII, in particular) passes through with
  * ZERO allocation or copying; only actually-denormalized strings pay
  * for the compose.
  *
  * Null in, null out. Semantics match DuckDB's `nfc_normalize` (both
  * implement Unicode canonical composition).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  // Registration ([[GraftExtensions]]) casts the child to string.
  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Called from generated code. ASCII/already-NFC input returns the
    * SAME UTF8String (no allocation); otherwise composes via the JDK
    * normalizer (ICU-equivalent for NFC). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
