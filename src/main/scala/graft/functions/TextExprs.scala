package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization kernels invoked from whole-stage-generated
  * code. Normalization is the standard first step of text curation
  * (composed vs decomposed forms of the same glyph otherwise defeat
  * exact dedup, token counting, and fingerprinting); the JDK's
  * java.text.Normalizer is the reference implementation of UAX #15.
  * The isNormalized quick-check short-circuits the common case — an
  * already-normal (e.g. pure-ASCII) corpus pays one scan per string,
  * no allocation.
  */
object TextKernels {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }

  def nfkc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFKC))
  }
}

/** `nfc_normalize(string) → string` — canonical composition (UAX #15
  * NFC), matching DuckDB's nfc_normalize (which is what lets the
  * declared query carry a full hash-match oracle).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    TextKernels.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `nfkc_normalize(string) → string` — compatibility composition
  * (ligatures, width/super/subscript variants fold to their plain
  * forms). No DuckDB analogue, so its gates are spec-side
  * (FunctionsSpec) rather than oracled.
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(s: Any): Any =
    TextKernels.nfkc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfkc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}
