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

  private val EmailTag = "<EMAIL>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val NumTag = "<NUM>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  @inline private def isLocal(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_'
  @inline private def isDomain(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '.'
  @inline private def isDigit(c: Byte): Boolean = c >= '0' && c <= '9'

  /** Single-pass PII mask (r18, the q_text_mask kernel): the EXACT
    * composition of
    *   regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>')
    * then regexp_replace(·, '[0-9]+', '<NUM>')
    * in one byte scan with zero regex machinery. Why one scan is
    * faithful to two leftmost-greedy regex passes:
    *  - an email match can only start at the START of a maximal
    *    local-class run (any later start inside the run is dominated
    *    by the leftmost one, and `[...]+@` cannot backtrack into a
    *    match — every shorter prefix of the run is followed by a
    *    class byte, not '@'), and it consumes the maximal domain run;
    *  - digits are local-class bytes, so every digit run the SECOND
    *    pass sees lies inside a local run the first pass did NOT
    *    consume — a digit adjacent to an email match is impossible
    *    (it would extend the local or domain run), and the tags
    *    themselves contain no digits, so the passes cannot interact.
    * ASCII classes mean multi-byte UTF-8 sequences (bytes ≥ 0x80,
    * signed-negative here) fall through untouched, exactly as they
    * do under the ASCII regex. Returns the input object unchanged
    * when nothing masked — the common-path zero-allocation discipline
    * of [[nfc]].
    */
  def maskPii(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    var out: java.io.ByteArrayOutputStream = null
    def sink(): java.io.ByteArrayOutputStream = {
      if (out == null) out = new java.io.ByteArrayOutputStream(n + 16)
      out
    }
    var i = 0
    var emitted = 0 // bytes of b already flushed to out (lazy flush)
    def flushTo(p: Int): Unit = {
      if (out != null && p > emitted) out.write(b, emitted, p - emitted)
      if (p > emitted) emitted = p
    }
    while (i < n) {
      if (isLocal(b(i))) {
        var j = i
        while (j < n && isLocal(b(j))) j += 1
        if (j < n && b(j) == '@' && j + 1 < n && isDomain(b(j + 1))) {
          var k = j + 1
          while (k < n && isDomain(b(k))) k += 1
          if (out == null) { sink(); out.write(b, 0, i); emitted = k }
          else { flushTo(i); emitted = k }
          out.write(EmailTag)
          i = k
        } else {
          // not an email: mask maximal digit runs inside the run
          var p = i
          while (p < j) {
            if (isDigit(b(p))) {
              var q = p
              while (q < j && isDigit(b(q))) q += 1
              if (out == null) { sink(); out.write(b, 0, p); emitted = q }
              else { flushTo(p); emitted = q }
              out.write(NumTag)
              p = q
            } else p += 1
          }
          i = j
        }
      } else i += 1
    }
    if (out == null) s
    else { flushTo(n); UTF8String.fromBytes(out.toByteArray) }
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

/** `mask_pii(string) → string` — the q_text_mask normalization as one
  * codegen'd single-pass kernel (see [[TextKernels.maskPii]] for the
  * exactness argument). The chained regexp_replace form walks every
  * string twice through java.util.regex with per-row Matcher state;
  * this is the same output at one branchy byte scan, the int8-kernel
  * treatment applied to the masking hot path. FunctionsSpec gates
  * byte-exact parity against the two-regex composition on adversarial
  * and random inputs; the declared query's DuckDB oracle stays the
  * regex form.
  */
case class MaskPii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "mask_pii"

  override def nullSafeEval(s: Any): Any =
    TextKernels.maskPii(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.maskPii($c)")

  override protected def withNewChildInternal(newChild: Expression): MaskPii =
    copy(child = newChild)
}
