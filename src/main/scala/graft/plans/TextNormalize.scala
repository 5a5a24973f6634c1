package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the canonicalization step that runs
  * before ANY hashing/dedup/tokenization on real-world text: the same
  * visible string can arrive precomposed (é = U+00E9) or decomposed
  * (e + U+0301), and every md5 fingerprint, shingle and vocabulary key
  * in this repo would treat them as different documents. Two kernels:
  *
  *   - `nfc_normalize(s)`: Unicode Normalization Form C
  *     (java.text.Normalizer — the same standard algorithm DuckDB's
  *     nfc_normalize implements, so the oracle replays it exactly).
  *   - `strip_accents(s)`: NFD decomposition, then every combining mark
  *     (categories Mn, Mc, Me — iterated at CODEPOINT level so
  *     supplementary-plane marks strip too) dropped — é→e, ü→u, ñ→n;
  *     standalone letters like ø/œ/ß are NOT marks and pass through,
  *     matching DuckDB's utf8proc-based strip_accents bit-for-bit
  *     (probed per category, not assumed).
  *
  * Both are per-row scalar kernels (no shuffle, run at the scan); the
  * fast path returns the input UTF8String UNCHANGED (zero-copy) when a
  * quick scan finds no non-ASCII byte — on a mostly-ASCII web corpus the
  * normalizer costs one memchr-style pass. */
object TextNormalizeImpl {

  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val d = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      // iterate CODE POINTS: a supplementary-plane combining mark (e.g.
      // U+1D165) is two chars whose per-char type is SURROGATE — the
      // per-char loop would keep it while DuckDB strips at codepoint level
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      // all three mark categories (Mn, Mc, Me) — probed against DuckDB's
      // utf8proc-based strip_accents, which drops every mark
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}

abstract class TextNormalizeExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  protected def kernel: String

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires a string argument")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextNormalizeImpl.$kernel($c)")
}

/** nfc_normalize(s): Unicode NFC. */
case class NfcNormalize(child: Expression) extends TextNormalizeExpression {
  override def prettyName: String = "nfc_normalize"
  override protected def kernel: String = "nfc"
  override protected def nullSafeEval(s: Any): Any =
    TextNormalizeImpl.nfc(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** strip_accents(s): NFD + drop non-spacing marks. */
case class StripAccents(child: Expression) extends TextNormalizeExpression {
  override def prettyName: String = "strip_accents"
  override protected def kernel: String = "stripAccents"
  override protected def nullSafeEval(s: Any): Any =
    TextNormalizeImpl.stripAccents(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
