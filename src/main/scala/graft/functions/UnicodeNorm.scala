package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for dedup/tokenization at corpus scale —
  * the normalization a web crawl needs BEFORE any content hashing, since
  * "Café" arrives both precomposed (U+00E9) and decomposed (e + U+0301)
  * and the two hash differently while reading identically.
  *
  * Native Catalyst expressions with codegen (stay inside
  * WholeStageCodegen; Spark has no built-in Unicode normalizer):
  *   - [[NfcNormalize]]: canonical composition (NFC) via
  *     `java.text.Normalizer` — the same Unicode 15 algorithm DuckDB's
  *     `nfc_normalize` implements via utf8proc, so the oracle replays it.
  *   - [[StripAccents]]: NFD decomposition, drop combining marks
  *     (`\p{Mn}`), recompose — DuckDB's `strip_accents` semantics.
  */
object UnicodeNormUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is O(n) with no allocation for
    // the (overwhelmingly common) already-NFC case
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val stripped = Marks.matcher(nfd).replaceAll("")
    // recompose what remains so unrelated sequences stay canonical
    UTF8String.fromString(
      java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC))
  }
}

abstract class UnicodeNormExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = StringType
}

case class NfcNormalize(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormUtil.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormUtil.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
