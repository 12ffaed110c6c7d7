package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint kernel (Schleimer et al., SIGMOD 2003):
  * k=3-token gram hashes (first 4 md5 bytes as an unsigned int — the
  * value DuckDB computes as `CAST('0x'||substr(md5(g),1,8) AS BIGINT)`),
  * packed with position as h·10⁷ + (10⁷−1−pos) so rightmost-min-per-
  * window (w=4) is a plain integer min, then first-occurrence distinct.
  * Replaces a higher-order-function chain whose per-element lambdas run
  * interpreted; this stays inside WholeStageCodegen and does one md5 +
  * long arithmetic per gram. Bit-identical to the HOF spelling (the
  * committed expected hashes verify both).
  */
object WinnowingUtil {

  /** Selected fingerprint keys of `text` (k=3, w=4); empty when fewer
    * than w windows exist — matching DuckDB's empty generate_series. */
  def winnowingFps(text: UTF8String): ArrayData = {
    val trimmed = MinHashUtil.trimSpaces(text.toString)
    // limit -1: Spark's split keeps trailing empty tokens (same contract
    // as MinHashUtil.shingleHashes)
    val toks = trimmed.split("\\s+", -1)
    val nTok = if (trimmed.isEmpty) 0 else toks.length
    val n = nTok - 2 // gram count
    if (n < 4) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      md.reset()
      val dg = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      keys(i) = h * 10000000L + (9999999L - (i + 1)) // 1-based position
      i += 1
    }
    val wins = new Array[Long](n - 3)
    i = 3
    while (i < n) {
      var mn = keys(i - 3)
      var j = i - 2
      while (j <= i) { if (keys(j) < mn) mn = keys(j); j += 1 }
      wins(i - 3) = mn
      i += 1
    }
    // first-occurrence distinct (array_distinct / list_distinct order)
    val seen = new java.util.HashSet[java.lang.Long]()
    val ded = new Array[Long](wins.length)
    var d = 0
    i = 0
    while (i < wins.length) {
      if (seen.add(wins(i))) { ded(d) = wins(i); d += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(ded, d))
  }
}

/** `winnowing_fps(text)` → `array<bigint>` of selected packed keys. */
case class WinnowingFps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnowing_fps requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowingUtil.winnowingFps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowingUtil.winnowingFps($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingFps =
    copy(child = newChild)
}
