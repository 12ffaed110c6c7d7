package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash kernel (Broder '97 resemblance sketch): one pass over a
  * document computes the distinct word-k-shingle hash set and, from it, the
  * m-permutation signature. Replaces a chain of Spark higher-order
  * functions (split → transform → array_distinct → m×(transform+array_min))
  * that runs interpreted — these expressions stay inside WholeStageCodegen
  * and do only long arithmetic per shingle.
  *
  * Capability mirror of the reference's near-dup path; shingle/signature
  * layout chosen for Spark (sorted long arrays → merge-walk intersection,
  * cheap band slicing), not copied from it.
  */
object MinHashUtil {

  /** Distinct, sorted 64-bit hashes of the word k-shingles of `text`.
    * Shingle hash = XXH64 seed-chain over the per-token hashes, so no
    * shingle strings are ever materialized. */
  /** ASCII-space-only trim, matching Spark's `trim()` and DuckDB's `trim()`
    * (Java `String.trim` also strips \t/\n/\r, which would diverge from
    * the oracle on texts with leading control whitespace). */
  private[functions] def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val trimmed = trimSpaces(text.toString)
    // limit -1: Spark's split keeps trailing empty tokens (e.g. after a
    // trailing tab); Java's default split drops them and would diverge
    val toks = trimmed.split("\\s+", -1)
    val nTok = if (trimmed.isEmpty) 0 else toks.length
    val n = nTok - k + 1
    if (n <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // hash each token once
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      val u = UTF8String.fromString(toks(i))
      th(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    val sh = new Array[Long](n)
    i = 0
    while (i < n) {
      var h = th(i)
      var j = 1
      while (j < k) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      sh(i) = h
      i += 1
    }
    java.util.Arrays.sort(sh)
    // dedupe in place (sorted)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || sh(i) != sh(w - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(if (w == n) sh else java.util.Arrays.copyOf(sh, w))
  }

  /** Distinct, sorted 64-bit hashes of the character n-grams of `text`.
    * Texts shorter than n contribute their whole string as one gram
    * (mirrors `substr(text, i, n)` over `sequence(1, max(len-n+1, 1))`).
    * Characters are Unicode code points — `String.substring`'s UTF-16 code
    * units would split surrogate pairs and diverge from Spark's `substr`
    * and the DuckDB oracle on non-BMP text. */
  def charNgramHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val len = cps.length
    val count = math.max(len - n + 1, 1)
    val gh = new Array[Long](count)
    var i = 0
    while (i < count) {
      val g = new String(cps, i, math.min(n, len - i))
      val u = UTF8String.fromString(g)
      gh(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(gh)
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || gh(i) != gh(w - 1)) { gh(w) = gh(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(if (w == count) gh else java.util.Arrays.copyOf(gh, w))
  }

  /** m-slot MinHash signature from a shingle-hash set: slot s = min over
    * shingles of XXH64(h, seed=s). Empty input → all-sentinel signature
    * (callers filter empty docs before LSH banding). Null elements —
    * possible only when called from SQL over null-bearing arrays; graft's
    * own hash expressions emit containsNull=false — are skipped rather
    * than silently read as 0. */
  def signature(hashes: ArrayData, m: Int): ArrayData = {
    val sig = new Array[Long](m)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var s = 0
        while (s < m) {
          val v = XXH64.hashLong(h, s)
          if (v < sig(s)) sig(s) = v
          s += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** |a ∩ b| for two sorted long arrays (merge walk, zero allocation).
    * Null elements (SQL-provided arrays only) are skipped, not read as 0. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }
}

/** `shingle_hashes(text, k)` → sorted distinct `array<bigint>`. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `char_ngram_hashes(text, n)` → sorted distinct `array<bigint>`. */
case class CharNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.charNgramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.charNgramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** `minhash_sig(hashes, m)` → `array<bigint>` of length m. */
case class MinHashSig(child: Expression, m: Int) extends UnaryExpression {
  require(m >= 1, s"signature length must be >= 1, got $m")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.signature(input.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.signature($c, $m)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b)` → int, for sorted `array<bigint>` inputs. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint>, got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashUtil.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHashUtil.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
