package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics kernels: one pass per document, no interpreted
  * higher-order functions (Spark's `aggregate`/`transform`/`filter` HOFs
  * run interpreted — the round-1 perf lesson behind MinHashUtil applies to
  * the per-row text hot loops too).
  *
  * Token discipline mirrors `tokens()` in graft.text.TextFunctions exactly
  * (ASCII-space trim, `split("\\s+", -1)`, empty text → zero tokens) so the
  * native path is value-identical to the Column-built one and to the DuckDB
  * oracles that were verified against it. */
object TextKernel {

  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def tokensOf(text: UTF8String): Array[String] = {
    val trimmed = trimSpaces(text.toString)
    if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+", -1)
  }

  /** (n_tokens, n_uniq_tokens, n_token_chars, n_subwords) in one pass.
    * Chars are code points (= Spark `length()`); subwords per token =
    * max(1, ceil(chars/4)) — the vocabulary-free BPE-ish approximation. */
  def tokenStats(text: UTF8String): InternalRow = {
    val toks = tokensOf(text)
    val uniq = new java.util.HashSet[String]()
    var chars = 0
    var subwords = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      uniq.add(t)
      val n = t.codePointCount(0, t.length)
      chars += n
      subwords += math.max(1, (n + 3) / 4)
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length, uniq.size, chars, subwords))
  }

  /** Word n-gram repetition profile in one pass: (n_ngrams, n_uniq_ngrams,
    * top_count) — the Gopher-style duplicate-n-gram quality signals
    * (Rae et al. 2021 §A1.1: "fraction of duplicate n-grams"). Exact gram
    * STRINGS in a per-row hash map (bounded by document token count), not
    * hashes, so the result matches a string-based oracle bit-for-bit. */
  def ngramRepetition(text: UTF8String, n: Int): InternalRow = {
    val toks = tokensOf(text)
    val total = toks.length - n + 1
    if (total <= 0) return new GenericInternalRow(Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](total, counts.size, top))
  }

  /** Number of token occurrences contained in `words` (duplicates count —
    * same as `size(filter(tokens, _ isin words))`). */
  def wordListHits(text: UTF8String, words: java.util.HashSet[String]): Int = {
    val toks = tokensOf(text)
    var hits = 0
    var i = 0
    while (i < toks.length) {
      if (words.contains(toks(i))) hits += 1
      i += 1
    }
    hits
  }
}

/** `token_stats(text)` → struct(n_tokens, n_uniq_tokens, n_token_chars,
  * n_subwords), all int. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires string, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq_tokens", IntegerType, nullable = false),
    StructField("n_token_chars", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    TextKernel.tokenStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.tokenStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** `ngram_repetition(text, n)` → struct(n_ngrams, n_uniq_ngrams,
  * top_count), all int — word n-gram duplication signals for quality
  * filtering. */
case class NgramRepetition(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_repetition requires string, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", IntegerType, nullable = false),
    StructField("n_uniq_ngrams", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))
  override def prettyName: String = "ngram_repetition"

  override def nullSafeEval(input: Any): Any =
    TextKernel.ngramRepetition(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.ngramRepetition($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)
}

/** `word_list_hits(text, words)` → int: token occurrences found in the
  * (plan-shipped) word list. */
case class WordListHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_list_hits requires string, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_list_hits"

  override def nullSafeEval(input: Any): Any =
    TextKernel.wordListHits(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.wordListHits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordListHits =
    copy(child = newChild)
}
