package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, counting, quality metrics, stopword-based language ID,
  * and fingerprinting. All pure `Column` expressions (codegen'd, no UDFs)
  * so they survive 100 TB scans inside WholeStageCodegen.
  *
  * Integer-first metric design: counts, not ratios, wherever a downstream
  * oracle compare needs bit-exactness; ratios derive as one IEEE division.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text; empty text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  def uniqTokenCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** Total characters across tokens (chars minus whitespace). */
  def tokenCharCount(c: Column): Column =
    aggregate(tokens(c), lit(0), (acc, t) => acc + length(t))

  /** Count of tokens that appear in the given word list. */
  def wordListHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(words)))

  /** A BPE-ish subword count: whitespace tokens split further at
    * letter/digit boundaries and every 4 chars — a deterministic,
    * vocabulary-free approximation of subword token counts. */
  def subwordCount(c: Column): Column =
    aggregate(tokens(c), lit(0),
      (acc, t) => acc + greatest(lit(1), ceil(length(t) / 4.0).cast("int")))

  // ---- stopword inventories (small, deterministic; extend freely) --------
  val StopwordsEn = Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with", "that")
  val StopwordsDe = Seq("der", "die", "das", "und", "nicht", "ein", "eine", "zu", "mit", "ist")
  val StopwordsFr = Seq("le", "la", "les", "et", "un", "une", "des", "du", "est", "pour")
  val StopwordsEs = Seq("el", "los", "las", "y", "un", "una", "de", "en", "es", "por")
  val StopwordsZh = Seq("的", "了", "是", "我", "不", "在", "有", "和")

  val LangWordlists: Seq[(String, Seq[String])] = Seq(
    "en" -> StopwordsEn, "de" -> StopwordsDe, "fr" -> StopwordsFr,
    "es" -> StopwordsEs, "zh" -> StopwordsZh)

  /** n-gram-free language-ID heuristic: argmax of stopword hits, ties
    * broken by wordlist order, no hits → "und" (undetermined). */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scored = LangWordlists.map { case (lang, words) =>
      (lang, size(filter(toks, t => t.isInCollection(words))))
    }
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Quality-signal struct: add the columns, filter on thresholds
    * downstream. All integer counts. */
  def qualityMetrics(c: Column): Column = struct(
    length(c).as("n_chars"),
    tokenCount(c).as("n_tokens"),
    uniqTokenCount(c).as("n_uniq_tokens"),
    tokenCharCount(c).as("n_token_chars"),
    wordListHits(c, StopwordsEn).as("n_stopwords"))

  /** Word k-shingles (token n-grams) as strings, for Jaccard/MinHash. */
  def shingles(c: Column, k: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** 64-bit SimHash fingerprint of the token array (native expression). */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Rolling-shingle document fingerprint: min/max/xxhash64 digest of word
    * 3-shingle hashes — stable under small reorderings at the ends. */
  def fingerprint(c: Column): Column =
    xxhash64(array_min(transform(shingles(c, 3), s => xxhash64(s))),
      array_max(transform(shingles(c, 3), s => xxhash64(s))),
      length(c))
}
