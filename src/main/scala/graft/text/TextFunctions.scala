package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.{ShingleHashes, SimHash64, TokenStats, WordListHits}

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, counting, quality metrics, stopword-based language ID,
  * and fingerprinting. All pure `Column` expressions so they survive
  * 100 TB scans inside WholeStageCodegen; the per-token hot loops (char/
  * subword/stopword counting) run as native Catalyst expressions — Spark's
  * `aggregate`/`filter` HOFs execute interpreted and were 10-50× slower
  * in the minhash case (round-1 perf playbook).
  *
  * Integer-first metric design: counts, not ratios, wherever a downstream
  * oracle compare needs bit-exactness; ratios derive as one IEEE division.
  */
object TextFunctions {

  /** struct(n_tokens, n_uniq_tokens, n_token_chars, n_subwords) — one
    * native pass; identical duplicate stats collapse via subexpression
    * elimination when several fields of the same text are selected. */
  def tokenStats(c: Column): Column =
    GraftBridge.column(TokenStats(GraftBridge.expression(c)))

  /** Whitespace tokenization of trimmed text; empty text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  def uniqTokenCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** Total characters across tokens (chars minus whitespace). */
  def tokenCharCount(c: Column): Column = tokenStats(c)("n_token_chars")

  /** Inverted index: token → sorted posting list of document ids, plus
    * document frequency — the standard build for retrieval-style
    * decontamination lookups and corpus search. With a finite `maxDf`,
    * Zipf-head stop tokens are pruned BEFORE any posting list
    * materializes: a first counts-only aggregation finds the under-cap
    * tokens (agg buffers hold one long per token, never a list), and only
    * their occurrences reach the `collect_set`. Without the pre-pass a
    * stop token's posting list accumulates the whole corpus in a single
    * reducer buffer — the 100 TB OOM. The head of the Zipf curve is
    * exactly the part retrieval never needs, so cap it.
    * Output: (tok, doc_freq, postings sorted array). */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val occ = df.select(col(idCol).as("_doc"),
      explode(tokens(col(textCol))).as("tok"))
    val kept =
      if (maxDf == Long.MaxValue) occ
      else occ.join(
        occ.groupBy("tok").agg(countDistinct(col("_doc")).as("_df"))
          .filter(col("_df") <= maxDf).select("tok"),
        Seq("tok"), "left_semi")
    kept.groupBy("tok")
      .agg(countDistinct(col("_doc")).as("doc_freq"),
        sort_array(collect_set(col("_doc"))).as("postings"))
  }

  /** struct(n_deflate, roundtrip_ok): DEFLATE-compressed size of the
    * UTF-8 text at a fixed level (deterministic — no dictionary, no
    * timestamps) plus an inflate-back equality check. The compression
    * ratio n_deflate / n_bytes is the classic cheap entropy proxy for
    * document quality: boilerplate and template spam compress far better
    * than natural prose (used e.g. as a CCNet/RefinedWeb-style filter
    * signal). Pure per-row map — no shuffle, scan-speed at 100 TB; zlib
    * runs native under the JDK Deflater. NULL text → NULL struct, like
    * the module's other text metrics. */
  def deflateStats(c: Column): Column = {
    val f = udf { s: String =>
      if (s == null) None else Some(deflateOnce(s))
    }
    f(c).cast("struct<n_deflate: bigint, roundtrip_ok: boolean>")
  }

  private def deflateOnce(s: String): (Long, Boolean) = {
      val in = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, false)
      d.setInput(in); d.finish()
      val buf = new Array[Byte](math.max(64, in.length + (in.length >> 1) + 64))
      var n = 0
      while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
      d.end()
      val inf = new java.util.zip.Inflater(false)
      inf.setInput(buf, 0, n)
      val back = new Array[Byte](in.length + 1)
      var m = 0
      while (!inf.finished() && m <= in.length)
        m += inf.inflate(back, m, back.length - m)
      inf.end()
      (n.toLong, m == in.length && java.util.Arrays.equals(
        java.util.Arrays.copyOf(back, m), in))
  }

  /** Count of tokens that appear in the given word list (native kernel;
    * the word list ships with the plan). */
  def wordListHits(c: Column, words: Seq[String]): Column =
    GraftBridge.column(WordListHits(GraftBridge.expression(c), words))

  /** A BPE-ish subword count: whitespace tokens split further every 4
    * chars — a deterministic, vocabulary-free approximation of subword
    * token counts. */
  def subwordCount(c: Column): Column = tokenStats(c)("n_subwords")

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
    val scored = LangWordlists.map { case (lang, words) =>
      (lang, wordListHits(c, words))
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

  /** Overlapping character chunks for long-document splitting (context-
    * window prep): chunk i covers [i·(size−overlap), …+size). Pure
    * codegen'd builtins (sequence/substring via posexplode downstream) —
    * call as `df.select(col("id"), posexplode(chunkText(col("text"), …)))`.
    * Chunk count = ceil(max(len−overlap,1) / (size−overlap)); empty text
    * yields one empty chunk (callers filter if unwanted). */
  def chunkText(c: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val nChunks = greatest(ceil((length(c) - overlap) / lit(step.toDouble)), lit(1))
      .cast("int")
    transform(sequence(lit(0), nChunks - 1),
      i => substring(c, i * step + 1, lit(size)))
  }

  /** 64-bit SimHash fingerprint of the token array (native expression). */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Rolling-shingle document fingerprint: xxhash64 digest of the min and
    * max word-3-shingle hashes plus the length — stable under small
    * reorderings at the ends. The shingle hashes come from the native
    * single-pass kernel (no string shingles materialized, no HOFs);
    * array_min/array_max/xxhash64 are codegen'd builtins. */
  def fingerprint(c: Column): Column = {
    def sh = GraftBridge.column(ShingleHashes(GraftBridge.expression(c), 3))
    xxhash64(array_min(sh), array_max(sh), length(c))
  }
}
