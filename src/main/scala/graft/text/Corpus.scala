package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.{NgramRepetition, ShingleHashes}

/** Corpus-curation operators — the selection/assignment layer of a
  * training-data pipeline, downstream of the text metrics and dedup in
  * [[TextFunctions]] / graft.dedup:
  *
  *  - [[repetitionStats]] — Gopher-style duplicate-n-gram quality signals
  *    (Rae et al. 2021, "Scaling Language Models", §A1.1): documents whose
  *    content is dominated by a few repeated n-grams are boilerplate/spam.
  *  - [[scrubPii]] — PII redaction (emails, NANP phone numbers) with
  *    per-document redaction counts.
  *  - [[splitAssign]] — deterministic train/val/test assignment from a
  *    hash of the document id: reproducible across runs/engines, no RNG
  *    state, stable under corpus growth (a document's split never changes
  *    when other documents are added — the property shuffle-based splits
  *    lack).
  *  - [[sampleByHash]] / [[mixSources]] — per-source weighted sampling for
  *    dataset mixing (e.g. upweight curated sources, downsample crawl),
  *    same deterministic-hash mechanism.
  *  - [[decontaminate]] — benchmark decontamination: flag corpus documents
  *    sharing any word n-gram with a held-out evaluation set (the
  *    GPT-3/PaLM 13-gram-overlap protocol, here with configurable n).
  *  - [[removeBoilerplate]] — corpus-frequency line removal (the CCNet /
  *    RefinedWeb "drop lines shared by many pages" cleanup): any line
  *    appearing in ≥ minDocs distinct documents is cut from every
  *    document, preserving the order of the surviving lines.
  *
  * Scale design: everything except decontaminate is a pure per-row Column
  * expression (no shuffle, survives WholeStageCodegen); decontaminate
  * streams the corpus once against a broadcast of the (small) benchmark
  * gram set and shuffles only (id, count) pairs.
  */
object Corpus {

  /** struct(n_ngrams, n_uniq_ngrams, top_count) of word n-grams — one
    * native pass per document (no interpreted HOFs; perf playbook). The
    * duplicate-n-gram fraction is `1 - n_uniq_ngrams/n_ngrams`; the
    * top-gram fraction is `top_count/n_ngrams`. */
  def repetitionStats(c: Column, n: Int): Column =
    GraftBridge.column(NgramRepetition(GraftBridge.expression(c), n))

  /** Email / NANP-phone patterns — deliberately in the RE2-compatible
    * subset (no backreferences, no lookaround) so the same pattern string
    * runs identically in Java regex (Spark) and RE2 (DuckDB oracle). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** struct(clean, n_emails, n_phones): text with emails/phones replaced
    * by placeholder tags, plus match counts (counted on the ORIGINAL text,
    * so the two counts are independent of replacement order). Builtin
    * regexp functions only — codegen'd, scan-speed. */
  def scrubPii(c: Column): Column = struct(
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
      .as("clean"),
    size(regexp_extract_all(c, lit(EmailRe), lit(0))).as("n_emails"),
    size(regexp_extract_all(c, lit(PhoneRe), lit(0))).as("n_phones"))

  /** 256-way deterministic bucket of an id: the first two hex chars of
    * md5(id as string). Kept as a STRING ("00".."ff") so engines compare
    * it identically (bytewise); boundaries are two-hex-char literals. */
  private def bucket(id: Column, salt: String): Column =
    substring(md5(concat(id.cast("string"), lit(salt))), 1, 2)

  /** Bucket count below `frac` (0..256). A bound of 256 means "every
    * bucket" and MUST short-circuit to true — the 3-char hex "100" would
    * compare lexicographically BELOW "ff". */
  private[graft] def boundOf(frac: Double): Int =
    math.max(0, math.min(256, math.round(frac * 256).toInt))

  private[graft] def hexBound(frac: Double): String = {
    val b = boundOf(frac)
    require(b >= 1 && b <= 255, s"hex bound needs 1..255 buckets, got $b")
    f"$b%02x"
  }

  /** Deterministic keep/drop decision at `rate` (hash-gated Bernoulli):
    * keeps round(rate·256)/256 of ids, exactly reproducible. `salt`
    * decorrelates independent sampling decisions on the same ids. */
  def sampleByHash(id: Column, rate: Double, salt: String = ""): Column = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val b = boundOf(rate)
    if (b >= 256) lit(true)
    else if (b <= 0) lit(false)
    else bucket(id, salt) < lit(hexBound(rate))
  }

  /** Assign each id to one of the labeled fractions (e.g. train/val/test
    * 0.8/0.1/0.1). Fractions must sum to 1; granularity is 1/256 (finer
    * splits: widen `bucket` to more hex chars). */
  def splitAssign(id: Column, splits: Seq[(String, Double)], salt: String = ""): Column = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val b = bucket(id, salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val cases = splits.map(_._1).zip(cum).dropRight(1)
    cases.headOption match {
      case None => lit(splits.last._1)
      case Some((l0, f0)) =>
        val first = when(b < lit(hexBound(f0)), lit(l0))
        cases.tail.foldLeft(first) { case (w, (l, f)) =>
          w.when(b < lit(hexBound(f)), lit(l))
        }.otherwise(lit(splits.last._1))
    }
  }

  /** The cumulative hex boundaries [[splitAssign]] uses — exposed so an
    * oracle can be generated from the SAME arithmetic. */
  private[graft] def splitBounds(splits: Seq[(String, Double)]): Seq[(String, String)] = {
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // drop the final cumulative 1.0 BEFORE hex-formatting (bound 256 has
    // no 2-char hex form; the last label is the CASE's ELSE arm)
    splits.map(_._1).zip(cum).dropRight(1)
      .map { case (l, f) => (l, hexBound(f)) }
  }

  /** Weighted dataset mixing: keep each row with its source's rate (1.0 =
    * keep all; unknown sources are dropped — list every source you want).
    * Pure map-side filter: no shuffle, each executor decides locally. */
  def mixSources(df: DataFrame, sourceCol: String, idCol: String,
      rates: Seq[(String, Double)], salt: String = "mix"): DataFrame = {
    val keep = rates.foldLeft(lit(false)) { case (acc, (src, rate)) =>
      when(col(sourceCol) === src, sampleByHash(col(idCol), rate, salt))
        .otherwise(acc)
    }
    df.filter(keep)
  }

  /** Benchmark decontamination: per corpus document, the number of
    * distinct word n-grams shared with ANY benchmark document, plus the
    * contamination flag. The benchmark gram set (distinct hashes) is
    * broadcast — evaluation sets are tiny next to a 100 TB corpus — so
    * the corpus scans once with a map-side hash-join; only (id, count)
    * pairs shuffle for the final per-document aggregate. Gram hashing is
    * the native single-pass kernel (64-bit; collisions vanishingly rare
    * and deterministic). */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(GraftBridge.column(
        ShingleHashes(GraftBridge.expression(col(textCol)), n))).as("_g_gram"))
    val benchGrams = broadcast(grams(bench).select("_g_gram").distinct())
    // ShingleHashes arrays are already distinct per document, so count(*)
    // after the join counts distinct shared grams
    val hits = grams(docs).join(benchGrams, "_g_gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_shared").isNotNull.as("contaminated"))
  }

  /** Corpus-frequency boilerplate removal: drop every line (newline-
    * separated) that appears in ≥ `minDocs` DISTINCT documents, rejoin the
    * survivors in original order. Output: (idCol, clean, n_removed).
    *
    * Scale shape: line frequencies aggregate on 64-bit xxhash64 keys —
    * never the line text — with map-side partial counts; the frequent set
    * is bounded by totalLines/minDocs entries, so it broadcasts back and
    * the membership test is map-side. The only document-keyed shuffle is
    * the final reassembly. 64-bit hash collisions can in principle conflate
    * two distinct lines (same accepted license as [[decontaminate]]'s
    * hashed grams). */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("_pos", "_line")))
      .withColumn("_h", xxhash64(col("_line")))
    val frequent = lines.groupBy("_h")
      .agg(countDistinct(col(idCol)).as("_n"))
      .filter(col("_n") >= minDocs)
      .select(col("_h"), lit(true).as("_boiler"))
    lines.join(broadcast(frequent), Seq("_h"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(col("_boiler").isNull, struct(col("_pos"), col("_line"))))),
          x => x("_line")), "\n").as("clean"),
        count(col("_boiler")).as("n_removed"))
  }

  /** Temperature-based mixture reweighting — the α-smoothed source
    * sampling recipe from multilingual/LM pretraining (XLM-R §3.1, PaLM
    * table 2): target share w_s ∝ n_s^α with α < 1 upweighting small
    * sources relative to their natural frequency. One row per source:
    * (source, n_docs, weight, target_docs) with `weight` the normalized
    * mixture share and `target_docs = round(weight · totalDocs)`.
    *
    * Exactness: the default α = 0.5 routes through `sqrt` (IEEE
    * correctly-rounded, engine-portable — `pow` is not); the raw weight
    * is then fixed-pointed (×10⁹ bigint) so the normalizing sum is exact
    * integer arithmetic, and the final share/target are single identical
    * IEEE ops on identical operands → bit-reproducible cross-engine.
    * Scale: one count-by-source aggregate; the unpartitioned window runs
    * over the source-level frame (rows = #sources, not #docs). */
  /** Exactly-n-per-group deterministic sample (hash-ordered "reservoir"):
    * within each group, rows rank by md5(id·salt) with an id tie-break and
    * the first n survive. Unlike rate-based [[sampleByHash]] this pins the
    * EXACT group quota (per-class eval sets, balanced fine-tuning mixes),
    * at the cost of one shuffle on the group key; the ranking is stable
    * under corpus growth only within a group's existing members (a new row
    * can displace the boundary rank — inherent to exact quotas). For
    * heavy-hitter groups at scale, the bounded partial-agg alternative is
    * `functions.TopKByScore` (≤n rows leave each partition pre-shuffle) —
    * same pattern as `q_topk_per_group`. */
  def sampleExactPerGroup(df: DataFrame, groupCol: String, idCol: String,
      n: Int, salt: String = "sample"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"sample size must be >= 1, got $n")
    df.withColumn("_h", md5(concat(col(idCol).cast("string"), lit(salt))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("_h"), col(idCol))))
      .filter(col("rn") <= n)
      .drop("_h")
  }

  def temperatureMix(docs: DataFrame, srcCol: String, alpha: Double = 0.5,
      massCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // mass = what the temperature smooths over: document count by default,
    // or a size column (chars/tokens/bytes) — the recipe's usual basis
    val mass = massCol.map(c => sum(col(c)).cast("long"))
      .getOrElse(count(lit(1))).as("mass")
    val counts = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), mass)
    val wRaw =
      if (alpha == 0.5) sqrt(col("mass").cast("double"))
      else pow(col("mass").cast("double"), lit(alpha))
    val everything = Window.partitionBy()
    counts
      .withColumn("w_fp", floor(wRaw * 1000000000d + 0.5d).cast("long"))
      .withColumn("weight", col("w_fp").cast("double") /
        sum(col("w_fp")).over(everything).cast("double"))
      .withColumn("target_docs", floor(col("weight") *
        sum(col("n_docs")).over(everything).cast("double") + 0.5d).cast("long"))
      .select("source", "n_docs", "mass", "weight", "target_docs")
  }
}
