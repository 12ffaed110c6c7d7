package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Corpus

/** Semantics tests for the corpus-curation operators (repetition stats,
  * PII scrubbing, deterministic split/mix, decontamination). */
class CorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("repetitionStats counts total/unique/top bigrams") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b a b a b"),      // bigrams: ab ba ab ba ab -> 5 total, 2 uniq, top 3
      (1L, "x y z"),            // xy yz -> 2 total, 2 uniq, top 1
      (2L, "solo"),             // no bigrams
      (3L, "")                  // no tokens
    ).toDF("id", "text")
    val got = df.select(col("id"), Corpus.repetitionStats(col("text"), 2).as("r"))
      .select(col("id"), col("r.n_ngrams"), col("r.n_uniq_ngrams"), col("r.top_count"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(0L) == ((5, 2, 3)))
    assert(got(1L) == ((2, 2, 1)))
    assert(got(2L) == ((0, 0, 0)))
    assert(got(3L) == ((0, 0, 0)))
  }

  test("scrubPii redacts emails and phones, counts on original text") {
    import spark.implicits._
    val df = Seq(
      (0L, "mail me at a.b+c@example.org or x@y.io, call 555-123-4567"),
      (1L, "no pii here"),
      (2L, "bad phone 55-123-4567 and not-an@email")
    ).toDF("id", "text")
    val got = df.select(col("id"), Corpus.scrubPii(col("text")).as("p"))
      .select(col("id"), col("p.clean"), col("p.n_emails"), col("p.n_phones"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(0L)._1 == "mail me at <EMAIL> or <EMAIL>, call <PHONE>")
    assert(got(0L)._2 == 2 && got(0L)._3 == 1)
    assert(got(1L) == (("no pii here", 0, 0)))
    assert(got(2L)._2 == 0 && got(2L)._3 == 0)
  }

  test("splitAssign is deterministic, total, and near the requested fractions") {
    import spark.implicits._
    val n = 10000
    val ids = spark.range(n).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = ids.select(Corpus.splitAssign(col("id"), splits).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.values.sum == n)                       // total: every id assigned
    assert(math.abs(a("train") - 0.8 * n) < 0.03 * n)
    assert(math.abs(a("val") - 0.1 * n) < 0.03 * n)
    assert(math.abs(a("test") - 0.1 * n) < 0.03 * n)
    // determinism: second evaluation identical
    val b = ids.select(Corpus.splitAssign(col("id"), splits).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("splitAssign is stable under corpus growth") {
    import spark.implicits._
    val splits = Seq("train" -> 0.75, "test" -> 0.25)
    def assign(hi: Long) = spark.range(hi).toDF("id")
      .select(col("id"), Corpus.splitAssign(col("id"), splits).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = assign(100)
    val grown = assign(1000)
    assert(small.forall { case (id, s) => grown(id) == s })
  }

  test("sampleByHash keeps a fixed subset; salts decorrelate") {
    import spark.implicits._
    val ids = spark.range(4000).toDF("id")
    val kept = ids.filter(Corpus.sampleByHash(col("id"), 0.25, "a"))
    val n = kept.count()
    assert(math.abs(n - 1000) < 150)
    // subset property: sampling at a higher rate contains the lower-rate set
    val keptHalf = ids.filter(Corpus.sampleByHash(col("id"), 0.5, "a"))
    assert(kept.except(keptHalf).count() == 0)
    // a different salt yields a different (but same-sized ballpark) set
    val keptB = ids.filter(Corpus.sampleByHash(col("id"), 0.25, "b"))
    assert(kept.intersect(keptB).count() < n)
  }

  test("mixSources applies per-source rates and drops unlisted sources") {
    import spark.implicits._
    val df = (0 until 3000).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "source")
    val got = Corpus.mixSources(df, "source", "id",
      Seq("src0" -> 1.0, "src1" -> 0.25))
    val by = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("src0") == 1000)                       // rate 1.0: all kept
    assert(math.abs(by.getOrElse("src1", 0L) - 250) < 100)
    assert(!by.contains("src2"))                     // unlisted: dropped
  }

  test("nearDupDelta pairs delta docs with corpus near-dups only") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "completely different content about spark query engines and formats"),
      (2L, "another unrelated corpus document with its own words entirely")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 0
      (101L, "fresh novel text that matches nothing in the standing corpus set"),
      (102L, "fresh novel text that matches nothing in the standing corpus set")  // dup of 101 — must NOT pair
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.nearDupDelta(delta, corpus, "doc_id", "text",
        threshold = 0.7, k = 3, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((100L, 0L)), s"got ${got.toSet}")
  }

  test("decontaminate flags exactly the documents sharing an n-gram with the bench set") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),    // bench member
      (1L, "one two alpha beta gamma delta epsilon seven"), // shares the 5-gram
      (2L, "alpha beta gamma X delta epsilon zeta"),  // breaks every shared 5-gram
      (3L, "totally unrelated words in this document here")
    ).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 0)
    val got = Corpus.decontaminate(docs, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(0L)._2, "bench member shares its own grams")
    assert(got(1L) == ((1L, true)), "one shared 5-gram")
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false)))
  }
}
