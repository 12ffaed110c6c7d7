package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.{Corpus, Retrieval}

/** Semantics tests for the retrieval / span-dedup / mixture-weight tier on
  * crafted fixtures where the expected answers are hand-checkable. */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("bm25TopK: rare-term hits outrank common-term hits; k + tie-break hold") {
    import spark.implicits._
    // 'rare' appears in 1 of 6 docs, 'common' in 5 of 6 — equal length
    // docs so the dl normalization is flat and idf decides the order
    val docs = Seq(
      (0L, "common alpha beta gamma"),
      (1L, "rare alpha beta gamma"),
      (2L, "common beta gamma delta"),
      (3L, "common gamma delta epsilon"),
      (4L, "common delta epsilon zeta"),
      (5L, "common epsilon zeta eta")
    ).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), k = 3).collect()
    assert(top.length === 3)
    // the single 'rare' doc carries idf (6-1+0.5)/(1+0.5)=3.67 vs the
    // 'common' idf (6-5+0.5)/(5+0.5)=0.27 — rare wins by an order
    assert(top.head.getLong(0) === 1L)
    assert(top.head.getDouble(1) > top(1).getDouble(1) * 5)
    // remaining docs all score identically on 'common' → doc_id tie-break
    assert(top.map(_.getLong(0)).toSeq === Seq(1L, 0L, 2L))
  }

  test("bm25TopK: higher tf wins within a term; n_terms counts hits") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x x x pad pad pad pad pad"),
      (1L, "x pad pad pad pad pad pad pad"),
      (2L, "x y pad pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x", "y"), k = 4)
      .collect()
    val byId = top.map(r => r.getLong(0) -> r).toMap
    assert(!byId.contains(3L))           // no query term → no row
    assert(byId(0L).getDouble(1) > byId(1L).getDouble(1)) // tf 3 > tf 1
    assert(byId(2L).getLong(2) === 2L)   // hit both terms
    assert(byId(0L).getLong(2) === 1L)
    // the two-term doc outranks the single-hit tf=1 doc ('y' is rarer)
    assert(byId(2L).getDouble(1) > byId(1L).getDouble(1))
  }

  test("spanStats: shared spans counted, keep-first attribution, short docs zeroed") {
    import spark.implicits._
    val shared = "a b c d e f g h" // exactly one 8-gram
    val docs = Seq(
      (10L, s"$shared tail1 tail2 tail3"),   // first owner of the span
      (20L, s"prefix1 prefix2 $shared"),     // later doc, inherits the span
      (30L, "u v w x y z aa bb cc"),         // unique spans only
      (40L, "too short")                     // < 8 tokens → zero grams
    ).toDF("doc_id", "text")
    val r = Dedup.spanStats(docs, "doc_id", "text", k = 8)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    assert(r.keySet === Set(10L, 20L, 30L, 40L)) // every doc present
    // doc 10: 4 grams (11 toks), one shared, but no EARLIER doc has it
    assert(r(10L) === ((4L, 1L, 0L, false)))
    // doc 20: 3 grams (10 toks), the shared one comes from doc 10
    assert(r(20L) === ((3L, 1L, 1L, true))) // 1*5 >= 3 → flagged
    assert(r(30L) === ((2L, 0L, 0L, false)))
    assert(r(40L) === ((0L, 0L, 0L, false)))
  }

  test("spanStats: exact duplicate docs share every span") {
    import spark.implicits._
    val t = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = Dedup.spanStats(docs, "doc_id", "text", k = 8)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) === 0L) // first doc inherits nothing
    assert(r(2L) === 3L) // all 3 grams already owned by doc 1
  }

  test("bm25TopK releases its corpus projection before returning") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"term$i x y")).toDF("doc_id", "text")
    Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 5).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "bm25TopK must not leave its base projection cached")
  }

  test("hybridTopK: RRF fuses both legs, single-leg docs get a null rank") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare alpha beta"),   // text hit AND vector neighbor
      (2L, "alpha beta gamma"),  // neither leg
      (3L, "rare gamma delta"),  // text hit only
      (4L, "beta gamma delta")   // vector neighbor only
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f)),     // the query vector
      (1L, Seq(0.9f, 0.1f, 0f)), // cos ≈ 1 → vrank 1
      (2L, Seq(0f, 1f, 0f)),     // orthogonal
      (3L, Seq(0f, 0.9f, 0.1f)), // orthogonal-ish
      (4L, Seq(0.8f, 0.2f, 0f))  // cos high → vrank 2
    ).toDF("vec_id", "embedding")
    val r = Retrieval.hybridTopK(docs, emb, "doc_id", "text",
      Seq("rare"), queryVecId = 0L, k = 10, kPerLeg = 2)
      .collect().map(x => x.getLong(0) ->
        ((Option(x.get(1)), Option(x.get(2)), x.getLong(3))))
    val byId = r.toMap
    // doc 1: trank 1 (tie-broken vs doc 3) + vrank 1 → both legs fused
    assert(byId(1L) === ((Some(1L), Some(1L), 1000000000L / 61 + 1000000000L / 61)))
    assert(byId(3L) === ((Some(2L), None, 1000000000L / 62))) // text only
    assert(byId(4L)._1 === None) // vector only
    assert(!byId.contains(2L))   // surfaced by neither leg
    // fused order: both-legs doc first
    assert(r.head._1 === 1L)
  }

  test("removeSharedSpans: inherited spans cut end-to-end, first owner untouched") {
    import spark.implicits._
    val shared = "a b c d e f g h i j" // a 10-token run = three 8-grams
    val docs = Seq(
      (1L, s"$shared own1 own2 own3"),
      (2L, s"pre1 pre2 $shared post1"), // inherits the whole 10-token run
      (3L, "solo content with no overlap at all here")
    ).toDF("doc_id", "text")
    val r = Dedup.removeSharedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2)))).toMap
    assert(r(1L) === ((s"$shared own1 own2 own3", 0L))) // first owner keeps all
    // overlapping grams union: the full 10-token run goes in one cut
    assert(r(2L) === (("pre1 pre2 post1", 10L)))
    assert(r(3L)._2 === 0L)
  }

  test("removeSharedSpans: exact duplicate collapses to empty, not NULL") {
    import spark.implicits._
    val t = "one two three four five six seven eight"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = Dedup.removeSharedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2)))).toMap
    assert(r(1L) === ((t, 0L)))
    assert(r(2L) === (("", 8L))) // every token covered → empty string
  }

  test("temperatureMix: alpha=0.5 flattens the mixture toward small sources") {
    import spark.implicits._
    // 90/10 natural split → sqrt smoothing yields 3:1, not 9:1
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (1 to 10).map(i => (100L + i, "small"))).toDF("doc_id", "source")
    val r = Corpus.temperatureMix(docs, "source")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(3), x.getLong(4)))).toMap
    val (nBig, wBig, tBig) = r("big")
    val (nSmall, wSmall, tSmall) = r("small")
    assert(nBig === 90L && nSmall === 10L)
    assert(math.abs(wBig / wSmall - 3.0) < 1e-9) // sqrt(90)/sqrt(10) = 3
    assert(math.abs(wBig + wSmall - 1.0) < 1e-12)
    assert(tBig === 75L && tSmall === 25L) // 100 docs at 3:1
  }

  test("shardShuffle: uniform shards, contiguous positions, partitioning-invariant") {
    import spark.implicits._
    val ids = (1L to 400L).toDF("id")
    val a = ops.Scale.shardShuffle(ids, "id", nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(a.length === 400)
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are exactly 1..count within each shard
    for ((_, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq)
    // md5 nibbles spread: no shard may be empty or hold half the corpus
    val sizes = a.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size === 8 && sizes.values.forall(n => n > 20 && n < 100))
    // (shard, pos) must not depend on the input's physical layout
    val b = ops.Scale.shardShuffle(ids.repartition(7), "id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    intercept[IllegalArgumentException] {
      ops.Scale.shardShuffle(ids, "id", nShards = 10) // 10 does not divide 256
    }
  }

  test("sampleExactPerGroup: exact quotas, prefix property, short groups kept whole") {
    import spark.implicits._
    val docs = ((1 to 40).map(i => (i.toLong, "big")) ++
      Seq((100L, "tiny"), (101L, "tiny"))).toDF("doc_id", "source")
    val s5 = Corpus.sampleExactPerGroup(docs, "source", "doc_id", n = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s5.count(_._2 == "big") === 5)
    assert(s5.count(_._2 == "tiny") === 2) // group smaller than n survives whole
    // hash-ordered ranks make smaller samples prefixes of larger ones
    val s3 = Corpus.sampleExactPerGroup(docs, "source", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s3.subsetOf(s5))
  }

  test("temperatureMix: mass column basis and non-default alpha") {
    import spark.implicits._
    val docs = Seq((1L, "a", 800L), (2L, "a", 800L), (3L, "b", 400L))
      .toDF("doc_id", "source", "n_chars")
    // alpha=1 over mass reproduces the natural mass split 1600:400 = 4:1
    val r = Corpus.temperatureMix(docs, "source", alpha = 1.0,
      massCol = Some("n_chars"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r("a")._1 === 1600L && r("b")._1 === 400L)
    assert(math.abs(r("a")._2 / r("b")._2 - 4.0) < 1e-9)
  }

  test("bm25TopKIndexed equals the inline bm25TopK at equal terms") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "rare", "mid")
    val docs = (0L until 80L).map { i =>
      val n = 5 + rnd.nextInt(40)
      val toks = Seq.fill(n)(vocab(rnd.nextInt(4))) ++
        (if (i % 11 == 0) Seq("rare") else Nil) ++
        (if (i % 3 == 0) Seq("mid", "mid") else Nil)
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val terms = Seq("rare", "mid", "alpha")
    val inline = graft.text.Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 12)
      .collect().map(_.toString)
    val idx = java.nio.file.Files.createTempDirectory("graft_txtidx_spec").toString
    graft.text.Retrieval.buildTextIndex(docs, "doc_id", "text", idx)
    val probed = graft.text.Retrieval.bm25TopKIndexed(spark, idx, terms, k = 12)
      .collect().map(_.toString)
    assert(probed.sameElements(inline),
      s"indexed probe must be byte-equal to the inline ranking\n${inline.mkString("\n")}\nvs\n${probed.mkString("\n")}")
    assert(spark.sharedState.cacheManager.isEmpty, "index build left cache behind")
  }
}
