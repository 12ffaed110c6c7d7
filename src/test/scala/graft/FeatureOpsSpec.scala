package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Property checks for the feature-engineering / incremental tranche,
  * independent of the DuckDB oracle: brute-force in-memory references and
  * adversarial inputs (ties, sparse ids, empty groups) that the fixture
  * data may not exercise. */
class FeatureOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def q(name: String) = {
    val rows = SparkEntry.queries(name)(spark, sf)
    val out = rows.collect()
    spark.sqlContext.clearCache()
    out
  }

  test("q_incr_agg: merged state+delta equals a full recompute") {
    import spark.implicits._
    val incr = q("q_incr_agg")
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val full = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"o_totalprice" * 10000d + 0.5d).cast("long")) / 10000.0)
          .cast("double").as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(incr == full)
    // the split is genuine: both base and delta partitions are non-empty
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val cut = lit("1997-01-01").cast("timestamp")
    assert(orders.filter($"o_orderdate" < cut).count() > 0)
    assert(orders.filter($"o_orderdate" >= cut).count() > 0)
  }

  test("q_hll_incremental: every gate passes and the union row is present") {
    val rows = q("q_hll_incremental")
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) == 1), "an HLL estimate fell outside ±5%")
    val all = rows.filter(_.getString(0) == "__all__")
    assert(all.length == 1)
    // global distinct ≥ any per-type distinct (sanity of the union path)
    val maxPer = rows.filter(_.getString(0) != "__all__").map(_.getLong(1)).max
    assert(all.head.getLong(1) >= maxPer)
  }

  test("label indexing breaks count ties lexicographically") {
    import spark.implicits._
    // langs b and a tie at 2 docs each; c has 3. Expect c=0, a=1, b=2.
    val df = Seq((1L, "b", "s"), (2L, "b", "s"), (3L, "a", "s"),
      (4L, "a", "s"), (5L, "c", "s"), (6L, "c", "s"), (7L, "c", "s"))
      .toDF("doc_id", "lang", "source")
    val cnt = df.groupBy("lang").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("lang").asc)
    val idx = cnt.select(col("lang"),
        (row_number().over(w).cast("long") - 1L).as("i"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx == Map("c" -> 0L, "a" -> 1L, "b" -> 2L))
  }

  test("q_feature_hash buckets are in [0, 256) and counts sum to the token count") {
    val rows = q("q_feature_hash")
    assert(rows.forall { r => val b = r.getInt(1); b >= 0 && b < 256 })
    val total = rows.map(_.getLong(2)).sum
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.text.TextFunctions.tokens(col("text"))))
      .count()
    assert(total == toks)
  }

  test("rolling 7-day distinct matches a brute-force window on synthetic events") {
    import spark.implicits._
    val sdf = new java.text.SimpleDateFormat("yyyy-MM-dd")
    sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    // user 1 on days 0 and 3; user 2 on day 3; user 3 on day 10 (gap)
    val evs = Seq((1L, "2024-01-01"), (1L, "2024-01-04"), (2L, "2024-01-04"),
      (3L, "2024-01-11"), (1L, "2024-01-01")) // duplicate (user, day)
      .map { case (u, day) => (u, new java.sql.Timestamp(sdf.parse(day).getTime)) }
      .toDF("user_id", "ts")
    val got = evs
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("i"), col("d"))
      .select(col("user_id"), date_add(col("d"), col("i")).as("day"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("u7"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // brute force: for each anchor day, distinct users active in [day-6, day]
    val pairs = Seq((1L, 0), (1L, 3), (2L, 3), (3L, 10))
    val days = (0 to 16)
    val want = days.map { a =>
      a -> pairs.filter { case (_, d) => d <= a && d >= a - 6 }.map(_._1).distinct.size
    }.filter(_._2 > 0).toMap
    val gotByOffset = got.map { case (day, n) =>
      ((sdf.parse(day).getTime - sdf.parse("2024-01-01").getTime) / 86400000L).toInt -> n
    }
    assert(gotByOffset == want.map { case (k, v) => k -> v.toLong })
  }

  test("q_source_overlap equals a brute-force distinct-pair join") {
    import spark.implicits._
    val got = q("q_source_overlap")
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val g = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), explode(graft.dedup.Dedup.shingleHashes(col("text"), 8)).as("g"))
      .distinct()
    val a = g.toDF("src_a", "ga"); val b = g.toDF("src_b", "gb")
    val want = a.join(b, col("ga") === col("gb") && col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("imageCrop without flip copies the exact region; flip mirrors it") {
    import spark.implicits._
    val df = Seq(7L).toDF("doc_id")
    val png = Multimodal.withPngPayload(df, "doc_id")
    val seed = 7L * 2654435761L
    def px(x: Int, y: Int) = (seed + 31L * x + 17L * y) & 0xFFFFFF
    val plain = Multimodal.imageProbe(
      Multimodal.imageCrop(png, "doc_id", "payload", 1, 2, 6, 5), "doc_id", "payload")
      .collect().head
    assert(plain.getInt(1) == 6 && plain.getInt(2) == 5)
    assert(plain.getLong(3) == px(1, 2))      // out(0,0) = src(1,2)
    assert(plain.getLong(4) == px(6, 6))      // out(5,4) = src(6,6)
    val flipped = Multimodal.imageProbe(
      Multimodal.imageCrop(png, "doc_id", "payload", 1, 2, 6, 5, flipH = true),
      "doc_id", "payload").collect().head
    assert(flipped.getLong(3) == px(6, 2))    // mirrored corner
    assert(flipped.getLong(4) == px(1, 6))
  }

  test("imageCrop rejects out-of-bounds regions loudly") {
    import spark.implicits._
    val png = Multimodal.withPngPayload(Seq(0L).toDF("doc_id"), "doc_id") // 8x8
    val ex = intercept[Exception] {
      Multimodal.imageCrop(png, "doc_id", "payload", 4, 4, 8, 8).collect()
    }
    assert(ex.getMessage != null)
  }

  test("q_ohlc struct-min open/close equals the window formulation") {
    import spark.implicits._
    val ev = graft.ops.Tables(spark, sf, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    val ref = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("nmax", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), to_date(col("ts")))))
      .filter(col("rn") === 1 || col("rn") === col("nmax"))
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(struct(col("rn"), col("value"))).getField("value").as("open"),
        max(struct(col("rn"), col("value"))).getField("value").as("close"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val got = q("q_ohlc").map(r => (r.getLong(0), r.getDate(1).toString) ->
      (r.getDouble(2), r.getDouble(3))).toMap
    assert(got == ref)
  }

  test("PQ codebook training is deterministic; re-rank output is a shortlist subset") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 4)
    val a = graft.similarity.Ann.pqTopK(emb, queries, k = 10, dim = 64,
      m = 8, ksub = 16).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = graft.similarity.Ann.pqTopK(emb, queries, k = 10, dim = 64,
      m = 8, ksub = 16).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sameElements(b), "PQ ranking must be bit-deterministic")
    val short = graft.similarity.Ann.pqTopK(emb, queries, k = 20, dim = 64,
      m = 8, ksub = 16).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rer = graft.similarity.Ann.pqTopKReranked(emb, queries, k = 5, dim = 64,
      m = 8, ksub = 16, candidates = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rer.forall(short.contains), "re-ranked ids must come from the ADC shortlist")
    assert(rer.groupBy(_._1).forall(_._2.length == 5))
  }

  test("q_negative_pairs: 4 distinct non-self partners per doc, reproducible") {
    val a = q("q_negative_pairs").map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = q("q_negative_pairs").map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sorted.sameElements(b.sorted), "epoch must be reproducible")
    assert(a.forall { case (d, _, n) => d != n }, "no self-pairs")
    val byDoc = a.groupBy(_._1)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(byDoc.size == nDocs)
    assert(byDoc.forall(_._2.length == 4))
    assert(byDoc.forall(_._2.map(_._3).distinct.length == 4),
      "ring offsets 1..4 must give 4 distinct partners when shards are larger than k")
  }

  test("nfc_normalize composes decomposed sequences; strip_accents drops marks") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val row = Seq(("Cafe\u0301", "nai\u0308ve", "\u03a9\u03bc\u03ad\u03b3\u03b1", null: String))
      .toDF("a", "b", "c", "n")
      .selectExpr("nfc_normalize(a) AS a", "strip_accents(b) AS b",
        "strip_accents(c) AS c", "nfc_normalize(n) AS n",
        "length(nfc_normalize('Café')) AS l")
      .collect().head
    assert(row.getString(0) == "Caf\u00e9")      // e + U+0301 -> precomposed
    assert(row.getString(1) == "naive")
    assert(row.getString(2) == "\u03a9\u03bc\u03b5\u03b3\u03b1") // tonos dropped
    assert(row.isNullAt(3))                       // null-safe
    assert(row.getInt(4) == 4)
  }

  test("q_percent_rank: pr spans [0,1] per group and ties share a rank") {
    val rows = q("q_percent_rank")
    val byGroup = rows.groupBy(_.getString(1))
    byGroup.foreach { case (_, rs) =>
      val prs = rs.map(_.getDouble(4))
      assert(math.abs(prs.min - 0.0) < 1e-15)
      assert(math.abs(prs.max - 1.0) < 1e-15)
      // den constant within group
      assert(rs.map(_.getLong(3)).distinct.length == 1)
    }
  }

  test("q_twap equals a driver-side integral on collected events") {
    val got = q("q_twap").map(r => (r.getLong(0), r.getDate(1).toString) ->
      (r.getDouble(2), r.getLong(3))).toMap
    val evs = graft.ops.Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getTimestamp(2).getTime * 1000L +
          (r.getTimestamp(2).getNanos / 1000) % 1000,
        r.getLong(3), r.getDouble(4)))
    val want = evs.groupBy(e => (e._1, e._2)).flatMap { case (k, rows) =>
      val sorted = rows.toSeq.sortBy(e => (e._3, e._4))
      val fp = sorted.map(e => math.floor(e._5 * 10000d + 0.5d).toLong)
      val durs: Seq[Long] = sorted.zip(sorted.drop(1)).map { case (a, b) => b._3 - a._3 }
      if (durs.isEmpty) None
      else {
        val num = fp.zip(durs).map { case (v, d) => BigInt(v) * BigInt(d) }.sum
        Some(k -> ((num.toDouble, durs.sum)))
      }
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (n, dsum)) =>
      assert(got(k)._2 == dsum, s"den mismatch at $k")
      assert(got(k)._1 == n, s"num mismatch at $k")
    }
  }

  test("q_rebalance: copies bring every source within one doc-worth of the max") {
    val rows = q("q_rebalance")
    val bySource = rows.groupBy(_.getString(1))
      .map { case (src, rs) => src -> rs.map(_.getLong(2)).sum }
    val inCounts = rows.groupBy(_.getString(1)).map { case (s0, rs) => s0 -> rs.length }
    val maxIn = inCounts.values.max
    assert(rows.forall(_.getLong(2) >= 1), "every doc keeps at least one copy")
    bySource.foreach { case (src, out) =>
      val cnt = inCounts(src).toLong
      // E[out] = max exactly; the md5-Bernoulli draw concentrates tightly -
      // allow +-20% for a 20-30 doc source
      assert(math.abs(out - maxIn) <= math.max(6L, maxIn / 5),
        s"source $src rebalanced to $out vs target $maxIn")
    }
  }

  test("q_readability: counts are consistent and flesch falls out of them") {
    val rows = q("q_readability")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, sen, syl, fl) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(sen >= 1)
      if (w == 0) assert(fl == 0.0)
      else {
        val expect = 206.835 - 1.015 * (w.toDouble / sen) - 84.6 * (syl.toDouble / w)
        assert(fl == expect, s"flesch drift for doc ${r.getLong(0)}")
      }
    }
  }
}
