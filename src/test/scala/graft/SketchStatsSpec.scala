package graft

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the statistics tranche: Count-Min sketch (guarantee +
  * linearity + hash lock-step), ACF bounds, the CUSUM window identity
  * vs the literal clamped recursion, life-table accounting, bootstrap
  * determinism, URL parsing, and the chained streaming rollup vs its
  * batch twin. */
class SketchStatsSpec extends AnyFunSuite {

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

  private def events = graft.ops.Tables.events(spark, sf)

  test("CountMin.bucket matches the SQL md5 replay expression") {
    import spark.implicits._
    val keys = Seq(0L, 1L, 7L, 123456789L, -5L, Long.MaxValue)
    val df = keys.toDF("k")
      .withColumn("s", explode(array((0 until 4).map(lit): _*)))
    val h = "md5(CAST(k AS STRING) || 'cm' || CAST(s AS STRING))"
    val nib = (i: Int) => s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"
    val b = expr((1 to 6)
      .map(i => s"${nib(i)} * ${math.pow(16, 6 - i).toLong}L")
      .mkString("((", " + ", ") % 256L)"))
    df.withColumn("b", b).collect().foreach { r =>
      val (k, s, sqlB) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(graft.functions.CountMin.bucket(k, s, 256) === sqlB,
        s"JVM/SQL bucket hash diverged for key=$k row=$s")
    }
  }

  test("count_min is linear: sketch(A ∪ B) == sketch(A) + sketch(B)") {
    def sketchOf(pred: org.apache.spark.sql.Column): Array[Long] =
      events.filter(pred).agg(GraftBridge.column(
          graft.functions.CountMinAgg(
            GraftBridge.expression(col("user_id")), 4, 256)).as("sk"))
        .collect()(0).getSeq[Long](0).toArray
    val whole = sketchOf(lit(true))
    val even = sketchOf(col("event_id") % 2 === 0)
    val odd = sketchOf(col("event_id") % 2 === 1)
    assert(whole.toSeq === even.zip(odd).map { case (a, b) => a + b }.toSeq,
      "pointwise sum of disjoint-stream sketches must equal the full sketch")
  }

  test("count_min is callable from SQL via GraftExtensions") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s2.sparkContext.setLogLevel("ERROR")
    import s2.implicits._
    Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k").createOrReplaceTempView("cm_t")
    val sk = s2.sql("SELECT count_min(k, 4, 256) AS sk FROM cm_t")
      .collect()(0).getSeq[Long](0)
    assert(sk.length === 4 * 256)
    assert(sk.sum === 4 * 6, "each row increments one cell per hash row")
    // the sketch the SQL surface builds equals the Column-API one
    val viaCol = s2.table("cm_t").agg(GraftBridge.column(
        graft.functions.CountMinAgg(
          GraftBridge.expression(col("k")), 4, 256)).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(sk === viaCol)
  }

  test("q_countmin honors the one-sided guarantee and total mass") {
    val rows = q("q_countmin")
    val n = events.count()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CM underestimated user ${r.getLong(0)}")
      assert(r.getBoolean(3))
      assert(r.getLong(2) <= n, "estimate exceeds stream length")
    }
  }

  test("q_acf values are correlations: |acf| <= 1, n_pairs consistent") {
    val rows = q("q_acf")
    assert(rows.nonEmpty)
    val perUser = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (u, lag, n) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(n === math.max(perUser(u) - lag, 0L))
      if (!r.isNullAt(4)) {
        val a = r.getDouble(4)
        assert(a >= -1.0000001 && a <= 1.0000001, s"acf out of range: $a")
      }
    }
  }

  test("q_cusum window identity equals the literal clamped recursion") {
    val rows = q("q_cusum").map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = events
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value").cast("double") * 100d + 0.5d).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getLong(3)))
    val tgt = ev.map(_._4).sum / ev.length // floor div == `sum div count`
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      var s = 0L
      es.sortBy(e => (e._3, e._2)).toSeq.map { e =>
        s = math.max(0L, s + (e._4 - tgt))
        (u, e._2, s)
      }
    }.toSet
    assert(rows.toSet === expected,
      "S_t − min(0, runmin) must equal max(0, s + (v − tgt)) pointwise")
  }

  test("q_life_table accounting: users conserved, n_risk anchored, hazard <= 1") {
    val rows = q("q_life_table").sortBy(_.getLong(0))
    val users = events.select("user_id").distinct().count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === users)
    assert(rows.head.getLong(1) === users,
      "n_risk at the smallest duration must cover every user")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // n_risk is the suffix-sum of exits: strictly decreasing over rows
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) > b.getLong(1))
      case _ =>
    }
  }

  test("q_bootstrap: 8 replicas per source, deterministic, plausible mass") {
    val r1 = q("q_bootstrap")
    val r2 = q("q_bootstrap")
    assert(r1.map(_.toSeq).toSet === r2.map(_.toSeq).toSet,
      "bootstrap replicas must be bit-reproducible")
    val sources = graft.ops.Tables(spark, sf, "documents")
      .select("source").distinct().count()
    assert(r1.length === sources * 8)
    val docs = graft.ops.Tables(spark, sf, "documents").count()
    val meanEff = r1.map(_.getLong(2)).sum.toDouble / r1.length
    val docsPerSource = docs.toDouble / sources
    assert(math.abs(meanEff - docsPerSource) < docsPerSource * 0.5,
      s"mean Poisson(1) replica mass $meanEff far from $docsPerSource")
  }

  test("q_url_parse: domain per source, www subset, absolute paths") {
    val rows = q("q_url_parse")
    val sources = graft.ops.Tables(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length === sources, "one registered domain per source")
    rows.foreach { r =>
      assert(!r.getString(0).startsWith("www."), "domain must be stripped")
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getString(5).startsWith("/"), "PATH must be absolute")
    }
  }

  test("q_gini matches the O(n²) mean-absolute-difference definition") {
    val rows = q("q_gini")
    val byStatus = graft.ops.Tables(spark, sf, "orders")
      .select(col("o_orderstatus"),
        floor(col("o_totalprice").cast("double") * 100d + 0.5d).cast("long")
          .as("x"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val xs = byStatus(r.getString(0)).map(_.getLong(1))
      val n = xs.length.toLong
      val sx = xs.map(BigInt(_)).sum
      val mad = (for (a <- xs; b <- xs) yield (BigInt(a) - BigInt(b)).abs).sum
      val expected = mad.toDouble / (BigInt(2) * n * n * sx).toDouble * n
      assert(math.abs(r.getDouble(3) - expected) < 1e-9,
        s"gini ${r.getDouble(3)} != naive $expected for ${r.getString(0)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
  }

  test("q_dp_count: clamped noise, non-negative release, deterministic") {
    val r1 = q("q_dp_count")
    val r2 = q("q_dp_count")
    assert(r1.map(_.toSeq).toSet === r2.map(_.toSeq).toSet)
    r1.foreach { r =>
      assert(math.abs(r.getLong(2)) <= 6, "noise must clamp to ±6")
      assert(r.getLong(3) >= 0, "post-processed release must be >= 0")
      assert(r.getLong(3) === math.max(r.getLong(1) + r.getLong(2), 0L))
    }
    assert(r1.map(_.getLong(2)).distinct.length > 1,
      "noise should vary across sources (not a constant)")
  }

  test("q_listagg emits ascending bounded lists") {
    q("q_listagg").foreach { r =>
      assert(r.getLong(2) <= 12)
      val keys = r.getString(3).split(",").map(_.toLong)
      assert(keys.length === r.getLong(2))
      assert(keys.sorted.sameElements(keys), "key_list must be ascending")
    }
  }

  test("q_ngram_novelty: ratios in range, duplicated docs score low") {
    val rows = q("q_ngram_novelty")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
    }
    // any doc whose text appears verbatim in another doc has ZERO novel
    // grams — check against exact-dup groups if the fixture has any
    val dups = graft.ops.Tables(spark, sf, "documents")
      .groupBy("text").agg(count(lit(1)).as("c"),
        collect_list("doc_id").as("ids"))
      .filter(col("c") > 1)
      .select(explode(col("ids")).as("doc_id")).collect()
      .map(_.getLong(0)).toSet
    if (dups.nonEmpty) {
      val novelOfDups = rows.filter(r => dups.contains(r.getLong(0)))
      novelOfDups.foreach(r =>
        assert(r.getLong(2) === 0, s"dup doc ${r.getLong(0)} has novel grams"))
    }
  }

  test("q_stream_sliding covers each event exactly 4 times") {
    val rows = q("q_stream_sliding")
    val total = events.count()
    assert(rows.map(_.getLong(2)).sum === total * 4,
      "every event must land in exactly 4 sliding windows")
    // window starts align to the 15-minute grid
    rows.foreach(r => assert(r.getLong(1) % 900000000L === 0))
  }

  test("q_rolling_anomaly matches a naive trailing-window replay") {
    val rows = q("q_rolling_anomaly")
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(5))).toMap
    val ev = events
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value").cast("double") * 100d + 0.5d).cast("long").as("v"))
      .collect().map { r =>
        val t = r.getTimestamp(2)
        val us = t.getTime * 1000 + t.getNanos / 1000 % 1000
        (r.getLong(0), r.getLong(1), (us, r.getLong(1)), r.getLong(3))
      }
    ev.groupBy(_._1).foreach { case (u, es) =>
      val sorted = es.sortBy(e => e._3)
      sorted.indices.foreach { i =>
        val win = sorted.slice(math.max(0, i - 20), i).map(_._4)
        val (n, s1, s2) =
          (win.length.toLong, win.sum, win.map(x => x * x).sum)
        val expectFlag = n >= 8 &&
          { val d = n * sorted(i)._4 - s1; d * d > 9 * (n * s2 - s1 * s1) }
        val (gotN, gotFlag) = rows((u, sorted(i)._2))
        assert(gotN === n, s"window size mismatch at user $u idx $i")
        assert(gotFlag === expectFlag, s"flag mismatch at user $u idx $i")
      }
    }
  }

  test("q_weighted_median halves the mass on each side") {
    val rows = q("q_weighted_median")
    val li = graft.ops.Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice").cast("double") * 100d + 0.5d)
          .cast("long").as("p"),
        col("l_quantity").cast("long").as("w"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val (flag, tot, med) = (r.getString(0), r.getLong(1), r.getLong(2))
      val xs = li(flag).map(x => (x.getLong(1), x.getLong(2)))
      assert(tot === xs.map(_._2).sum)
      val below = xs.filter(_._1 < med).map(_._2).sum
      val upto = xs.filter(_._1 <= med).map(_._2).sum
      assert(2 * below < tot, "mass strictly below median must be < half")
      assert(2 * upto >= tot, "mass up to median must reach half")
    }
  }

  test("q_diversity_simpson: bounds and degenerate cases") {
    val rows = q("q_diversity_simpson")
    rows.foreach { r =>
      val (n, k, lam, div) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(lam >= n, "sum of squares must dominate the sum")
      assert(div >= -1e-12 && div <= 1.0 - 1.0 / k + 1e-12,
        s"diversity $div outside [0, 1-1/k] for k=$k")
      if (k == 1) assert(math.abs(div) < 1e-12,
        "single-type user must have zero diversity")
    }
  }

  test("q_pca_project matches a from-scratch local power iteration") {
    val got = q("q_pca_project")
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // independent local replay: collect vectors, build the covariance
    // numerators DIRECTLY (not via the distributed moment identity),
    // run the same iterate/requantize recursion, project
    val vecs = graft.ops.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f =>
          BigInt(math.floor(f.toDouble * 10000 + 0.5).toLong)).toArray)
    val dim = vecs.head._2.length
    val n = BigInt(vecs.length)
    val mean = Array.tabulate(dim)(d => vecs.map(_._2(d)).sum) // = S_d
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      // n²·Cov = n·Σxᵢxⱼ − SᵢSⱼ — same PSD matrix up to positive scale
      n * vecs.map(v => v._2(i) * v._2(j)).sum - mean(i) * mean(j)
    }
    var v = Array.fill(dim)(BigInt(1000000))
    (1 to 8).foreach { _ =>
      val w = Array.tabulate(dim)(d =>
        (0 until dim).map(j => cov(d)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      if (m != 0)
        v = w.map(wd =>
          (if (wd < 0) -BigInt(1) else BigInt(1)) * (wd.abs * 1000000 / m))
    }
    vecs.foreach { case (id, xf) =>
      val proj = (0 until dim).map(d => xf(d) * v(d)).sum
      assert(BigInt(got(id)) === proj, s"projection mismatch for vec $id")
    }
    // Rayleigh quotient must not have decreased from the start vector
    def rayleigh(u: Array[BigInt]): BigDecimal = {
      val num = (0 until dim).map(i =>
        u(i) * (0 until dim).map(j => cov(i)(j) * u(j)).sum).sum
      BigDecimal(num) / BigDecimal((0 until dim).map(i => u(i) * u(i)).sum)
    }
    assert(rayleigh(v) >= rayleigh(Array.fill(dim)(BigInt(1000000))),
      "power iteration must not decrease the Rayleigh quotient")
  }

  test("q_attribution: views precede purchases within the lookback") {
    val rows = q("q_attribution")
    assert(rows.nonEmpty)
    val evs = events.select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    rows.filter(r => !r.isNullAt(2)).foreach { r =>
      val (view, gap) = (r.getLong(2), r.getLong(3))
      assert(evs(view)._1 === "view")
      assert(gap >= 0 && gap <= 604800000000L)
      assert(evs(r.getLong(1))._2 - evs(view)._2 === gap)
    }
  }

  test("q_dedup_template groups digit-variant copies together") {
    import spark.implicits._
    val rows = q("q_dedup_template")
    // the canonical representative IS the min doc_id of its group
    rows.groupBy(_.getLong(1)).foreach { case (canon, grp) =>
      assert(canon === grp.map(_.getLong(0)).min,
        s"canon $canon is not the group minimum")
      assert(grp.forall(_.getLong(2) === grp.length.toLong))
    }
    val canons = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(rows.forall(r => canons.contains(r.getLong(1))))
    // behavioural check on a synthetic frame: digit/spacing variants of
    // one template collapse, a genuinely different text does not
    val df = Seq((1L, "Order 123 shipped  on 2024"),
        (2L, "order 99 SHIPPED on 0007"),
        (3L, "totally different text")).toDF("doc_id", "text")
    val tkey = md5(trim(regexp_replace(regexp_replace(lower(col("text")),
      "[0-9]+", "0"), "\\s+", " ")))
    val groups = df.select(tkey.as("k")).collect().map(_.getString(0))
    assert(groups(0) === groups(1))
    assert(groups(0) !== groups(2))
  }

  test("q_chi_square is within quantization error of the float formula") {
    val r = q("q_chi_square")(0)
    val (n, chi2Micro, dof) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val cells = events
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .count().collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2)))
    val rowM = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colM = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = cells.map(_._3).sum
    assert(n === total)
    assert(dof === (rowM.size - 1).toLong * (colM.size - 1))
    val naive = cells.map { case (et, dw, o) =>
      val e = rowM(et).toDouble * colM(dw) / total
      (o - e) * (o - e) / e
    }.sum
    // each of the |cells| terms is floor-truncated to micro-units
    assert(math.abs(chi2Micro / 1e6 - naive) < cells.length / 1e6 + 1e-6,
      s"chi2 ${chi2Micro / 1e6} vs naive $naive")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
  }

  test("q_ks_test equals the naive two-sample KS statistic") {
    val r = q("q_ks_test")(0)
    val (na, nb, num) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val samples = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"),
        floor(col("value").cast("double") * 10000d + 0.5d).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = samples.filter(_._1 == "view").map(_._2).sorted
    val b = samples.filter(_._1 == "purchase").map(_._2).sorted
    assert(na === a.length.toLong && nb === b.length.toLong)
    val points = (a ++ b).distinct.sorted
    val naiveNum = points.map { x =>
      math.abs(a.count(_ <= x).toLong * nb - b.count(_ <= x).toLong * na)
    }.max
    assert(num === naiveNum)
    assert(math.abs(r.getDouble(3) - naiveNum.toDouble / (na * nb)) < 1e-15)
  }

  test("q_benford conserves counts and quantizes expectations correctly") {
    val rows = q("q_benford")
    assert(rows.length === 9)
    val total = graft.ops.Tables(spark, sf, "orders")
      .filter(col("o_totalprice") >= 1).count()
    assert(rows.map(_.getLong(1)).sum === total,
      "observed digit counts must conserve the row count")
    val ppm = Map("1" -> 301030L, "2" -> 176091L, "3" -> 124939L,
      "4" -> 96910L, "5" -> 79181L, "6" -> 66947L, "7" -> 57992L,
      "8" -> 51153L, "9" -> 45757L)
    rows.foreach { r =>
      assert(r.getLong(2) === total * ppm(r.getString(0)) / 1000000L)
      assert(r.getLong(3) >= 0)
    }
  }

  test("q_salted_agg equals the direct aggregation") {
    val salted = q("q_salted_agg").map(_.toSeq).toSet
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value").cast("double") * 10000d + 0.5d).cast("long"))
          .as("s_fp"))
      .collect().map(_.toSeq).toSet
    assert(salted === direct)
  }

  test("q_oov_rate: exactly 256 in-vocab types, rates bounded") {
    val rows = q("q_oov_rate")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
    }
    // distinct in-vocab types across all docs can't exceed the 256 cut
    val docs = graft.ops.Tables(spark, sf, "documents")
    val toks = docs.select(explode(
      graft.text.TextFunctions.tokens(col("text"))).as("tok"))
    val types = toks.distinct().count()
    val totalToks = toks.count()
    val oovToks = rows.map(_.getLong(2)).sum
    if (types <= 256) assert(oovToks === 0L,
      "a vocab covering every type must yield zero OOV")
    else assert(oovToks > 0L && oovToks < totalToks)
  }

  test("q_bitmap_audience matches set-algebra bounds and exact overlaps") {
    val rows = q("q_bitmap_audience")
    val sets = events.select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    assert(rows.length === sets.size * (sets.size - 1) / 2,
      "one row per unordered segment pair")
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === sets(sa).size.toLong)
      assert(r.getLong(3) === sets(sb).size.toLong)
      assert(r.getLong(4) === (sets(sa) & sets(sb)).size.toLong,
        s"bitmap intersection wrong for ($sa, $sb)")
    }
  }

  test("q_decay_engagement: halving weights, bounded scores") {
    val rows = q("q_decay_engagement")
    rows.foreach { r =>
      // each event weighs at most 1.0 (today) in ppm
      assert(r.getLong(2) <= r.getLong(1) * 1000000L)
      assert(r.getLong(2) >= 0)
    }
    // a user's most recent event alone can't exceed the full score
    val maxUs = events.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val top = events
      .select(col("user_id"),
        expr(s"(${maxUs}L - unix_micros(ts)) div 86400000000").as("dago"))
      .groupBy("user_id").agg(min(col("dago")).as("freshest"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    top.foreach { case (u, freshest) =>
      val w = if (freshest < 20) 1000000L >> freshest else 0L
      assert(byUser(u) >= w, s"score below the freshest event's weight for $u")
    }
  }

  test("q_dedup_bow collapses reordered tokens, not different ones") {
    import spark.implicits._
    val rows = q("q_dedup_bow")
    val canons = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(rows.forall(r => canons.contains(r.getLong(1))))
    rows.groupBy(_.getLong(1)).foreach { case (canon, grp) =>
      assert(canon === grp.map(_.getLong(0)).min,
        s"canon $canon is not the group minimum")
    }
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val keys = df.select(md5(concat_ws(" ",
        array_sort(split(trim(col("text")), "\\s+")))).as("k"))
      .collect().map(_.getString(0))
    assert(keys(0) === keys(1))
    assert(keys(0) !== keys(2))
  }

  test("q_sim_histogram: valid deciles, exact dups land in bucket 10") {
    val rows = q("q_sim_histogram")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
      assert(r.getLong(1) > 0)
    }
    // exact-dup docs (same text, >= 8 tokens) have identical gram sets
    val dupPairs = graft.ops.Tables(spark, sf, "documents")
      .filter(size(split(trim(col("text")), "\\s+")) >= 8)
      .groupBy("text").count().filter(col("count") > 1).count()
    if (dupPairs > 0)
      assert(rows.exists(r => r.getLong(0) == 10L),
        "identical docs must produce bucket-10 pairs")
  }

  test("q_ntile_cume: balanced quartiles, cume_dist reaches 1") {
    val rows = q("q_ntile_cume")
    rows.groupBy(_.getString(1)).foreach { case (st, rs) =>
      val tiles = rs.groupBy(_.getInt(2)).view.mapValues(_.size)
      assert(tiles.keySet.subsetOf(Set(1, 2, 3, 4)))
      assert(tiles.values.max - tiles.values.min <= 1,
        s"ntile must balance within 1 for $st")
      val cds = rs.map(_.getDouble(3))
      assert(cds.forall(c => c > 0 && c <= 1.0))
      assert(math.abs(cds.max - 1.0) < 1e-12)
    }
  }

  private def embFixed: Array[(Long, Int, Array[BigInt])] =
    graft.ops.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(f =>
          BigInt(math.floor(f.toDouble * 10000 + 0.5).toLong)).toArray))

  test("q_fisher_score tracks the float Fisher ratio per dimension") {
    val rows = q("q_fisher_score")
    assert(rows.length === embFixed.head._3.length)
    val byLabel = embFixed.groupBy(_._2)
    val k = byLabel.size
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
      val all = embFixed.map(_._3(d).toDouble / 10000)
      val mu = all.sum / all.length
      val btw = byLabel.values.map { vs =>
        val m = vs.map(_._3(d).toDouble / 10000).sum / vs.length
        vs.length * (m - mu) * (m - mu)
      }.sum
      val wth = byLabel.values.map { vs =>
        val m = vs.map(_._3(d).toDouble / 10000).sum / vs.length
        vs.map(v => math.pow(v._3(d).toDouble / 10000 - m, 2)).sum
      }.sum
      // micro-quantized per label ⇒ k/1e6 absolute slack on each sum
      // (both sums are in fixed-point² units = 1e8 × float units)
      assert(math.abs(r.getLong(1) / 1e6 / 1e8 - btw) < k / 1e6 + 1e-6,
        s"between mismatch at dim $d")
      assert(math.abs(r.getLong(2) / 1e6 / 1e8 - wth) < k / 1e6 + 1e-6,
        s"within mismatch at dim $d")
    }
  }

  test("q_nn_centroid_confusion conserves vectors and beats chance") {
    val rows = q("q_nn_centroid_confusion")
    val total = embFixed.length.toLong
    assert(rows.map(_.getLong(2)).sum === total)
    val labels = embFixed.map(_._2.toLong).toSet
    rows.foreach { r =>
      assert(labels.contains(r.getInt(0).toLong) ||
        labels.contains(r.getLong(0)))
    }
    val correct = rows.filter(r => r.get(0) == r.get(1))
      .map(_.getLong(2)).sum
    assert(correct.toDouble / total > 1.0 / labels.size,
      "nearest-centroid should beat uniform guessing")
  }

  test("q_centroid_outliers ranks exact integer distances") {
    val rows = q("q_centroid_outliers")
    val byLabel = embFixed.groupBy(_._2)
    rows.groupBy(_.getInt(0)).foreach { case (lbl, rs) =>
      assert(rs.length <= 10)
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rs.length))
      // descending distances down the rank
      assert(sorted.map(_.getLong(2)).toSeq ===
        sorted.map(_.getLong(2)).sortBy(x => -x).toSeq)
      // top outlier matches the naive n²·d² computation
      val vs = byLabel(lbl)
      val nl = BigInt(vs.length)
      val dims = vs.head._3.indices
      val s = dims.map(d => vs.map(_._3(d)).sum)
      val worst = vs.map { v =>
        v._1 -> dims.map { d =>
          val t = nl * v._3(d) - s(d); t * t
        }.sum
      }.maxBy { case (id, a2) => (a2, -id) }
      assert(sorted.head.getLong(1) === worst._1)
      assert(BigInt(sorted.head.getLong(2)) === worst._2)
    }
  }

  test("q_ab_test: conserves users, decision consistent with statistic") {
    val r = q("q_ab_test")(0)
    val users = events.select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(2) === users)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    assert(r.getLong(5) >= 0)
    assert(r.getBoolean(6) === (r.getLong(5) > 3841459L))
    assert(q("q_ab_test")(0).toSeq === r.toSeq, "must be deterministic")
  }

  test("q_cluster_quality: naive cohesion replay, sane geometry") {
    val rows = q("q_cluster_quality")
    val asg = graft.similarity.KMeans.assignClusters(
        graft.ops.Tables(spark, sf, "embeddings"), "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = embFixed.groupBy(v => asg(v._1))
    rows.foreach { r =>
      val (cid, n) = (r.getLong(0), r.getLong(1))
      assert(byCluster(cid).size.toLong === n)
      assert(r.getDouble(2) >= 0, "cohesion is a squared distance")
      assert(r.getDouble(4) > 0, "distinct centroids must separate")
      assert(r.getLong(3) !== cid)
      // naive Σ‖x−μ‖² in fixed-point² units: (n·ΣQ − ΣS²)/n² replayed
      // directly from vectors
      val vs = byCluster(cid).map(_._3)
      val dims = vs.head.indices
      val bn = BigInt(n)
      val num = bn * vs.map(v => dims.map(d => v(d) * v(d)).sum).sum -
        dims.map { d => val s = vs.map(_(d)).sum; s * s }.sum
      val expected = num.toDouble / n / n
      assert(math.abs(r.getDouble(2) - expected) <=
        math.abs(expected) * 1e-12 + 1e-9,
        s"cohesion mismatch for cluster $cid")
    }
  }

  test("q_max_concurrency equals a naive in-memory sweep") {
    val r = q("q_max_concurrency")(0)
    val ev = events.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._2)
      val breaks = sorted.zip(0L +: sorted.dropRight(1)).zipWithIndex
        .collect { case ((us, prev), i) if i == 0 || us - prev > 1800000000L => i }
        .toList
      (breaks :+ sorted.length).sliding(2).collect {
        case List(a, b) => (sorted(a), sorted(b - 1))
      }.toSeq
    }
    assert(r.getLong(0) === sessions.length.toLong)
    val conc = sessions.map(_._1).distinct.map { u =>
      u -> sessions.count(s => s._1 <= u && s._2 >= u).toLong
    }
    val mx = conc.map(_._2).max
    assert(r.getLong(1) === mx)
    assert(r.getLong(2) === conc.filter(_._2 == mx).map(_._1).min)
  }

  test("q_skew_report fields match an in-memory replay") {
    val r = q("q_skew_report")(0)
    val sizes = graft.ops.Tables(spark, sf, "orders")
      .groupBy("o_custkey").count().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val nKeys = sizes.length.toLong
    val nRows = sizes.map(_._2).sum
    val sorted = sizes.sortBy(x => (x._2, x._1)).map(_._2)
    assert(r.getLong(0) === nKeys && r.getLong(1) === nRows)
    assert(r.getLong(2) === sorted.last)
    assert(r.getLong(3) === sorted.last * 10000 / nRows)
    assert(r.getLong(4) === sorted(((nKeys + 1) / 2 - 1).toInt))
    val p99 = sorted((math.max(nKeys * 99 / 100, 1) - 1).toInt)
    assert(r.getLong(5) === p99)
    assert(r.getLong(6) === p99 * 10000 / r.getLong(4))
  }

  test("q_size_histogram buckets by bit length and conserves mass") {
    val rows = q("q_size_histogram")
    val docs = graft.ops.Tables(spark, sf, "documents")
      .filter(col("n_chars") > 0).select("n_chars").collect()
      .map(_.getLong(0))
    assert(rows.map(_.getLong(1)).sum === docs.length.toLong)
    assert(rows.map(_.getLong(4)).sum === docs.sum)
    rows.foreach { r =>
      val b = r.getInt(0)
      assert(java.lang.Long.toBinaryString(r.getLong(2)).length === b)
      assert(java.lang.Long.toBinaryString(r.getLong(3)).length === b)
    }
  }

  test("q_pps_sample: probability rule, p > 0 everywhere, certain at max") {
    val rows = q("q_pps_sample")
    val mx = graft.ops.Tables(spark, sf, "documents")
      .agg(max(col("n_chars"))).collect()(0).getLong(0)
    val byDoc = graft.ops.Tables(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val p = math.max(1L,
        math.min(1048576L, byDoc(r.getLong(0)) * 1048576L / mx))
      assert(r.getLong(2) === p)
      assert(p > 0, "HT requires every inclusion probability > 0")
      if (p == 1048576L) assert(r.getBoolean(3),
        "the longest doc draws u < 2^20 with certainty")
      assert(r.getLong(4) === 1048576L * 1000000L / p)
    }
    assert(rows.count(_.getBoolean(3)) > 0)
    assert(q("q_pps_sample").map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("q_cross_corr equals a naive per-lag Pearson on daily counts") {
    val rows = q("q_cross_corr")
    val days = events.filter(col("event_type").isin("view", "purchase"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type")).count()
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getLong(2)))
    val vx = days.filter(_._2 == "view").map(t => t._1 -> t._3).toMap
    val vy = days.filter(_._2 == "purchase").map(t => t._1 -> t._3).toMap
    rows.foreach { r =>
      val lag = r.getInt(0)
      val pairs = vx.toSeq.flatMap { case (day, x) =>
        vy.get(day.plusDays(lag)).map(y => (x.toDouble, y.toDouble))
      }
      assert(r.getLong(1) === pairs.length.toLong)
      if (!r.isNullAt(3)) {
        val n = pairs.length
        val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val naive = (n * sxy - sx * sy) /
          math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        assert(math.abs(r.getDouble(3) - naive) < 1e-9)
        assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12)
      }
    }
  }

  test("q_dedup_golden: monotone funnel consistent with the stage queries") {
    val rows = q("q_dedup_golden").sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1_exact", "2_template", "3_bow", "4_neardup"))
    // chained: each stage's input is the previous stage's output
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) === b.getLong(1))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    }
    val docs = graft.ops.Tables(spark, sf, "documents").count()
    assert(rows.head.getLong(1) === docs)
    // stage-1 removals must equal the standalone exact-dup count
    val exactDups = docs - graft.ops.Tables(spark, sf, "documents")
      .select(md5(col("text"))).distinct().count()
    assert(rows.head.getLong(3) === exactDups)
  }

  test("q_rolling_trend matches a naive BigInt windowed regression") {
    val rows = q("q_rolling_trend")
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val ev = events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value").cast("double") * 100d + 0.5d).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      sorted.indices.foreach { i =>
        val win = sorted.slice(math.max(0, i - 19), i + 1)
        val n = BigInt(win.length)
        val f0 = BigInt(win.head._3)
        val xs = win.map(e => BigInt(e._3) - f0)
        val ys = win.map(e => BigInt(e._4))
        val (sx, sy) = (xs.sum, ys.sum)
        val sxx = xs.map(x => x * x).sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx
        val expect =
          if (n < 5 || den == 0) None
          else Some(((if (num < 0) BigInt(-1) else BigInt(1)) *
            (num.abs * BigInt(36000000000000L) / den)).toLong)
        val (gotN, gotSlope) = rows((u, sorted(i)._2))
        assert(gotN === n.toLong)
        assert(gotSlope === expect, s"slope mismatch at user $u idx $i")
      }
    }
  }

  test("growth trio: conservation across new/returning, deciles, stickiness") {
    val nr = q("q_new_returning")
    val users = events.select("user_id").distinct().count()
    // every user is new exactly once
    assert(nr.map(_.getLong(2)).sum === users)
    nr.foreach(r => assert(r.getLong(1) === r.getLong(2) + r.getLong(3)))

    val pc = q("q_power_curve").sortBy(_.getInt(0))
    val total = events.count()
    assert(pc.map(_.getLong(2)).sum === total)
    assert(pc.map(_.getLong(1)).sum === users)
    // deciles ordered by activity: non-increasing event mass
    assert(pc.map(_.getLong(2)).toSeq ===
      pc.map(_.getLong(2)).sortBy(x => -x).toSeq)
    pc.foreach(r => assert(r.getLong(3) === r.getLong(2) * 10000 / total))

    val st = q("q_stickiness")(0)
    assert(st.getLong(2) === users)
    assert(st.getLong(3) ===
      st.getLong(1) * 1000000 / (st.getLong(0) * st.getLong(2)))
    assert(st.getLong(3) <= 1000000)
  }

  test("q_load_profile covers the grid and conserves shares") {
    val rows = q("q_load_profile")
    val total = events.count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 7)
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 23)
      assert(r.getLong(3) === r.getLong(2) * 10000 / total)
      assert(r.getLong(4) ===
        r.getLong(2) * rows.length * 10000 / total)
    }
  }

  test("q_interarrival: rank picks and Fano replayed naively") {
    val rows = q("q_interarrival")
      .map(r => r.getLong(0) -> r).toMap
    val ev = events.select(col("user_id"), unix_micros(col("ts")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (u, es) =>
      val times = es.sortBy(e => (e._2, e._3))
      val gapsWithId = times.sliding(2).collect {
        case Array(a, b) => (b._2 - a._2, b._3)
      }.toSeq
      if (gapsWithId.nonEmpty) {
        val r = rows(u)
        assert(r.getLong(1) === gapsWithId.length.toLong)
        val byRank = gapsWithId.sortBy(g => (g._1, g._2)).map(_._1)
        val n = byRank.length
        assert(r.getLong(2) === byRank((n + 1) / 2 - 1))
        assert(r.getLong(3) === byRank(math.max(n * 90 / 100, 1) - 1))
        if (n >= 2) {
          val sg = byRank.map(BigInt(_)).sum
          val sgg = byRank.map(g => BigInt(g) * g).sum
          val fano = (BigInt(n) * sgg - sg * sg) * 1000000 / (BigInt(n) * sg)
          assert(BigInt(r.getLong(4)) === fano, s"fano mismatch for $u")
        }
      }
    }
  }

  test("q_homoglyph re-unites evaded docs with their originals") {
    val rows = q("q_homoglyph")
    val evaded = rows.filter(_.getBoolean(3))
    assert(evaded.nonEmpty, "every 5th doc must carry the injected evasion")
    // every evaded doc must share a group with its (unevaded) original
    // UNLESS it IS the canonical min — but since evasion only rewrites
    // text, the evaded doc's group must contain at least one row whose
    // doc_id differs when a byte-identical original exists; minimally:
    // group sizes never shrink below 1 and canon is the group min
    rows.groupBy(_.getLong(1)).foreach { case (canon, grp) =>
      assert(canon === grp.map(_.getLong(0)).min)
      assert(grp.forall(_.getLong(2) === grp.length.toLong))
    }
    // canonical keying is evasion-invariant: normalized text of an
    // evaded doc equals its original text
    import spark.implicits._
    val probe = Seq("sample text alpha").toDF("text")
      .select(translate(translate(col("text"), "aeo", "аео"),
        "аео", "aeo").as("roundtrip"))
      .collect()(0).getString(0)
    assert(probe === "sample text alpha")
  }

  test("corpus composition trio: mass conservation and bounds") {
    val docs = graft.ops.Tables(spark, sf, "documents")
    val total = docs.count()

    val lm = q("q_lang_mix")
    assert(lm.map(_.getLong(1)).sum === total)
    lm.foreach { r =>
      assert(r.getLong(4) >= 10000 / math.max(r.getLong(2), 1),
        "dominant share can't fall below the uniform floor")
      assert(r.getLong(4) <= 10000)
    }

    val ttr = q("q_ttr")
    assert(ttr.length === total)
    ttr.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) === r.getLong(2) * 10000 / r.getLong(1))
    }

    val dup = q("q_dup_by_source")
    assert(dup.map(_.getLong(1)).sum === total)
    val uniqueTotal = docs.groupBy("source", "text").count().count()
    assert(dup.map(_.getLong(2)).sum === uniqueTotal)
    dup.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) < 10000))
  }

  test("semantics pins: null bucket survives, empty arrays keep their row") {
    val nj = q("q_nullsafe_join")
    val docs = graft.ops.Tables(spark, sf, "documents")
    assert(nj.map(_.getLong(1)).sum === docs.count(),
      "null-safe join must keep every row, including NULL keys")
    val nullBucket = nj.find(_.getString(0) == "<null>")
    assert(nullBucket.isDefined, "the NULL bucket must survive the join")
    assert(nullBucket.get.getLong(1) ===
      docs.filter(col("doc_id") % 7 === 0).count())

    val eo = q("q_explode_outer")
    assert(eo.length === docs.count().toInt,
      "explode_outer must keep every document")
    eo.foreach { r =>
      if (r.getLong(2) == 0) assert(r.getLong(1) === 1,
        "an empty gram array must still yield exactly one NULL row")
      else assert(r.getLong(1) === r.getLong(2))
    }
  }

  test("q_stream_chained equals the batch two-level rollup") {
    val streaming = q("q_stream_chained").map(_.toSeq).toSet
    val batch = events
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(col("w.start"), "1 hour"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_minutes"))
      .select(col("event_type"), unix_micros(col("window.start")).as("hs"),
        col("n_events"), col("n_minutes"))
      .collect().map(_.toSeq).toSet
    assert(streaming === batch)
  }

  // ---- mergeable quantile sketch: worst-case certificate under any order --

  test("QSketchBuffer: rank certificate holds under random merge trees and orders") {
    import graft.functions.QSketchBuffer
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      // adversarial-ish inputs: duplicates, skew, sorted and shuffled runs
      val n = 5000 + trial * 3000
      val data: Array[Long] = trial match {
        case 0 => Array.tabulate(n)(i => i.toLong)                 // sorted
        case 1 => Array.tabulate(n)(i => (n - i).toLong)           // reverse
        case 2 => Array.fill(n)(rnd.nextInt(50).toLong)            // heavy dup
        case 3 => Array.fill(n)((rnd.nextGaussian() * 1e6).toLong) // spread
        case _ => Array.fill(n)(math.abs(rnd.nextLong()) % 997)    // mod skew
      }
      // random partitioning into 1..24 chunks, merged in a random tree order
      val chunks = data.grouped(1 + rnd.nextInt(data.length / 8 + 1)).toArray
      val bufs = scala.collection.mutable.ArrayBuffer(chunks.map { c =>
        val b = new QSketchBuffer(128)
        c.foreach(b.add)
        b
      }: _*)
      while (bufs.length > 1) {
        val i = rnd.nextInt(bufs.length)
        val a = bufs.remove(i)
        val j = rnd.nextInt(bufs.length)
        bufs(j).mergeWith(a)
      }
      val sk = bufs.head
      assert(sk.total == data.length.toLong)
      val sorted = data.sorted
      for (ppm <- Seq(0L, 100000L, 250000L, 500000L, 900000L, 990000L, 1000000L)) {
        val est = sk.estimate(ppm)
        val target = math.max(1L, (ppm * sk.total + 999999L) / 1000000L)
        val rLo = sorted.count(_ < est).toLong  // #{x < est}
        val rHi = sorted.count(_ <= est).toLong // #{x ≤ est}
        assert(rLo < target + sk.errBound,
          s"trial=$trial ppm=$ppm est=$est rLo=$rLo target=$target eb=${sk.errBound}")
        assert(rHi >= target - sk.errBound,
          s"trial=$trial ppm=$ppm est=$est rHi=$rHi target=$target eb=${sk.errBound}")
      }
      // the certificate is useful, not vacuous: errBound ≪ N
      assert(sk.errBound.toDouble / sk.total < 0.15,
        s"errBound=${sk.errBound} total=${sk.total}")
    }
  }

  test("q_embed_rproject preserves pairwise distances within JL distortion") {
    import spark.implicits._
    val proj = q("q_embed_rproject")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3.toDouble).toArray
      }
    val orig = graft.ops.Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr(graft.ops.Tables.fpVecSpark).as("vf"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toArray.sorted.take(40)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      od = d2(orig(ids(i)), orig(ids(j))) if od > 0
    } yield d2(proj(ids(i)), proj(ids(j))) / 16.0 / od
    // E[(Σᵢ vᵢ·sᵢⱼ)²] = ‖v‖² per output dim, so E[‖Pv‖²] = k‖v‖² with
    // the raw-sum dims (no 1/√k folded in) — the ratio d²(proj)/k/d²(orig)
    // centers on 1; individual pairs may wander (16 dims is coarse).
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.length / 2)
    assert(median > 0.6 && median < 1.6, s"median distortion $median")
    assert(ratios.count(r => r > 0.2 && r < 5.0) > ratios.length * 0.95)
  }

  test("q_quantile_sketch: exact quantiles match a driver-side sort, gate true") {
    val rows = q("q_quantile_sketch")
    assert(rows.length == 1)
    val r = rows.head
    val vals = graft.ops.Tables(spark, sf, "events")
      .select(floor(col("value") * 100 + 0.5).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    def exact(ppm: Long): Long = {
      val target = math.max(1L, (ppm * vals.length + 999999L) / 1000000L)
      vals(target.toInt - 1)
    }
    assert(r.getLong(0) == vals.length.toLong)
    assert(r.getLong(1) == exact(100000L))
    assert(r.getLong(2) == exact(500000L))
    assert(r.getLong(3) == exact(900000L))
    assert(r.getLong(4) == exact(990000L))
    assert(r.getBoolean(5))
  }
  test("q_seasonality_anova matches a naive driver-side one-way ANOVA") {
    val rows = q("q_seasonality_anova")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    // naive reference: group fixed-point values by (type, hour) on the
    // driver, recompute the micro-unit numerators with BigInt
    val raw = events.selectExpr("event_type", "hour(ts) AS hr",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (et, vs) =>
      val byHr = vs.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      val nt = BigInt(vs.size); val st = vs.map(x => BigInt(x._3)).sum
      val k = byHr.size
      var btw = BigInt(0); var wth = BigInt(0)
      byHr.values.foreach { hv =>
        val n = BigInt(hv.size); val s0 = hv.map(BigInt(_)).sum
        val q0 = hv.map(x => BigInt(x) * x).sum
        val d = nt * s0 - n * st
        btw += (d * d * 1000000) / (n * nt * nt)
        wth += ((n * q0 - s0 * s0) * 1000000) / n
      }
      val (gk, gn, gb, gw, gf) = rows(et)
      assert(gk === k.toLong && gn === nt.toLong)
      assert(gb === btw.toLong, s"$et between_micro")
      assert(gw === wth.toLong, s"$et within_micro")
      if (wth > 0 && k > 1 && nt > k) {
        val want = (btw.toDouble * (nt - k).toDouble) /
          (wth.toDouble * (k - 1).toDouble)
        assert(math.abs(gf - want) <= math.abs(want) * 1e-12, s"$et f_stat")
      }
    }
  }

  test("q_image_channel_stats equals the fixture pixel formula") {
    val rows = q("q_image_channel_stats")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows.nonEmpty)
    // recompute three docs from the raw fixture formula
    rows.keys.toSeq.sorted.take(3).foreach { id =>
      val seed = id * 2654435761L
      val w = 8 + (id % 24).toInt; val h = 8 + (id % 16).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = java.lang.Math.floorMod(seed + 31L * x + 17L * y, 16777216L)
        sr += v / 65536; sg += (v / 256) % 256; sb += v % 256
      }
      assert(rows(id) === ((w.toLong * h, sr, sg, sb)), s"doc $id")
    }
  }

}
