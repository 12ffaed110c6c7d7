package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene guards: the properties that decide 100 TB behavior are
  * asserted here so a regression fails a test, not a benchmark. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // static plans: AQE would hide join/scan nodes behind AdaptiveSparkPlan
      .config("spark.sql.adaptive.enabled", "false")
      // default 100 truncates PushedFilters lists mid-entry
      .config("spark.sql.maxMetadataStringLength", "10000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, dir).queryExecution
    qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
  }

  test("q6: filters reach the parquet scan; only needed columns read") {
    val p = planOf("q6_filter_agg")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("GreaterThan(l_shipdate"), "shipdate filter not pushed")
    // projection pruning: a 16-column lineitem scan must not appear
    assert(!p.contains("l_comment"), "scan reads unneeded columns")
  }

  test("q19: join is broadcast, not shuffled-both-sides") {
    val p = planOf("q19_join_filter")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q14: part dim is broadcast; lineitem date filters reach the scan") {
    val p = planOf("q14_promo_share")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "lineitem date filter not pushed to the parquet scan")
  }

  test("q1: aggregation runs inside WholeStageCodegen with partial agg") {
    val p = planOf("q1_agg")
    assert(p.contains("*(1)"), "no WholeStageCodegen stage markers")
    assert(p.contains("partial_"), "no map-side partial aggregation")
  }

  test("fold aggregates stay in the SQL engine (no RDD scan)") {
    val p = planOf("q_agg_fold_bykey")
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Scan ExistingRDD"), "fold dropped to the RDD layer")
  }

  test("range join plans as a hash equi-join, never nested-loop") {
    val p = planOf("q_range_join")
    assert(p.contains("HashJoin"), p.take(2000))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("asof join is one partition-local sort window, no join node at all") {
    val p = planOf("q_asof_join")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("text metrics use native kernels, not interpreted lambdas") {
    val p = planOf("q_text_quality")
    assert(p.contains("token_stats") && p.contains("word_list_hits"))
    assert(!p.contains("lambdafunction"), "interpreted HOF in text hot path")
  }

  test("split/mix assignment is a pure map: no exchange anywhere") {
    val p = planOf("q_split_assign")
    assert(!p.contains("Exchange"), "deterministic split must not shuffle")
    // mix is filter→aggregate: exactly ONE exchange (the groupBy), the
    // sampling filter itself adds none
    val p2 = SparkEntry.queries("q_mix_sources")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(p2).size == 1,
      s"mix should shuffle once (final agg only):\n${p2.take(2000)}")
  }

  test("decontamination broadcasts the benchmark grams, never shuffles the corpus join") {
    val p = planOf("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("shingle_hashes"), "gram hashing not native")
    assert(!p.contains("lambdafunction"), "interpreted HOF in gram path")
  }

  test("corpus golden: no shuffle keys on raw/normalized document text") {
    // Exact-dedup must shuffle the 16-byte md5, never the document: a
    // partitioning expression containing the text normalization means the
    // full text became the exchange key (≈2× shuffle bytes at 100 TB).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // the dedup sits under a persist() → descend into cached subplans too
    def allPlans(p: SparkPlan): Seq[SparkPlan] =
      p +: p.collect { case s: InMemoryTableScanExec => s.relation.cachedPlan }
        .flatMap(allPlans)
    val root = SparkEntry.queries("q_corpus_golden")(spark, dir)
      .queryExecution.executedPlan
    try {
      val plans = allPlans(root)
      val exchanges = plans.flatMap(_.collect { case e: ShuffleExchangeLike => e })
      assert(exchanges.nonEmpty, "expected at least the dedup + final agg exchanges")
      exchanges.foreach { e =>
        val part = e.outputPartitioning.toString
        assert(!part.contains("regexp_replace") && !part.contains("text#"),
          s"exchange keyed on document text: $part")
      }
      // and the dedup agg is partial (map-side min) on the hash
      assert(plans.exists(_.toString.contains("partial_min")),
        "dedup lost map-side partial aggregation")
    } finally spark.sqlContext.clearCache()
  }

  test("repetition stats run as one native kernel call") {
    val p = planOf("q_quality_repetition")
    assert(p.contains("ngram_repetition"), p.take(2000))
    assert(!p.contains("lambdafunction"), "interpreted HOF in repetition path")
    assert(!p.contains("Exchange"), "per-doc stats must not shuffle")
  }

  test("boilerplate removal: frequent-set membership joins by broadcast " +
    "and line frequencies key on the 64-bit hash, not the line text") {
    val p = planOf("q_boilerplate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("xxhash64"), "line key is not hashed")
    assert(!p.contains("hashpartitioning(_line"),
      "line-frequency exchange keyed on raw line text")
  }

  test("runtime bloom-filter join pruning injects might_contain on the fact scan") {
    // The runtime row-level filter: a selective dim side builds a bloom
    // filter that prunes fact rows BEFORE the join shuffle — at 100 TB
    // this is the difference between shuffling the whole fact table and
    // shuffling the matching slice. Size thresholds are lowered so the
    // sf0.001 fixture qualifies; production leaves the defaults.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // tiny fixture sides would broadcast, and the rule only fires on
      // probable SHUFFLE joins (a broadcast join already prunes at probe)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> scala.util.Try(conf.get(k)).toOption }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain(") && plan.contains("bloom_filter_agg("),
        s"expected a runtime bloom filter in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted aggregation runs two distinct aggregation phases") {
    val p = planOf("q_salted_agg")
    // phase 1 keys on (event_type, _salt), phase 2 on event_type alone —
    // both must appear as separate hash aggregates with an exchange
    // between them (the skew-spreading point of the pattern)
    assert(p.contains("_salt"), "salt key missing from the plan")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 4, // 2 logical phases × (partial + final) each
      s"expected two full aggregation phases, saw $aggs HashAggregates")
  }

  test("winnowing fingerprint build stays a map-only pass: no exchange") {
    val qe = graft.ops.CorpusOps
      .winnowing(graft.ops.Tables(spark, dir, "documents")).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("Exchange"), s"winnowing must not shuffle:\n${p.take(1500)}")
    // native kernel, exactly once, inside codegen — no interpreted
    // lambda chain (the HOF spelling this replaced needed a let-binding
    // to dodge an O(n²) optimizer inline: the q_winnow_dedup sf0.1
    // timeout)
    val kernels = "winnowing_fps".r.findAllIn(qe.optimizedPlan.toString).size
    assert(kernels == 1, s"expected one winnowing_fps kernel, saw $kernels")
    assert(!qe.optimizedPlan.toString.contains("lambdafunction"),
      "winnowing must not fall back to interpreted lambdas")
  }

  // Both near-dup pipelines end in localCheckpoint (cache-hygiene
  // contract), which collapses the executed plan to a LogicalRDD — so
  // these two assert on the checkpoint-free overloads, the real plans.
  test("winnow dedup joins by fingerprint equi-keys, never nested-loop") {
    val qe = graft.ops.CorpusOps.winnowOverlapPairs(
      graft.ops.Tables(spark, dir, "documents"), dfCap = 20L, minShared = 3L,
      checkpoint = false).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"pair generation must be an equi-join:\n${p.take(1500)}")
  }

  test("spatial radius join is a grid-cell equi-join, never nested-loop") {
    for (q <- Seq("q_spatial_join", "q_spatial_neardup")) {
      val p = planOf(q)
      assert(p.contains("HashJoin"), s"$q: expected hash equi-join\n${p.take(1500)}")
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q: grid bucketing must avoid the quadratic join:\n${p.take(1500)}")
    }
  }

  test("DSIR ratio table joins back by broadcast (no candidate-side wide shuffle)") {
    val p = planOf("q_dsir_select")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("image near-dup joins on banded chunks with bit_count confirm") {
    val imgs = graft.multimodal.Multimodal.withPngPayload(
      graft.ops.Tables(spark, dir, "documents").select("doc_id").limit(50), "doc_id")
    val qe = graft.multimodal.Multimodal.imageNearDupDHash(
      imgs, "doc_id", "payload", maxHamming = 3, checkpoint = false).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"dHash banding must be an equi-join:\n${p.take(1500)}")
    assert(p.contains("bit_count"), "exact hamming confirm missing")
  }
}
