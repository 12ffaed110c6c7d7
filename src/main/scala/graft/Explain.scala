package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for the named queries (or a
  * headline set) so pushdown/broadcast/codegen can be inspected per query.
  * Usage: runMain graft.Explain [sfDir] [query ...] */
object Explain {
  val Headline: Seq[String] = Seq(
    "q1_agg", "q6_filter_agg", "q19_join_filter", "q_join_inner",
    "q_dedup_minhash", "q_dedup_ngram", "q_dedup_embed_lsh",
    "q_ann_bruteforce", "q_ann_ivf", "q_token_count", "q_window_day",
    "q_asof_join", "q_range_join", "q_zillow_golden", "q_dedup_keep_best")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1 && args(1) == "--audit") audit(spark, sfDir)
    else for (n <- names) {
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }

  /** Sweep every registry query's physical plan for scale red flags:
    * CartesianProduct (unbounded cross) and non-broadcast nested-loop
    * joins (a BNLJ with a broadcast side is fine — that's the intended
    * shape for small-side inequality joins). */
  /** Queries whose UNPARTITIONED window carries a documented bounded-
    * domain license: the window frame is provably small no matter the
    * input size (a grouped low-cardinality domain, a ≤k top set, or an
    * engine-bounded value range), so a single-partition sort over it is
    * not a 100 TB risk. Anything NOT listed here that plans a global
    * window counts as a red flag — the check exists because a global
    * row_number()/ntile() over a key-cardinality frame is the one window
    * shape that cannot scale (Scale.globalRank is the replacement; see
    * q_power_curve / q_skew_report). */
  private val globalWindowLicensed: Map[String, Int] = Map(
    // Counts match the round-8 audit exactly; queries whose plans no
    // longer contain an unpartitioned window carry NO dormant license
    // (q_percentile/q_weighted_median/q_percent_rank/q_gini were
    // delisted — if a global window returns there, the audit flags it).
    "q_life_table" -> 1,      // dur_days domain (bounded calendar span)
    "q_label_index" -> 2,     // distinct langs/sources (tiny domains)
    "q_quantile_sketch" -> 1, // distinct fixed-point value domain
    "q_ks_test" -> 1,         // distinct fixed-point value domain
    "q_hybrid_rank" -> 1,     // ≤k-row top sets per leg
    "q_skyline" -> 1,         // per-p_size grouped domain (bounded sizes)
    "q_mix_temperature" -> 1  // per-source grouped domain (tiny)
  )

  def audit(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.WindowExec
    // static plans: AQE would wrap the tree in AdaptiveSparkPlanExec and
    // hide join nodes until execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var bad = 0
    for (n <- SparkEntry.queries.keys.toSeq.sorted) {
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan
        val cart = plan.collectWithSubqueries { case c: CartesianProductExec => c }
        val bnlj = plan.collectWithSubqueries { case j: BroadcastNestedLoopJoinExec => j }
        val gwin = plan.collectWithSubqueries {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (cart.nonEmpty) { bad += 1; println(s"AUDIT $n: CARTESIAN PRODUCT") }
        else if (gwin.nonEmpty && !globalWindowLicensed.contains(n)) {
          bad += 1; println(s"AUDIT $n: GLOBAL WINDOW x${gwin.size} (unlicensed)")
        }
        // the license caps a WINDOW COUNT, not just the query name: a
        // licensed query that grows a second unpartitioned window (or
        // swaps its bounded-domain window for a key-cardinality one
        // alongside it) regresses loudly instead of passing silently
        else if (gwin.nonEmpty && gwin.size > globalWindowLicensed(n)) {
          bad += 1
          println(s"AUDIT $n: GLOBAL WINDOW x${gwin.size} exceeds license (${globalWindowLicensed(n)})")
        }
        else if (gwin.nonEmpty)
          println(s"AUDIT $n: global-window x${gwin.size} [licensed: bounded domain]")
        else if (bnlj.nonEmpty) println(s"AUDIT $n: bnlj(broadcast) x${bnlj.size} [ok]")
      } catch { case e: Throwable => println(s"AUDIT $n: plan failed ${e.getMessage}") }
    }
    println(s"AUDIT done, $bad red flags")
  }
}
