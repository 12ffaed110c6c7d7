package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected RangeJoinBucketRule: pure range-condition inner joins must
  * become bucketized hash equi-joins — same answers, no nested-loop plan —
  * and anything outside the narrow match scope must be left untouched. */
class RangeRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val ns = s.newSession() // conf isolation from other suites
    GraftExtensions.register(ns)
    ns
  }

  private def hasBnlj(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    var found = false
    plan.foreach {
      case _: BroadcastNestedLoopJoinExec => found = true
      case _ => ()
    }
    found
  }

  private def points = {
    import spark.implicits._
    // include a null ts and negatives: the rewrite must drop/keep exactly
    // what the original condition does
    (Seq((-25L, 0L), (-3L, 1L), (0L, 2L), (7L, 3L), (99L, 4L), (1000L, 5L))
      .map { case (t, i) => (Option(t), i) } :+ ((None: Option[Long], 6L)))
      .toDF("t", "pid")
  }

  private def intervals = {
    import spark.implicits._
    (Seq((-30L, -20L, 10L), (-5L, 5L, 11L), (0L, 99L, 12L), (98L, 300L, 13L),
      (500L, 400L, 14L)) // inverted interval: matches nothing
      .map { case (a, b, i) => (Option(a), Option(b), i) } :+
      ((None: Option[Long], Option(50L), 15L))) // null lo: matches nothing
      .toDF("lo", "hi", "iid")
  }

  private def naive: Seq[(Long, Long)] = {
    spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "0")
    val want = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    want
  }

  test("rewritten range join: same rows, no nested-loop join") {
    val want = naive
    spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "10")
    try {
      val df = points.join(intervals,
          col("t") >= col("lo") && col("t") <= col("hi"))
        .select("pid", "iid")
      assert(!hasBnlj(df), "rule should have produced a hash equi-join")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want)
      assert(want.nonEmpty)
    } finally spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "0")
  }

  test("mirrored operand order and sides rewrite too") {
    val want = naive
    spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "7")
    try {
      // bounds written backwards, interval side on the left
      val df = intervals.join(points,
          col("lo") <= col("t") && col("hi") >= col("t"))
        .select("pid", "iid")
      assert(!hasBnlj(df))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want)
    } finally spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "0")
  }

  test("property: rewrite equals the naive join on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def maybeNull(v: Long): Option[Long] = if (rnd.nextInt(20) == 0) None else Some(v)
    val pts = (1L to 300L).map(i =>
      (maybeNull(rnd.nextLong(1001) - 500), i)).toDF("t", "pid")
    val ivs = (1000L to 1100L).map { i =>
      val lo = rnd.nextLong(1001) - 500
      val span = rnd.nextLong(120) - 20 // ~1/6 inverted intervals
      (maybeNull(lo), maybeNull(lo + span), i)
    }.toDF("lo", "hi", "iid")
    def run(): Seq[(Long, Long)] =
      pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "0")
    val want = run()
    assert(want.nonEmpty)
    try {
      for (w <- Seq("1", "7", "100", "100000")) {
        spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, w)
        assert(run() == want, s"mismatch at width $w")
      }
    } finally spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "0")
  }

  test("disabled by default; equi-keyed and extra-conjunct joins untouched") {
    // width unset -> the BNLJ plan (and correct answers) remain
    spark.conf.unset(graft.plans.RangeJoinBucketRule.WidthConf)
    val df0 = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid")
    assert(hasBnlj(df0), "without the conf the plan stays a BNLJ")

    spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "10")
    try {
      // an equality conjunct makes the join hashable already: out of scope
      val dfEq = points.join(intervals,
          col("pid") === col("iid") && col("t") >= col("lo") && col("t") <= col("hi"))
      assert(dfEq.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.isEmpty, "equi-keyed join must not be rewritten")
    } finally spark.conf.set(graft.plans.RangeJoinBucketRule.WidthConf, "0")
  }
}
