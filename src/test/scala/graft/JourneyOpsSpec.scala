package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AnalyticsOps, JourneyOps}

/** Hand-built-fixture checks for the journey/audit tranche — each
  * operator against a case where the expected answer is computed by
  * hand, so an oracle that shares a bug with the implementation can't
  * mask it. */
class JourneyOpsSpec extends AnyFunSuite {

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

  private def ev(rows: (Long, String, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "event_type", "ts_s", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"), col("event_id"))
  }

  test("transitions: counts and basis points on a known sequence") {
    // user 1: a b a b  -> a>b ×2, b>a ×1; user 2: a a -> a>a ×1
    val e = ev(
      (1L, "a", "2024-01-01 00:00:01", 1L), (1L, "b", "2024-01-01 00:00:02", 2L),
      (1L, "a", "2024-01-01 00:00:03", 3L), (1L, "b", "2024-01-01 00:00:04", 4L),
      (2L, "a", "2024-01-01 00:00:01", 5L), (2L, "a", "2024-01-01 00:00:02", 6L))
    val got = JourneyOps.transitions(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // src a: 3 transitions total -> a>b 2/3 = 6666bp, a>a 1/3 = 3333bp
    assert(got == Set(("a", "b", 2L, 6666L), ("a", "a", 1L, 3333L), ("b", "a", 1L, 10000L)))
  }

  test("topPaths: session break at gap, path order by time") {
    val e = ev(
      (1L, "view", "2024-01-01 00:00:00", 1L), (1L, "click", "2024-01-01 00:30:00", 2L),
      (1L, "buy", "2024-01-02 12:00:00", 3L), // > 6h later: new session
      (2L, "view", "2024-01-01 00:00:00", 4L), (2L, "click", "2024-01-01 00:30:00", 5L))
    val got = JourneyOps.topPaths(e, gapMicros = 21600000000L, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view>click" -> 2L, "buy" -> 1L))
  }

  test("mergeIntervals: overlap merges, touching merges (half-open), gap splits") {
    // spans of 10 s; user 1: [0,10) [5,15) overlap; [15,25) touches -> same
    // island (s == prev max end is NOT a break); [100,110) is a new island
    val e = ev(
      (1L, "x", "2024-01-01 00:00:00", 1L), (1L, "x", "2024-01-01 00:00:05", 2L),
      (1L, "x", "2024-01-01 00:00:15", 3L), (1L, "x", "2024-01-01 00:01:40", 4L))
    val got = JourneyOps.mergeIntervals(e, spanMicros = 10000000L)
      .select("island", "i_start", "i_end", "n_ev").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    assert(got == Set(
      (1L, t0, t0 + 25000000L, 3L),
      (2L, t0 + 100000000L, t0 + 110000000L, 1L)), s"got=$got")
  }

  test("pitJoin: same-day churn collapses to last-by-seq; pre-history events unmatched") {
    import spark.implicits._
    val feed = Seq(
      // custkey 1: day1 has seq 10 'A' then seq 11 'B' (daily last = B),
      // day3 changes to 'C'
      (1L, "2024-01-01 00:00:00", 10L, "A"),
      (1L, "2024-01-01 00:00:00", 11L, "B"),
      (1L, "2024-01-03 00:00:00", 12L, "C"))
      .toDF("custkey", "ts_s", "seq", "status")
      .select(col("custkey"), col("ts_s").cast("timestamp").as("ts"),
        col("seq"), col("status"))
    val e = ev(
      (1L, "x", "2023-12-31 00:00:00", 1L), // before any version -> null
      (1L, "x", "2024-01-02 00:00:00", 2L), // sees day-1 last = B, never A
      (1L, "x", "2024-01-03 00:00:00", 3L)) // eff_from == ts inclusive -> C
    val got = JourneyOps.pitJoin(e, feed).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got == Map(1L -> None, 2L -> Some("B"), 3L -> Some("C")), s"got=$got")
  }

  test("fdDiscovery: held and violated dependencies") {
    import spark.implicits._
    val df = Seq((1L, "x", "p"), (2L, "x", "p"), (3L, "y", "q"), (4L, "y", "r"))
      .toDF("id", "a", "b")
    val got = AnalyticsOps.fdDiscovery(df, Seq("id" -> "a", "a" -> "b", "b" -> "a"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(4))).toSet
    // id is a key -> id->a holds; a->b violated (y maps to q and r);
    // b->a holds (p->x, q->y, r->y)
    assert(got == Set(("id", "a", true), ("a", "b", false), ("b", "a", true)))
  }

  test("fkAudit: orphans counted, matched rows not") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq((1L, "r1"), (1L, "r2"), (3L, "r3"), (4L, "r4")).toDF("ck", "v")
    val got = AnalyticsOps.fkAudit(Seq(("child.ck->parent", child, "ck", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("child.ck->parent", 4L, 3L, 2L)))
  }
}
