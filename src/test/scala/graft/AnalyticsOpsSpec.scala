package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AnalyticsOps

/** Property checks for the analytics tranche, independent of the DuckDB
  * oracle: each operator is compared against a brute-force in-memory
  * reference on small inputs, so a same-bug-both-sides oracle slip can't
  * hide an algorithmic error. */
class AnalyticsOpsSpec extends AnyFunSuite {

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

  test("setSimJoin equals brute-force all-pairs Jaccard (lossless prefix filter)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 't').map(_.toString)
    // clustered docs: near-dup groups share a base token set with light noise
    val docs = (0 until 60).map { i =>
      val base = vocab.filter(_ => rnd.nextBoolean()).toSet ++ Set(vocab(i % 20))
      val noisy =
        if (i % 3 == 0) base
        else if (rnd.nextBoolean()) base + vocab(rnd.nextInt(20))
        else base - base.toSeq(rnd.nextInt(base.size))
      (i.toLong, noisy.toSeq.sorted)
    }.filter(_._2.nonEmpty)
    val df = docs.toDF("doc_id", "toks")
    val got = AnalyticsOps.setSimJoin(df, tPct = 80)
      .select("a_id", "b_id", "inter", "uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      inter = ta.toSet.intersect(tb.toSet).size.toLong
      uni = ta.size + tb.size - inter
      if inter * 100 >= uni * 80
    } yield (a, b, inter, uni)).toSet
    assert(want.nonEmpty, "degenerate fixture: no qualifying pairs")
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("skyline equals brute-force dominance filter, keeps ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(i =>
      (i.toLong, 1 + rnd.nextInt(15), (5 + rnd.nextInt(200)) / 10.0 * 10)) :+
      (301L, 3, 990.0) :+ (302L, 3, 990.0) // deliberate tie on the frontier
    val df = rows.toDF("p_partkey", "p_size", "p_retailprice")
    val got = AnalyticsOps.skyline(df).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    def dominated(p: (Long, Int, Double)) = rows.exists { q =>
      q._1 != p._1 && q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    }
    val want = rows.filterNot(dominated).map(_._1).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.contains(301L) && got.contains(302L), "frontier ties must both survive")
  }

  test("gapFill covers each user's span exactly, zero-fills gaps, forward-fills values") {
    import spark.implicits._
    val ev = Seq(
      // user 1: days 1,1,4 -> span 1..4, gaps 2,3 carry day-1's last value
      (1L, "2024-01-01 10:00:00", 10.0, 1L),
      (1L, "2024-01-01 11:00:00", 11.0, 2L),
      (1L, "2024-01-04 09:00:00", 44.0, 3L),
      // user 2: single day
      (2L, "2024-02-10 00:00:01", 7.5, 4L))
      .toDF("user_id", "ts_s", "value", "event_id")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("value"), col("event_id"))
    val got = AnalyticsOps.gapFill(ev)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    val want = Set(
      (1L, "2024-01-01", 2L, 11.0), // last of the day by ts
      (1L, "2024-01-02", 0L, 11.0), // gap: ffill
      (1L, "2024-01-03", 0L, 11.0),
      (1L, "2024-01-04", 1L, 44.0),
      (2L, "2024-02-10", 1L, 7.5))
    assert(got == want, s"got=$got")
  }

  test("triangleCounts on a known graph: K4 plus a pendant edge") {
    import spark.implicits._
    // K4 on {1,2,3,4} has 4 triangles, each node in 3; node 5 pendant -> 0
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = AnalyticsOps.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sqlContext.clearCache() // release the harness-licensed edge persist
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got=$got")
  }

  test("profile: one row per column with exact ndv/extremes") {
    import spark.implicits._
    val df = Seq(
      (1L, "ant", Some(2.5)), (2L, "bee", None), (3L, "ant", Some(-1.25)))
      .toDF("id", "name", "score")
    val rows = AnalyticsOps.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "name", "score"))
    val id = rows("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 3 && id.getLong(3) == 3)
    assert(id.getLong(6) == 10000L && id.getLong(7) == 30000L) // 1e4-scaled
    val nm = rows("name")
    assert(nm.getLong(3) == 2 && nm.getString(4) == "ant" && nm.getString(5) == "bee")
    val sc = rows("score")
    assert(sc.getLong(2) == 2 && sc.getLong(3) == 2)
    assert(sc.getLong(6) == -12500L && sc.getLong(7) == 25000L)
  }

  test("kCorePeel: K4 core survives, tails and bridges peel away") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node degree 3) + a path 4-5-6 tail + a
    // pendant 7 off node 1: the 3-core is exactly the K4; node 5 starts
    // at degree 2, node 6 and 7 at 1 -- all gone within two rounds, and
    // dropping them must not drag the K4 below k (its internal degrees
    // stay 3).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (1L, 7L)
    ).toDF("s", "d")
    val got = graft.ops.AnalyticsOps.kCorePeel(edges, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=1, one round: only true isolates go; the pendant chain survives
    val oneRound = graft.ops.AnalyticsOps.kCorePeel(edges, k = 1, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }
  test("labelPropagate: two triangles joined by a bridge collapse to min-id communities") {
    import spark.implicits._
    // triangle A = {1,2,3}, triangle B = {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("s", "d")
    val out = graft.ops.AnalyticsOps.labelPropagate(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // triangle A: every member's neighbours contain two A-labels after
    // round 1, so A converges to min id 1
    assert(Seq(1L, 2L, 3L).forall(out(_)._1 == 1L),
      s"triangle A labels: ${Seq(1L, 2L, 3L).map(out(_)._1)}")
    // triangle B members see two B-labels vs at most one bridge label
    val bLabel = out(11L)._1
    assert(Seq(10L, 11L, 12L).forall(out(_)._1 == bLabel))
    assert(bLabel != out(1L)._1, "bridge must not merge the triangles")
    // community_size is consistent with the label partition
    out.values.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.forall(_._2 == vs.size))
    }
  }

  test("labelPropagate is deterministic across reruns") {
    val run = () => graft.ops.AnalyticsOps.all.find(_.name == "q_label_prop").get
      .fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(run() === run())
  }

}
