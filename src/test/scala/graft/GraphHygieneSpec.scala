package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps

/** Library cache hygiene for the iterative graph operators (round-5
  * verdict finding #1): pageRank/bfsHops materialize via eager local
  * checkpoints (RDD blocks outside the SQL cache, freed on GC), so a
  * consumer running many graph calls per session accumulates NOTHING in
  * the cache manager — the same contract DedupHygieneSpec pins for the
  * dedup/ANN entry points. */
class GraphHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // A small symmetric weighted graph: two triangles bridged by one edge.
  private def edges = {
    import spark.implicits._
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 1L),
      (3L, 4L, 1L), (4L, 5L, 3L), (5L, 6L, 1L), (4L, 6L, 2L))
    (e ++ e.map { case (s2, d, w) => (d, s2, w) }).toDF("src", "dst", "w")
  }

  private def assertCacheEmpty(label: String): Unit =
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$label left entries in the SQL cache manager")

  test("pageRank leaves the SQL cache empty and conserves integer mass") {
    spark.sqlContext.clearCache()
    val r = GraphOps.pageRank(edges, iters = 3).collect()
    assertCacheEmpty("pageRank")
    assert(r.length == 6)
    // ranks are exact integers; total mass stays within floor-division
    // slack of the 10^12 scale (each node loses < 1 unit per div)
    val total = r.map(_.getLong(1)).sum
    assert(total > 999999990000L && total <= 1000000000000L, s"mass=$total")
  }

  test("triangleCounts leaves the SQL cache empty and counts each triangle once") {
    spark.sqlContext.clearCache()
    import spark.implicits._
    // oriented low->high edges: triangle {1,2,3} + pendant edge 3->4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val t = graft.ops.AnalyticsOps.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spark.sharedState.cacheManager.isEmpty,
      "triangleCounts left entries in the SQL cache manager")
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("bfsHops leaves the SQL cache empty and returns exact hop minima") {
    spark.sqlContext.clearCache()
    import spark.implicits._
    val seeds = Seq(1L).toDF("node")
    val d = GraphOps.bfsHops(edges, seeds, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assertCacheEmpty("bfsHops")
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 3L))
  }
}
