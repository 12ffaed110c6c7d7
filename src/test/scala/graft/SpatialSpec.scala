package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SpatialOps

/** Grid-bucketed radius join: result-identical to the quadratic
  * definition (including exactly-once pair production), and the
  * persisted index probe result-identical to the direct join. */
class SpatialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Deterministic scattered points, including exact-duplicate positions
    * and cell-boundary-straddling neighbors (the grid join's edge cases). */
  private def pts(n: Int, salt: Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      val h = (i * 2654435761L + salt * 40503L) & 0x7fffffffL
      (i.toLong, h % 1000L, (h / 1000L) % 1000L)
    }.toDF("lid", "x", "y")
  }

  private def naive(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)],
      rad: Long): Set[(Long, Long, Long)] =
    (for {
      (li, lx, ly) <- l; (ri, rx, ry) <- r
      d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
      if d2 <= rad * rad
    } yield (li, ri, d2)).toSet

  test("gridRadiusJoin equals the quadratic definition, each pair exactly once") {
    val left = pts(120, 1)
    val right = pts(90, 2).withColumnRenamed("lid", "rid")
    for (rad <- Seq(50L, 137L, 400L)) {
      val got = SpatialOps.gridRadiusJoin(left, right, rad).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = naive(
        left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
        right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))), rad)
      assert(got.length == got.toSet.size, s"r=$rad produced duplicate pairs")
      assert(got.toSet == want, s"r=$rad mismatch: got ${got.length}, want ${want.size}")
    }
  }

  test("probeGridIndex equals the direct grid join on the probed subset") {
    val corpus = pts(150, 3).withColumnRenamed("lid", "rid")
    val delta = pts(40, 4)
    val rad = 80L
    val idx = java.nio.file.Files.createTempDirectory("graft_grid_spec").toString
    SpatialOps.buildGridIndex(corpus.withColumnRenamed("rid", "lid"), rad, idx)
    val direct = SpatialOps.gridRadiusJoin(delta, corpus, rad).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val probed = SpatialOps.probeGridIndex(spark, idx, delta, rad).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probed == direct, "index probe must be lossless vs the direct join")
    assert(direct.nonEmpty, "fixture should produce at least one near pair")
  }
}
