package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TpchOps

/** The oracle (scripts/check.py) proves value equality vs DuckDB; these
  * cover what the oracle can't — that the DECORRELATED plans equal the
  * canonical correlated-subquery semantics they replace. */
class TpchOpsSpec extends AnyFunSuite {

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

  private def q(name: String) =
    TpchOps.all.find(_.name == name).get.fn(spark, sf)

  test("all seven remaining TPC-H shapes produce rows at sf0.001") {
    for (e <- TpchOps.all) {
      val n = e.fn(spark, sf).count()
      assert(n > 0, s"${e.name} returned no rows")
    }
    // q2/q11/q21 persist derived aggregates (harness-released in the
    // driver protocol); release here so later suites sharing the session
    // can assert cache emptiness
    spark.sqlContext.clearCache()
  }

  test("q21 single-shuffle decorrelation equals the correlated EXISTS form") {
    // Canonical Q21: late line l1 such that EXISTS another-supplier line
    // and NOT EXISTS another-supplier LATE line — run verbatim through
    // Spark SQL's own correlated-subquery planner as the reference
    // semantics, and compare with the aggregated reformulation.
    Seq("lineitem", "orders", "supplier", "nation").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }
    val naive = spark.sql(
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |  JOIN orders ON l1.l_orderkey = o_orderkey
        |  JOIN supplier ON l1.l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_19'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY s_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = q("q21_waiting_orders")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == naive)
  }

  test("q2 rejoin keeps exactly the per-part min-cost suppliers") {
    val rows = q("q2_min_cost_supplier").collect()
    // within the result, every part appears only at one cost (its min)
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    for ((p, rs) <- byPart)
      assert(rs.map(_.getAs[Double]("unit_cost")).distinct.length == 1,
        s"part $p surfaced at more than one cost")
  }

  test("q11 threshold keeps only above-fraction parts and no others") {
    val vals = q("q11_important_stock").collect()
      .map(_.getAs[Double]("part_value"))
    assert(vals.nonEmpty)
    val total = vals.sum // survivors alone can't be checked against the
    // full total here; the oracle does that — just check internal sanity
    assert(vals.forall(_ > 0.0) && total > 0.0)
  }
}
