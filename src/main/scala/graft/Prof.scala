package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AnalyticsOps, Tables}

/** Scratch profiling main (dev only, not part of the library surface).
  * Current focus: attribute q_triangle / q_pagerank cost across their
  * stages (round-5 slow-tier pass; both sit at ~4.2-4.5 s in BENCH while
  * every other batch query is under 3 s). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val s = spark

    def time[T](label: String)(f: => T): Unit = {
      (1 to 3).foreach { i =>
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime(); f
        println(f"PROF $label#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    def lineitem = Tables(s, d, "lineitem")
    def orders   = Tables(s, d, "orders")

    // ---- q_triangle stages ----
    def co = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS s, y AS d))))"))
        .as("pr"))
      .groupBy(col("pr.s").as("s"), col("pr.d").as("d"))
      .agg(count(lit(1)).as("w"))
    time("T1 co-graph")   { co.count() }
    time("T2 sparsify")   { AnalyticsOps.topKAffinity(co, 8).count() }
    time("T3 triangles")  { AnalyticsOps.triangleCounts(AnalyticsOps.topKAffinity(co, 8)).count() }
    time("T4 full")       { SparkEntry.queries("q_triangle")(s, d).count() }

    // ---- q_pagerank stages ----
    def g = lineitem.select("l_orderkey", "l_suppkey")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("w"))
    def edges = g.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"), col("w"))
      .unionAll(g.select((col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst"), col("w")))
    time("P1 edges")      { edges.count() }
    time("P2 full")       { SparkEntry.queries("q_pagerank")(s, d).count() }
    spark.stop()
  }
}
