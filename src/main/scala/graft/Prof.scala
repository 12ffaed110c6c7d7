package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.ops.{CorpusOps, Tables}

/** Scratch profiling main (dev only, not part of the library surface).
  * Current focus: attribute the q_winnow_dedup sf0.1 timeout across its
  * stages (round-6: verify shows >300 s while q_winnowing alone is 0.1 s
  * and the DuckDB-measured candidate fan-out is only ~346k pairs).
  */
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
      (1 to 2).foreach { i =>
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime(); f
        println(f"PROF $label#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val hs = CorpusOps.winnowing(Tables(s, d, "documents"))
      .select(col("doc_id"),
        expr("array_distinct(transform(fps, x -> x div 10000000L))").as("hs"))
    time("W1 hs")  { hs.count() }
    val e = hs.select(col("doc_id"), explode(col("hs")).as("h"))
    time("W2 explode")  { e.count() }
    val df = e.groupBy("h").agg(count(lit(1)).as("c"))
    time("W3 df")  { df.count() }
    val e2 = e.join(df.where(col("c") <= 20L), "h").select("doc_id", "h")
    time("W4 e2")  { e2.count() }
    val p = e2.as("a").join(e2.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 3L)
    time("W5 pairs")  { p.count() }
    spark.stop()
  }
}
