package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Scratch profiling main (dev only, not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    df.count()
    val sh = df.repartition(32).select(col("doc_id").as("_id"),
      Dedup.shingleHashes(col("text"), 3).as("_sh"))
    time("shingle+hash")(sh.select(sum(size(col("_sh")))).collect())
    time("shingle+hash 2")(sh.select(sum(size(col("_sh")))).collect())
    val sig = sh.withColumn("_sig", Dedup.minhashSigOfHashes(col("_sh"), 64))
    time("with 64 sigs")(sig.select(count(element_at(col("_sig"), 1))).collect())
    time("with 64 sigs 2")(sig.select(count(element_at(col("_sig"), 1))).collect())
    val full = Dedup.nearDupMinhash(df, "doc_id", "text", 0.8, 3, 64, 16)
    time("full nearDup 1")(full.count())
    time("full nearDup 2")(
      Dedup.nearDupMinhash(df, "doc_id", "text", 0.8, 3, 64, 16).count())
    val cands = Dedup.lshCandidates(df, "doc_id", "text", 3, 64, 16)
    time("candidates only")(println("cands=" + cands.count()))
    spark.stop()
  }
}
