package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Par, Tables}
import graft.text.Corpus
import graft.text.Corpus.repetitionStats
import graft.text.TextFunctions.langId

/** Scratch profiling main (dev only, not part of the library surface).
  * Current focus: attribute q_corpus_golden's cleared-cache cost across
  * its cascade stages (round-4 task #3 — 9.9 s official vs 3.2 s local). */
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

    def docs = Par.ensureMin(Tables(s, d, "documents"))
    def stats = docs.select(col("doc_id"), col("source"), col("lang"), col("text"),
        graft.text.TextFunctions.tokenStats(col("text")).as("ts"),
        repetitionStats(col("text"), 2).as("rep"),
        langId(col("text")).as("lang_pred"))
      .withColumn("n_tokens", col("ts.n_tokens"))
      .withColumn("n_uniq", col("ts.n_uniq_tokens"))
    def q = Par.filterOnce(stats, col("lang_pred") === col("lang") &&
      col("n_tokens").between(20, 1000) &&
      col("n_uniq") * 10 >= col("n_tokens") * 3 &&
      col("rep.top_count") * 5 <= col("rep.n_ngrams"))
    def dd = q.groupBy(
        md5(graft.dedup.Dedup.normalizeText(col("text")).cast("binary")).as("_h"))
      .agg(min(struct(col("doc_id"), col("source"), col("n_tokens"),
        col("text"))).as("_keep"))
      .select(col("_keep.doc_id").as("doc_id"), col("_keep.source").as("source"),
        col("_keep.n_tokens").as("n_tokens"), col("_keep.text").as("text"))

    time("A0 raw-read")   { s.read.parquet(s"$d/documents.parquet").count() }
    time("A1 tables")     { Tables(s, d, "documents").count() }
    time("A2 ensureMin")  { Par.ensureMin(Tables(s, d, "documents")).count() }
    time("A scan")        { docs.count() }
    time("B stats")       { stats.count() }
    time("C filter")      { q.count() }
    time("D dedup-agg")   { dd.count() }
    time("E decontam")    {
      val ddp = dd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Corpus.decontaminate(ddp.select("doc_id", "text"),
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 5)
        .filter(!col("contaminated")).count()
    }
    time("F full")        { SparkEntry.queries("q_corpus_golden")(s, d).count() }
    spark.stop()
  }
}
