package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for the named queries (or a
  * headline set) so pushdown/broadcast/codegen can be inspected per query.
  * Usage: runMain graft.Explain [sfDir] [query ...] */
object Explain {
  val Headline: Seq[String] = Seq(
    "q1_agg", "q6_filter_agg", "q19_join_filter", "q_join_inner",
    "q_dedup_minhash", "q_dedup_ngram", "q_dedup_embed_lsh",
    "q_ann_bruteforce", "q_ann_ivf", "q_token_count", "q_window_day")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
