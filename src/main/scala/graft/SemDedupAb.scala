package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-side A/B probe for [[graft.similarity.KMeans.semDedup]]'s confirm
  * path (VERDICT r11 task #3's measurement leg): runs the operator once
  * with the broadcast confirm and once forced onto the shuffle-confirm
  * fallback (cutoff 0), on the same data, and prints both walls plus an
  * answer-equality check. The A/B record shows what the scale guard
  * costs at the point where it would engage — without it, the fallback's
  * price past 1.5M vectors is asserted, not measured.
  *
  * Usage: run_main.sh graft.SemDedupAb <sfDir> [k] [threshold] [mode]
  * mode: both (default) | broadcast | shuffle. At the oracle's FIXED
  * k=8 the within-cluster pair stream is 2.5e9 rows at 200k vectors —
  * the shuffle leg writes >50 GB of sort spill on one box (measured,
  * killed at 94% disk) — so the k=8 gate runs broadcast-only and the
  * fallback is priced at its intended regime (k ≈ √n, bounded
  * clusters).
  */
object SemDedupAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 8
    val t = if (args.length > 2) args(2).toDouble else 0.42
    val mode = if (args.length > 3) args(3) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.ops.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding")

    def once(cutoff: Long): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val res = graft.similarity.KMeans
        .semDedup(emb, "vec_id", "embedding", k, t, cutoff)
      val dropped = res.filter(!col("kept")).count()
      val total = res.count()
      spark.sqlContext.clearCache()
      (((System.nanoTime() - t0) / 1e9), dropped, total)
    }
    // warmup pass (file index, codegen) on the broadcast path, discarded
    once(if (mode == "shuffle") 0L else Long.MaxValue)
    val (wB, dB, nB) =
      if (mode == "shuffle") (-1.0, -1L, -1L) else once(Long.MaxValue)
    val (wS, dS, nS) =
      if (mode == "broadcast") (-1.0, -1L, -1L) else once(0L)
    val same = mode == "both" && dB == dS && nB == nS
    val n = if (nB >= 0) nB else nS
    val d = if (dB >= 0) dB else dS
    println(f"""{"sf":"$dir","k":$k,"threshold":$t,"mode":"$mode","n":$n,"dropped":$d,"broadcast_sec":$wB%.1f,"shuffle_sec":$wS%.1f,"answers_equal":$same}""")
    spark.stop()
  }
}
