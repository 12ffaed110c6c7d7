package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-side A/B probe for [[graft.similarity.KMeans.semDedup]]'s confirm
  * path (VERDICT r11 task #3's measurement leg): runs the operator once
  * with the broadcast confirm and once forced onto the cluster-local
  * confirm fallback (cutoff 0), on the same data, and prints both walls
  * plus an answer-equality check. The A/B record shows what the scale
  * guard costs at the point where it would engage — without it, the
  * fallback's price past 1.5M vectors is asserted, not measured.
  *
  * Usage: run_main.sh graft.SemDedupAb <sfDir> [k] [threshold] [mode]
  * mode: both (default) | broadcast | shuffle | natural. `natural` runs
  * ONE pass at the DEFAULT cutoff (nothing forced, no warmup pass) — the
  * VERDICT r12 task-1 shape: past 1.5M vectors the fallback must engage
  * on its own (the engagement is logged to stderr by semDedup itself).
  * At the oracle's FIXED k=8 the within-cluster pair stream is 2.5e9
  * rows at 200k vectors, so the k=8 gate runs broadcast-only and the
  * fallback is priced at its intended regime (k ≈ √n, bounded
  * clusters). */
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
    val default = 1500000L
    // warmup pass (file index, codegen) discarded — skipped in natural
    // mode, whose point is one honest pass exactly as a user would run it
    if (mode != "natural")
      once(if (mode == "shuffle") 0L else Long.MaxValue)
    val (wB, dB, nB) = mode match {
      case "shuffle" => (-1.0, -1L, -1L)
      case "natural" => once(default)
      case _         => once(Long.MaxValue)
    }
    val (wS, dS, nS) =
      if (mode == "broadcast" || mode == "natural") (-1.0, -1L, -1L)
      else once(0L)
    // answers_equal is only DEFINED when both legs ran (ADVICE r12: a
    // hardcoded false in single-leg logs read as a failed parity check)
    val same =
      if (mode == "both") (dB == dS && nB == nS).toString else "null"
    val n = if (nB >= 0) nB else nS
    val d = if (dB >= 0) dB else dS
    // Locale.ROOT formatting (ADVICE r12): the f-interpolator uses the
    // default locale, which can emit comma decimals = invalid JSON
    def f1(v: Double): String =
      if (v < 0) "-1.0" else (math.rint(v * 10) / 10).toString
    println(s"""{"sf":"$dir","k":$k,"threshold":$t,"mode":"$mode","n":$n,"dropped":$d,"broadcast_sec":${f1(wB)},"shuffle_sec":${f1(wS)},"answers_equal":$same}""")
    spark.stop()
  }
}
