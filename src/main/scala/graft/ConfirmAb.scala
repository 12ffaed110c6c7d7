package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mega-cluster confirm A/B (VERDICT r13 #2 "done" gate): plant one giant
  * near-duplicate cluster — the boilerplate-heavy real-corpus shape — and
  * run the past-cutoff cluster-local SemDeDup confirm under a BOUNDED
  * heap, once with the tile budget forced to Long.MaxValue (single tile =
  * exactly the pre-r14 whole-group buffering) and once with the default
  * 32 MB tiles. The buffered leg must OOM where the tiled leg completes;
  * at a size where both fit, the drop counts must be identical.
  *
  * Usage:
  *   runMain graft.ConfirmAb gen <dir> <nMega> <nNoise> <dim>
  *   runMain graft.ConfirmAb run <dir> <threshold>
  * Legs are selected by the env the caller already controls:
  *   SPARK_DRIVER_MEM bounds the heap (build.sbt javaOptions),
  *   SPARK_GRAFT_CONFIRM_TILE_BYTES picks buffered (=9223372036854775807)
  *   vs tiled (unset = 32 MB default). */
object ConfirmAb {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // small vectorized-reader batches: 32 concurrent scan tasks of
      // wide array rows otherwise need >1.2 GB just to READ the corpus,
      // which would confound the bounded-heap legs (the quantity under
      // test is the CONFIRM's footprint, not the scanner's)
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "gen" :: dir :: nMega :: nNoise :: dim :: Nil =>
        gen(spark, dir, nMega.toLong, nNoise.toLong, dim.toInt)
      case "run" :: dir :: threshold :: Nil =>
        run(spark, dir, threshold.toDouble)
      case other => sys.error(s"usage: gen <dir> <nMega> <nNoise> <dim> | " +
        s"run <dir> <threshold> (got ${other.mkString(" ")})")
    }
    spark.stop()
  }

  /** Deterministic corpus: `nNoise` pseudo-random unit-ish vectors plus
    * `nMega` copies of one base vector with ±1e-3 jitter, ids
    * interleaved so the mega members span the id range (tiles must drop
    * against EARLIER-tile mates, not just in-tile ones). Generated
    * distributed (range + expression), no driver loop. */
  private def gen(spark: SparkSession, dir: String, nMega: Long,
      nNoise: Long, dim: Int): Unit = {
    val n = nMega + nNoise
    // xxhash-seeded elementwise values in [-1, 1); mega rows share base
    // element values h(j) with tiny id-dependent jitter
    val df = spark.range(n).toDF("vec_id")
      .withColumn("_mega", pmod(col("vec_id"), lit(1000)) < lit(1000L * nMega / n))
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)), j =>
        when(col("_mega"),
          (pmod(xxhash64(j), lit(2000L)).cast("double") / 1000d - 1d) +
            (pmod(xxhash64(col("vec_id"), j), lit(2000L)).cast("double") / 1000d - 1d) * 1e-3d)
          .otherwise(
            pmod(xxhash64(col("vec_id"), j, lit(42)), lit(2000L)).cast("double") / 1000d - 1d)
          .cast("float")))
      .drop("_mega")
    df.repartition(32).write.mode("overwrite").parquet(dir)
    val mega = spark.read.parquet(dir)
      .filter(pmod(col("vec_id"), lit(1000)) < lit(1000L * nMega / n)).count()
    println(s"""{"confirm_ab":"gen","dir":"$dir","rows":$n,"mega":$mega,"dim":$dim}""")
  }

  private def run(spark: SparkSession, dir: String, threshold: Double): Unit = {
    val emb = spark.read.parquet(dir).select("vec_id", "embedding")
    val tile = graft.similarity.TiledConfirm.DefaultTileBytes
    // Stage attribution (r15, VERDICT r14 #5): the bounded-heap gap needs
    // a named cause before tile sizing can be blamed — print the top
    // stages (wall, GC, spill) after the run.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    final case class St(id: Int, ms: Long, tasks: Int, gcMs: Long,
        spillMb: Long, shufRMb: Long, shufWMb: Long, name: String)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages.add(St(si.stageId, dur, si.numTasks, m.jvmGCTime,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576,
          m.shuffleReadMetrics.totalBytesRead / 1048576,
          m.shuffleWriteMetrics.bytesWritten / 1048576,
          si.name.takeWhile(_ != '\n'))): Unit
      }
    })
    val t0 = System.nanoTime()
    // k small and fixed: the mega cluster must land in ONE k-means
    // cluster; broadcastConfirmMax=0 forces the cluster-local confirm
    // (the regime under test) at any corpus size.
    val res = graft.similarity.KMeans.semDedup(emb, "vec_id", "embedding",
      k = 4, threshold = threshold, broadcastConfirmMax = 0L)
    val dropped = res.filter(!col("kept")).count()
    val total = res.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener bus settle
    import scala.jdk.CollectionConverters._
    println(f"${"ms"}%8s ${"tasks"}%5s ${"gcMs"}%7s ${"spillM"}%7s ${"shufR"}%6s ${"shufW"}%6s  stage")
    stages.asScala.toSeq.sortBy(-_.ms).take(12).foreach { s =>
      println(f"${s.ms}%8d ${s.tasks}%5d ${s.gcMs}%7d ${s.spillMb}%7d ${s.shufRMb}%6d ${s.shufWMb}%6d  [${s.id}] ${s.name.take(70)}")
    }
    println(f"""{"confirm_ab":"run","dir":"$dir","tile_bytes":$tile,""" +
      f""""threshold":$threshold,"rows":$total,"dropped":$dropped,"wall_sec":$wall%.1f}""")
  }
}
