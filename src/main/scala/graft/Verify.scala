package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import scala.collection.mutable

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Robustness contract (round-1 lesson: CORRECTNESS_r01.json came back
  * empty despite a local 59/59 pass): oracle_sql.json is written FIRST so
  * a timeout-kill mid-run still leaves the oracle inputs; per-query status
  * is flushed to verify_status.json after EVERY query; the final stdout
  * line is a bare JSON summary (StdoutOutput + stderr-only log4j keep it
  * clean for the driver's parser).
  *
  * Round-4 lesson: CORRECTNESS_r01..03 were all `{}` while BENCH_r03
  * parsed, pointing at the verify leg's WALL CLOCK (88 sequential queries
  * ≈ 8 min incl. compile). Queries now run CONCURRENTLY through a fixed
  * pool (default 8, `SPARK_GRAFT_VERIFY_PAR` overrides): Spark's scheduler
  * interleaves independent jobs on one local[N] context, every query
  * writes its own output dir, and the known-slow tier is submitted first
  * to minimize makespan. Per-query isolation is unchanged — each runs
  * under QueryRunner's job-group + timeout, so one hang costs its slot,
  * not the run. */
object Verify {

  /** Slow tier from bench history, submitted first so the pool's tail is
    * short queries instead of a 4 s golden starting at minute N. */
  private val slowFirst = Seq(
    "q_audio_decode", "q_audio_resample", "q_pagerank", "q_triangle",
    "q_assoc_rules", "q_setsim_join", "q_dedup_span", "q_bfs_hops",
    "q_ann_int8_gate", "q_ann_int8", "q_stream_dedup_ingest",
    "q_stream_chained", "q_stream_sliding",
    "q_stream_upsert", "q_stream_stream_join", "q_stream_left_join",
    "q_stream_session", "q_corpus_golden", "q_dedup_ngram",
    "q_zillow_golden", "q_flights_golden",
    "q_dedup_embed_lsh", "q_bucketed_join", "q_salted_join",
    "q_multimodal_resize", "q_stream_join", "q_stream_dedup",
    "q_stream_user_counts", "q_stream_window", "q_csv_roundtrip",
    "q_partition_overwrite", "q_ann_lsh", "q_semdedup", "q_kmeans_embed",
    "q_ann_ivf_indexed", "q_dedup_embed_groundtruth", "q_dedup_minhash",
    "q_dedup_clusters", "q_pipeline_golden", "q_dedup_delta")

  def main(args: Array[String]): Unit = {
    // LENIENT argv: an exact-arity destructure would die in a MatchError
    // before anything is written if the driver ever passes an extra flag
    // or omits an arg — precisely the silent empty-artifact shape.
    // First two args win; missing ones fall back to env/defaults, and
    // the resolved paths are echoed to stderr for the post-mortem.
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val outDir = args.lift(1).getOrElse("/tmp/graft_verify")
    if (args.length != 2)
      System.err.println(
        s"[verify] argv=${args.mkString("[", ",", "]")} -> sfDir=$sfDir outDir=$outDir")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run — an iteration aid like
    // Bench's; the driver never sets it, so official runs dump everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)

    // Oracle SQL first: it is pure metadata, and the driver needs it even
    // if a later query hangs and the process is killed.
    val oracleJson = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)

    val all = SparkEntry.queries
      .filter { case (k, _) => only.forall(_.contains(k)) }
    val order = slowFirst.filter(all.contains) ++
      all.keys.toSeq.filterNot(slowFirst.contains).sorted

    val status = mutable.LinkedHashMap.empty[String, String]
    order.foreach(status(_) = "pending")
    val lock = new Object
    def record(name: String, st: String): Unit = lock.synchronized {
      status(name) = st
      val body = status.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/verify_status.json"), body)
    }

    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "8").toInt
    val pool = Executors.newFixedThreadPool(par, (r: Runnable) => {
      val t = new Thread(r, "graft-verify"); t.setDaemon(true); t
    })
    order.foreach { name =>
      val fn = all(name)
      pool.submit(new Runnable {
        def run(): Unit = {
          val t0 = System.nanoTime()
          val st = QueryRunner.timed(spark, name) {
            // Contract: the result must land at outDir/<name>.parquet. Spark
            // can only write a directory, so write to a scratch dir and move
            // the single coalesced part file to the exact path (readable by
            // any parquet reader, no glob needed).
            val tmp = s"$outDir/.tmp_$name"
            fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
            val part = new java.io.File(tmp).listFiles()
              .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
              .getOrElse(sys.error(s"no part file in $tmp"))
            val dest = Paths.get(s"$outDir/$name.parquet")
            Files.deleteIfExists(dest)
            Files.move(part.toPath, dest)
            new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
          } match {
            case Right(_) => "ok"
            case Left(why) => why
          }
          // One status line per query to stderr (stdout stays a single
          // JSON summary line for the driver's parser) — a killed run
          // still leaves a per-query post-mortem trail in the log.
          val secs = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[verify] $name%-28s $st%-8s ${secs}%6.1fs")
          record(name, st)
        }
      })
    }
    pool.shutdown()
    // 10-minute drain ceiling: typical full-registry wall is ~45 s at
    // sf0.01 (8 workers) and every query already carries its own 300 s
    // job-group timeout, so a pool that hasn't drained in 10 min is a
    // genuine hang — fail fast INSIDE the driver's round budget (the old
    // 60-min ceiling exceeded it, turning a hang into an empty artifact).
    pool.awaitTermination(10, TimeUnit.MINUTES)
    // Per-query persisted frames (LSH signatures, CC labels, …) are NOT
    // dropped mid-run anymore — a global clearCache would evict a
    // concurrent query's working set. At verify SF the accumulated
    // storage is tiny and MEMORY_AND_DISK spills anyway.
    spark.sqlContext.clearCache()
    val nOk = status.valuesIterator.count(_ == "ok")
    spark.stop()
    println(s"""{"verify_ok":$nOk,"verify_total":${status.size},"out":"$outDir"}""")
    System.out.flush()
  }
}
