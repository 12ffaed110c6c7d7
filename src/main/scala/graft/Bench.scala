package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): one warmup pass over every registry
  * query (JIT, codegen cache, file-index warm — mirrors the reference's
  * warmup-then-measure methodology, sigmod21-reproducibility/README.md:164),
  * then two measured passes keeping the per-query MINIMUM (steady state;
  * GC/JIT jitter on a 32-thread local JVM otherwise dominates sub-second
  * queries).
  *
  * Output contract: the JSON result is (a) written to bench.json in the
  * working directory and (b) printed as the FINAL stdout line, bare — no
  * logger prefix (build.sbt sets StdoutOutput; log4j2.properties keeps
  * Spark on stderr) — because the driver json-parses captured output. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val names = SparkEntry.queries.keys.toSeq.sorted
    // per-query timeout + job-group cancel (shared harness): a hanging
    // query must not stall the whole benchmark
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      QueryRunner.timed(spark, name) {
        SparkEntry.queries(name)(spark, sfDir).count(): Unit
      } match {
        case Right(_) => (System.nanoTime() - t0) / 1e9
        case Left(why) =>
          System.err.println(s"[bench] $name failed: $why")
          -1.0
      }
    }

    names.foreach(once) // warmup pass (discarded)
    // two measured passes, keep the per-query minimum: JIT/GC jitter on a
    // 32-thread local JVM otherwise dominates sub-second queries
    val passes = (1 to 2).map { _ =>
      spark.sqlContext.clearCache()
      names.map(n => n -> once(n)).toMap
    }
    val results = names.map { n =>
      val ts = passes.map(_(n)).filter(_ >= 0)
      n -> (if (ts.isEmpty) -1.0 else ts.min)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench.json"), json + "\n")
    spark.stop()
    // Last line of stdout, after spark.stop() so nothing interleaves.
    println(json)
    System.out.flush()
  }
}
