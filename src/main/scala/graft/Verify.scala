package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Robustness contract (round-1 lesson: CORRECTNESS_r01.json came back
  * empty despite a local 59/59 pass): oracle_sql.json is written FIRST so
  * a timeout-kill mid-run still leaves the oracle inputs; per-query status
  * is appended to verify_status.json after EVERY query; the final stdout
  * line is a bare JSON summary (StdoutOutput + stderr-only log4j keep it
  * clean for the driver's parser). */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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

    // Oracle SQL first: it is pure metadata, and the driver needs it even
    // if a later query hangs and the process is killed.
    val oracleJson = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)

    val status = mutable.LinkedHashMap.empty[String, String]
    def flushStatus(): Unit = {
      val body = status.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/verify_status.json"), body)
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // Contract: the result must land at outDir/<name>.parquet. Spark can
      // only write a directory, so write to a scratch dir and move the single
      // coalesced part file to the exact path (readable by any parquet reader,
      // no glob needed).
      status(name) = QueryRunner.timed(spark, name) {
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
        case Left(why) =>
          System.err.println(s"[verify] $name failed: $why")
          why
      }
      // release per-query persisted frames (LSH signatures, CC labels, …):
      // 78 queries of accumulated cache would otherwise squeeze storage
      spark.sqlContext.clearCache()
      flushStatus()
    }
    val nOk = status.valuesIterator.count(_ == "ok")
    spark.stop()
    println(s"""{"verify_ok":$nOk,"verify_total":${status.size},"out":"$outDir"}""")
    System.out.flush()
  }
}
