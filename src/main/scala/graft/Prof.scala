package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Scratch profiling main (dev only, not part of the library surface).
  * Current focus: break down the streaming tier's ~1.0-2.2 s per-query
  * fixed cost at sf0.1 (round-6 task: q_stream_* total ≤15 s) — how much
  * is query start, batch execution, no-data flush, stop, read-back.
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

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // stage once (memoized in real Streams)
    val watch = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "prof_in").toString
    val ev = graft.ops.Tables.events(spark, d)
      .withColumn("ts", unix_micros(col("ts"))).coalesce(1)
    ev.write.mode("append").parquet(watch)
    import spark.implicits._
    Seq((-1L, 4102444800L * 1000000L, -1L, "_g_sentinel", 0.0, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(watch)

    for (sp <- Seq(8, 4, 2, 1); i <- 1 to 3) {
      val t0 = System.nanoTime()
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", sp.toString)
      println(s"PROF sp=$sp run=$i")
      val root = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "prof_out").toString
      println(s"PROF#$i session+dir: ${ms(t0)} ms")

      var t = System.nanoTime()
      val src = s.readStream.schema(schema).parquet(watch)
        .withColumn("ts", timestamp_micros(col("ts")))
      val q = src
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode(OutputMode.Append())
        .format("parquet").option("path", s"$root/data")
        .option("checkpointLocation", s"$root/chk")
        .start()
      println(s"PROF#$i start(): ${ms(t)} ms")

      t = System.nanoTime()
      q.processAllAvailable()
      println(s"PROF#$i drain: ${ms(t)} ms  batches=${q.recentProgress.length}")
      q.recentProgress.foreach(p => println(
        s"PROF#$i   batch ${p.batchId}: rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs}"))

      t = System.nanoTime()
      q.stop()
      println(s"PROF#$i stop(): ${ms(t)} ms")

      t = System.nanoTime()
      val n = spark.read.parquet(s"$root/data")
        .filter(col("event_type") =!= "_g_sentinel").count()
      println(s"PROF#$i readback: ${ms(t)} ms rows=$n  total=${ms(t0)} ms")
    }
    spark.stop()
  }
}
