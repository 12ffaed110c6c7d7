package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (capability superset — the reference has
  * no streams, SURVEY §0). Streams the events table and produces the same
  * answers as the batch path, demonstrating the readStream → transform →
  * writeStream shape plus stateful processing. */
object Streams {

  private val nameCounter = new AtomicLong(0)

  /** Events schema as a *stream* source: ns timestamps arrive as longs
    * (matching graft.ops.Tables' batch workaround) and are rebuilt. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob form: the file source requires a directory/glob to watch, not a
    // bare file path ([t] makes it a glob matching exactly events.parquet)
    spark.readStream.schema(eventsRawSchema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling-window aggregation over the stream, drained synchronously
    * into a memory sink (complete mode). Returns the result table.
    * `agg` maps output column name → aggregate over the window group. */
  def runWindowedAgg(spark: SparkSession, dir: String, windowDur: String,
      aggs: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val q = eventStream(spark, dir)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Streaming exact dedup under an event-time watermark. The dedup key is
    * EXPLICITLY `keyCols` + the event time `ts`: a duplicate is the same
    * content re-delivered at the same event time (the at-least-once replay
    * case) — rows matching on `keyCols` at different event times are kept.
    * Including the event-time column in the key is what lets Spark drop
    * state past the watermark; for time-agnostic keys use
    * `dropDuplicatesWithinWatermark` (unbounded-lateness dups then slip
    * through at the watermark horizon). */
  def dedupStream(spark: SparkSession, dir: String, keyCols: Seq[String],
      watermark: String = "1 day"): DataFrame = {
    val name = s"graft_dedup_${nameCounter.incrementAndGet()}"
    val q = eventStream(spark, dir)
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Stateful per-user session counting via mapGroupsWithState: counts
    * events per user with explicit GroupState — the reference-free
    * `KeyValueGroupedDataset` custom-state path. */
  def userEventCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"graft_state_${nameCounter.incrementAndGet()}"
    val q = eventStream(spark, dir)
      .selectExpr("user_id", "event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "n_events")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
