package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session until the inter-event gap exceeds `gap`. One hash exchange
  * on the key + one partition-local sort (same cost envelope as any
  * per-key window); session ids are per-key ordinals, so they are
  * deterministic and stable under reprocessing — no global counter, no
  * driver state. For unbounded streams the equivalent is
  * `session_window()` in Structured Streaming; this is the batch shape. */
object Sessionize {

  /** Adds `session_id` (1-based per-key ordinal): a new session starts at
    * the first event and whenever `ts - prev_ts > gap` (same units as
    * `tsCol`, e.g. epoch micros). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    val newSession = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: bounds and event count per (key, session). */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
