package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound per-row operators (shingling, vector
  * scoring, fingerprinting). A small parquet input — one file, one row
  * group — scans as a single partition, serializing the whole operator on
  * one core. At real scale the scan has thousands of row-group splits and
  * this is a no-op; no shuffle is added unless the input is under-split. */
object Par {
  def ensureMin(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
