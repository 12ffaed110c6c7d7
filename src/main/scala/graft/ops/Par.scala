package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound per-row operators (shingling, vector
  * scoring, fingerprinting). A small parquet input — one file, one row
  * group — scans as a single partition, serializing the whole operator on
  * one core. At real scale the scan has thousands of row-group splits and
  * this is a no-op; no shuffle is added unless the input is under-split. */
object Par {
  /** Under-split detection via the optimizer's size estimate, NOT
    * `df.rdd.getNumPartitions`: the RDD probe forces a full physical
    * planning of the frame on every call (pure waste when invoked per
    * operator). `optimizedPlan.stats.sizeInBytes` stops at the logical
    * layer and is what the file scan's split count derives from anyway:
    * an input smaller than target × maxPartitionBytes cannot scan as
    * `target` full splits, so repartition it; anything bigger already
    * splits at least that wide and passes through untouched. */
  def ensureMin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size < BigInt(maxSplit) * target) df.repartition(target) else df
  }
}
