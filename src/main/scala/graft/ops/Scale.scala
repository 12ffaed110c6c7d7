package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out helpers: the shuffle-shaping tools a 100 TB deployment needs
  * beyond what AQE does automatically.
  *
  *  - [[saltedJoin]] — explicit key salting for pathologically skewed join
  *    keys (one key = a double-digit % of the table). AQE's skew-join
  *    splitting handles moderate skew; salting removes the hot-key straggler
  *    entirely by splitting each skewed key into `salts` sub-keys and
  *    replicating the other (smaller) side per sub-key.
  *  - [[writeBucketed]] / [[readBucketedTable]] — hash-bucketed tables:
  *    two tables bucketed on the same key with the same bucket count join
  *    with NO exchange on either side (verified by ScaleSpec against the
  *    physical plan). This is the persisted analogue of co-partitioning:
  *    pay the shuffle once at write time, never again per query.
  */
object Scale {

  /** Skew-safe equi join. The skewed (big) side is salted into `salts`
    * sub-keys; the other side is replicated `salts`× so every sub-key finds
    * its match. Result equals `skewed.join(other, key, joinType)` exactly;
    * only the shuffle distribution changes. Supports inner/left joins (the
    * replicated side must be the non-preserved side). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, skewedKey: String,
      otherKey: String, joinType: String = "inner", salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val jt = joinType.toLowerCase.replace("outer", "").replace("_", "")
    require(Seq("inner", "left").contains(jt),
      s"saltedJoin supports inner/left joins, got $joinType")
    // any deterministic ~uniform routing works; hash of the per-row id
    // spreads a hot key across `salts` reducers
    val se = skewed.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val oe = other.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    se.join(oe,
        se(skewedKey) === oe(otherKey) && se("_salt") === oe("_salt"), joinType)
      .drop("_salt")
  }

  /** Persist `df` hash-bucketed (and sorted) by `key` into `numBuckets`
    * buckets as a catalog table at `path`. Joins/aggregations on `key`
    * between tables with identical bucketing then need no shuffle. */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  def readBucketedTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Bucketized interval (range) join: left rows at point `leftTs` against
    * right rows carrying `[rightStart, rightEnd]` intervals (inclusive,
    * non-negative numeric, e.g. epoch micros). The naive formulation —
    * `l.join(r, ts BETWEEN start AND end)` — has no equi-key, so Spark
    * plans a broadcast-NLJ or cartesian product: quadratic at scale. Here
    * each interval explodes into the fixed-width time buckets it overlaps
    * and each point probes its single bucket, so the join is a plain
    * hash equi-join on the bucket id; exact containment filters after.
    * Shuffle volume = rows + intervals × (span/width + 1); pick `width`
    * near the typical interval span so most intervals land in ≤2 buckets.
    * A point matches an interval in exactly one bucket (its own), so no
    * dedup is needed. */
  def rangeJoin(left: DataFrame, right: DataFrame, leftTs: String,
      rightStart: String, rightEnd: String, width: Long): DataFrame = {
    require(width > 0, s"bucket width must be > 0, got $width")
    val b = "_g_bkt"
    // Integral `div`, not floor(col/width): `/` promotes to double, and
    // beyond 2^53 (epoch NANOSECONDS — this repo's events table) the
    // rounding can bucket a point and its containing interval differently,
    // silently dropping true matches. Inputs are non-negative (doc'd), so
    // truncating div == floor div.
    def bkt(c: String) = expr(s"cast(`$c` as long) div $width")
    val rb = right.withColumn(b, explode(sequence(bkt(rightStart), bkt(rightEnd))))
    val lb = left.withColumn(b, bkt(leftTs))
    lb.join(rb, b)
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop(b)
  }
}
