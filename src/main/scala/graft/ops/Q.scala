package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation + (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle == None` → driver records a weaker rows-only check. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
