package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation + (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle == None` → driver records a weaker rows-only check.
  *
  * `scaleOracle`: a TRACTABLE equivalent of `oracle` for staged scale
  * points (sf1+), for the queries whose graded oracle is a deliberately
  * quadratic / recursive ground truth that DuckDB cannot finish past
  * ~60k docs. Same output schema, same exact-compare — only the oracle's
  * algorithm changes (e.g. all-pairs → lossless prefix-filtered inverted
  * list). The method name is recorded in the correctness artifact so
  * each big-SF pass names how it was certified. Never used at the graded
  * sf0.01 point. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    scaleOracle: Option[ScaleOracle] = None) {

  /** Attach a scale-point oracle (see class doc). */
  def atScale(method: String, sql: String): Q =
    copy(scaleOracle = Some(ScaleOracle(method, sql)))
}

/** A big-SF oracle variant: `method` names the certification technique
  * ("ppjoin-replay", "native-cosine", "block-band-replay", …). */
final case class ScaleOracle(method: String, sql: String)

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
