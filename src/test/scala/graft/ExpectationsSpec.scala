package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Expectations
import graft.ops.Expectations._

/** Expectation suites: each constraint kind's metric and verdict on a
  * fixture engineered to fail precisely, plus single-scan plan shape. */
class ExpectationsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def verdicts(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getDouble(2), r.getBoolean(4)))).toMap

  test("each constraint kind computes its exact ratio and verdict") {
    import spark.implicits._
    // 4 rows: one null name, dup id 2, one price out of [0,100],
    // one malformed code
    val df = Seq(
      (1L, Some("a"), 50.0, "X1"),
      (2L, Some("b"), 150.0, "X2"),
      (2L, Some("c"), 60.0, "bad"),
      (3L, None: Option[String], 70.0, "X3")
    ).toDF("id", "name", "price", "code")
    val v = verdicts(Expectations.validate(df, Seq(
      Complete("name", 0.7),
      Unique("id"),
      InRange("price", 0.0, 100.0, 0.8),
      InSet("code", Seq("X1", "X2", "X3")),
      MatchesRegex("code", "^X[0-9]$", 0.5))).collect())
    assert(v(("completeness", "name")) == ((0.75, true)))
    assert(v(("uniqueness", "id")) == ((0.75, false)), "dup pk must fail")
    assert(v(("in_range", "price")) == ((0.75, false)), "0.75 < 0.8 threshold")
    assert(v(("in_set", "code")) == ((0.75, false)))
    assert(v(("matches_regex", "code")) == ((0.75, true)))
  }

  test("empty table yields NULL metrics and NULL verdicts, not passes") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val rows = Expectations.validate(empty,
      Seq(Complete("name"), Unique("id"))).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(4)),
      "a vanished table must not silently pass its contract")
  }

  test("suite evaluates as one scan (single aggregate, no join/union)") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "price")
    val plan = Expectations.validate(df, Seq(
      Complete("name"), InRange("price", 0.0, 10.0),
      MatchesRegex("name", "^[a-z]$"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "constraints must share one scan, not union scans")
    assert(!plan.contains("Join"))
  }
}
