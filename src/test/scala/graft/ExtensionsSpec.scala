package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextFunctions

class ExtensionsSpec extends AnyFunSuite {

  test("simhash64 is callable from SQL via GraftExtensions") {
    // fresh session so withExtensions takes effect even if another suite
    // already created one (same underlying SparkContext is fine)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    Seq("the quick brown fox", "the quick brown fox")
      .toDF("text").createOrReplaceTempView("t")
    val viaSql = spark.sql(
      "SELECT simhash64(split(trim(text), '\\\\s+')) AS h FROM t")
      .collect().map(_.getLong(0))
    val viaCol = spark.table("t")
      .select(TextFunctions.simhash64(TextFunctions.tokens(col("text"))).as("h"))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.distinct.length == 1)

    // minhash family from SQL matches the Column API
    val sqlMh = spark.sql(
      """SELECT sorted_intersect_count(
        |  shingle_hashes(text, 3), shingle_hashes(text, 3)) AS n,
        |  size(minhash_sig(char_ngram_hashes(text, 3), 16)) AS m
        |FROM t""".stripMargin).collect()
    assert(sqlMh.forall(r => r.getInt(0) > 0 && r.getInt(1) == 16))

    // vector family from SQL
    val sqlVec = spark.sql(
      """SELECT cosine_sim(cast(array(1.0, 0.0) AS array<float>),
        |                  cast(array(1.0, 0.0) AS array<float>)) AS c,
        |  hyperplane_sig(cast(array(1.0, 0.0) AS array<float>), 2, 8) AS s
        |FROM t LIMIT 1""".stripMargin).head()
    assert(math.abs(sqlVec.getDouble(0) - 1.0) < 1e-12)

    // typed AGGREGATES from SQL: the analyzer wraps the registered
    // AggregateFunction in its AggregateExpression at resolution
    (1L to 100L).map(i => (i % 3, i % 7, i.toDouble))
      .toDF("g", "k", "s").createOrReplaceTempView("agg_t")
    val topk = spark.sql(
      "SELECT g, top_k_by_score(s, k, 2) AS nn FROM agg_t GROUP BY g")
      .collect()
    assert(topk.length == 3 &&
      topk.forall(_.getSeq[org.apache.spark.sql.Row](1).length == 2))
    val mg = spark.sql(
      "SELECT misra_gries(k, 4) AS hh FROM agg_t").head()
    assert(mg.getSeq[org.apache.spark.sql.Row](0).length <= 4)
  }
}
