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
  }
}
