package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-check channel's canonical hashing: the committed
  * expected-hash resources are only as trustworthy as ResultHash's
  * determinism across partitionings, row orders, and column orders —
  * exactly what the driver's own compare normalizes away. */
class ResultHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def allTypes = {
    import spark.implicits._
    Seq(
      (1L, "alpha", 1.5, true, Seq(1, 2), Map("k" -> 1L), BigDecimal("12.3400")),
      (2L, null: String, Double.NaN, false, Seq.empty[Int], Map.empty[String, Long], BigDecimal("0.1")),
      (3L, "tab\tand\nnewline", -0.0, true, Seq(3), Map("a" -> 2L, "b" -> 3L), null: BigDecimal)
    ).toDF("id", "s", "d", "b", "arr", "m", "dec")
  }

  test("hash is invariant to row order, column order, and partitioning") {
    val df = allTypes
    val (n1, c1, h1) = ResultHash.of(df)
    val (n2, c2, h2) = ResultHash.of(
      df.orderBy(col("id").desc).select("dec", "m", "arr", "b", "d", "s", "id"))
    val (n3, c3, h3) = ResultHash.of(df.repartition(7))
    assert(n1 == 3 && n1 == n2 && n2 == n3)
    assert(c1 == c2 && c2 == c3 && c1 == "arr,b,d,dec,id,m,s")
    assert(h1 == h2 && h2 == h3)
  }

  test("hash distinguishes value, null-vs-empty, and -0.0-normalization cases") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq((1L, "y")).toDF("id", "s")
    val c = Seq((1L, null: String)).toDF("id", "s")
    val d = Seq((1L, "")).toDF("id", "s")
    val hs = Seq(a, b, c, d).map(ResultHash.of(_)._3)
    assert(hs.distinct.length == 4, "distinct values must hash apart")
    // -0.0 and 0.0 normalize together (engines disagree on signed zero)
    val z1 = ResultHash.of(Seq(Tuple1(0.0)).toDF("v"))._3
    val z2 = ResultHash.of(Seq(Tuple1(-0.0)).toDF("v"))._3
    assert(z1 == z2)
  }

  test("hash of temporal columns is JVM-default-timezone invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        java.sql.Date.valueOf("2024-03-01")),
      (2L, java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999"),
        java.sql.Date.valueOf("1999-12-31"))
    ).toDF("id", "ts", "d")
    val tz0 = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
      val h1 = ResultHash.of(df)
      // java.sql.Timestamp.toString renders in the default TZ — the hash
      // must NOT (committed expected hashes travel across machines)
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/Los_Angeles"))
      val h2 = ResultHash.of(df)
      assert(h1 == h2, "temporal hash depends on JVM default timezone")
    } finally java.util.TimeZone.setDefault(tz0)
  }

  test("hash survives a parquet round-trip (what Verify actually hashes)") {
    val df = allTypes
    val dir = java.nio.file.Files.createTempDirectory("graft_rh").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(ResultHash.of(df) == ResultHash.of(back))
  }

  test("expectedFor rejects a resource whose fingerprint mismatches the drop") {
    // the committed sf0.01 resource records the real testdata fingerprint;
    // pointing the same loader at a DIFFERENT directory (self-made, so
    // sizes differ) must yield the empty map, not false mismatches
    val fake = java.nio.file.Files.createTempDirectory("graft_fp").resolve("sf0.01")
    java.nio.file.Files.createDirectory(fake)
    java.nio.file.Files.writeString(fake.resolve("lineitem.parquet"), "not parquet")
    assert(Verify.expectedFor(fake.toString).isEmpty)
    // and the real dir (if present) loads non-empty
    if (new java.io.File("/root/testdata/sf0.01").isDirectory)
      assert(Verify.expectedFor("/root/testdata/sf0.01").nonEmpty)
  }
}
