package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Negative-value / empty-input edges of the round-6 sign-safe integer
  * spellings — the class of latent divergence the fixture-bound oracle
  * cannot see (all fixture ids/values happen to be non-negative):
  *
  *  1. the floor-division spelling `(a - pmod(a, n)) div n` used by
  *     q_cusum's global target must equal mathematical floor(a/n) for
  *     NEGATIVE numerators (Spark `div` truncates toward zero; DuckDB
  *     `//` floors — they differ exactly there);
  *  2. q_bitmap_audience's (word, bit) decomposition must stay a
  *     bijection over negative user_ids (the `%`-spelling would hand
  *     shiftleft a negative bit position);
  *  3. q_fisher_score's DECIMAL(38,0) products must stay exact past the
  *     BIGINT range where the old spelling overflowed to null;
  *  4. Pca.topComponentProjections must fail LOUDLY with a clear message
  *     on an empty embeddings table (the old bare `.first()` threw an
  *     opaque NoSuchElementException). */
class SignSafetySpec extends AnyFunSuite {

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

  test("floor-div spelling equals floor(a/n) for all signs (q_cusum target)") {
    import spark.implicits._
    val nums = Seq(-100L, -99L, -51L, -50L, -1L, 0L, 1L, 49L, 50L, 99L,
      Long.MinValue / 4, Long.MaxValue / 4)
    val dens = Seq(1L, 3L, 7L, 32L, 100L)
    val rows = nums.flatMap(a => dens.map(n => (a, n))).toDF("a", "n")
      .withColumn("fd", expr("(a - pmod(a, n)) div n"))
      .collect()
    rows.foreach { r =>
      val (a, n, fd) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val want = BigDecimal(a)./%(BigDecimal(n))._1.toLong match {
        // BigDecimal /% truncates; recompute floor explicitly
        case t if a % n != 0 && (a < 0) != (n < 0) => t - 1
        case t => t
      }
      assert(fd === want, s"floor-div spelling wrong for $a / $n")
    }
  }

  test("bitmap (word, bit) decomposition is a bijection over negative ids") {
    import spark.implicits._
    val ids = Seq(-65L, -64L, -33L, -32L, -31L, -1L, 0L, 1L, 31L, 32L, 63L)
    val rows = ids.toDF("user_id")
      .withColumn("w", expr("(user_id - pmod(user_id, 32)) div 32"))
      .withColumn("bit", expr("CAST(pmod(user_id, 32) AS INT)"))
      .collect()
    rows.foreach { r =>
      val (id, w, bit) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(bit >= 0 && bit < 32, s"bit position $bit out of [0,32) for id=$id")
      assert(w * 32 + bit === id, s"(word,bit) not a bijection for id=$id")
    }
    // round-trip through the actual bitmap agg: negative-id audiences
    // intersect exactly like a distinct-user set intersection
    val ev = Seq(("a", -5L), ("a", -64L), ("a", 7L), ("b", -5L), ("b", -64L),
      ("b", 100L)).toDF("event_type", "user_id")
    val words = ev.groupBy(col("event_type"),
        expr("(user_id - pmod(user_id, 32)) div 32").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT)," +
        " CAST(pmod(user_id, 32) AS INT)))").as("bits"))
    val a = words.filter(col("event_type") === "a").select(col("w"), col("bits").as("ba"))
    val b = words.filter(col("event_type") === "b").select(col("w"), col("bits").as("bb"))
    val common = a.join(b, Seq("w"))
      .agg(sum(bit_count(expr("ba & bb"))).as("c")).collect()(0).getLong(0)
    assert(common === 2L, "bitmap overlap over negative ids must count {-5, -64}")
  }

  test("fisher DECIMAL(38,0) products stay exact past BIGINT (no silent null)") {
    import spark.implicits._
    // nt*s at ~3e9 * 4e9 = 1.2e19 > Long.MaxValue (9.2e18): the old
    // BIGINT spelling overflowed; decimal must produce the exact value.
    val big = Seq((3_000_000_000L, 4_000_000_000L, 7L)).toDF("nt", "s", "n")
      .select(expr("CAST(nt AS DECIMAL(38,0)) * s").as("p"),
        expr("(CAST(nt AS DECIMAL(38,0)) * s) div n").as("q"))
      .collect()(0)
    assert(big.getDecimal(0) !== null)
    assert(BigDecimal(big.getDecimal(0)) ===
      BigDecimal(3_000_000_000L) * BigDecimal(4_000_000_000L))
    assert(big.getLong(1) ===
      ((BigInt(3000000000L) * BigInt(4000000000L)) / 7).toLong)
  }

  test("Pca.topComponentProjections fails loudly on an empty embeddings table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_emb").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      graft.similarity.Pca.topComponentProjections(spark, dir, iters = 3)
    }
    assert(ex.getMessage.contains("empty"),
      s"error message must name the empty-table cause, got: ${ex.getMessage}")
  }
}
