package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Context
import graft.ops.Tables

/** Scratch profiling main (dev only, not part of the library surface).
  * Current focus: bisect q_flights_golden's cost — pure-DataFrame floor
  * vs api joins vs typed UDF column vs throw/resolve channel vs fold agg. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val s = spark
    import s.implicits._

    def time[T](label: String)(f: => T): Unit = {
      (1 to 3).foreach { i =>
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime(); f
        println(f"PROF $label#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    def base(ctx: Context) = ctx.fromDataFrame(Tables(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
      .join(ctx.fromDataFrame(Tables(s, d, "orders")
        .select("o_orderkey", "o_custkey")), "l_orderkey", "o_orderkey")
      .join(ctx.fromDataFrame(Tables(s, d, "customer")
        .select("c_custkey", "c_nationkey")), "o_custkey", "c_custkey")
      .join(ctx.fromDataFrame(Tables(s, d, "nation")
        .select("n_nationkey", "n_name")), "c_nationkey", "n_nationkey")
      .renameColumn("n_name", "cust_nation")
      .join(ctx.fromDataFrame(Tables(s, d, "supplier")
        .select("s_suppkey", "s_nationkey")), "l_suppkey", "s_suppkey")
      .leftJoin(ctx.fromDataFrame(Tables(s, d, "nation")
        .select("n_nationkey", "n_name")), "s_nationkey", "n_nationkey")
      .renameColumn("n_name", "supp_nation")

    def nativeAgg(df: DataFrame): Long =
      df.groupBy("cust_nation", "supp_nation")
        .agg(count(lit(1)).as("n"), Tables.dsum(col("revenue")).as("revenue"))
        .count()

    // A. pure DataFrame floor
    time("A pure-df") {
      val li = Tables(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val df = li
        .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, d, "customer").select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
        .join(Tables(s, d, "nation").select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation")), col("c_nationkey") === col("cnk"))
        .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"), col("l_suppkey") === col("s_suppkey"))
        .join(Tables(s, d, "nation").select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")), col("s_nationkey") === col("snk"), "left")
        .withColumn("revenue", when(col("l_orderkey") % 5 === 0, 0.0)
          .otherwise(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      nativeAgg(df)
    }

    // B. api joins, native agg
    time("B api-joins") {
      val ctx = new Context(s)
      val df = base(ctx)
        .withColumn("revenue", when(col("l_orderkey") % 5 === 0, 0.0)
          .otherwise(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .toDF
      nativeAgg(df)
    }

    // C. + typed 2-arg UDF revenue
    time("C +udf2") {
      val ctx = new Context(s)
      val df = base(ctx)
        .withColumnUdf2[Double, Double, Double]("revenue",
          col("l_extendedprice"), col("l_discount"))((p, disc) => p * (1 - disc))
        .withColumn("revenue", when(col("l_orderkey") % 5 === 0, 0.0).otherwise(col("revenue")))
        .toDF
      nativeAgg(df)
    }

    // D. + throw/resolve channel
    time("D +resolve") {
      val ctx = new Context(s)
      val df = base(ctx)
        .withColumnUdf2[Double, Double, Double]("revenue",
          col("l_extendedprice"), col("l_discount"))((p, disc) => p * (1 - disc))
        .mapColumnUdf[Long, Long]("l_orderkey") { k =>
          if (k % 5 == 0) throw new ArithmeticException("promo order") else k
        }
        .resolve[Long, Long](classOf[ArithmeticException])(identity)
        .withColumn("revenue", when(col("l_orderkey") % 5 === 0, 0.0).otherwise(col("revenue")))
        .toDF
      nativeAgg(df)
    }

    // E. full golden (fold agg)
    time("E full-golden") {
      SparkEntry.queries("q_flights_golden")(s, d).count()
    }
    spark.stop()
  }
}
