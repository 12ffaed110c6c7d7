package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{Context, GraftErr}

/** Inventory entries exercised through the graft.api pipeline layer —
  * the reference's distinctive operators (SURVEY §2.7 error handling,
  * §2.4 fold aggregates, §2.2 full-row map) driven end-to-end through
  * `Context`/`DataSet` and verified against SQL oracles. */
object ApiOps {

  val all: Seq[Q] = Seq(

    // ---- resolve(eclass, ftor): per-row exception capture + resolver
    //      (dataset.py:162-199; ResolveTask.cc:268) ------------------------
    Q("q_resolve",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN -1
        |       ELSE 100 // (o_orderkey % 10) END AS q
        |FROM orders""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      ctx.fromDataFrame(Tables(s, d, "orders"))
        .withColumnUdf[Long, Long]("q", col("o_orderkey"))(k => 100L / (k % 10))
        .resolve[Long, Long](classOf[ArithmeticException])(_ => -1L)
        .selectColumns(Seq("o_orderkey", "q"))
        .toDF
    },

    // ---- resolve() over INPUT parse errors: the reference feeds csv parse
    //      failures through the same resolver machinery as UDF exceptions
    //      (PhysicalPlan.cc:202-208, ResolveTask.cc:268). A dirty csv
    //      (price cells prefixed "USD" for every 7th order) is read with a
    //      typed schema; the bad rows divert to the error channel; the
    //      resolver re-parses from the relaxed all-string cells and the
    //      repaired rows merge back — the oracle recomputes over the
    //      ORIGINAL clean table, so the totals only match if every dirty
    //      row was repaired to its exact value. ---------------------------
    Q("q_csv_resolve",
      s"""SELECT count(*) AS n, ${Tables.oSum("o_totalprice")} AS total,
         |  count(*) FILTER (WHERE o_orderkey % 7 = 0) AS n_repaired
         |FROM orders""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      val out = TempDirs.tempDir("graft_csv_rs") + "/dirty"
      Tables(s, d, "orders")
        .select(concat_ws(",", col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, concat(lit("USD"), col("o_totalprice")))
            .otherwise(col("o_totalprice").cast("string"))).as("value"))
        .write.mode("overwrite").text(out)
      ctx.csv(s"$out/*.txt", columns = Seq("k", "price"),
          header = Some(false), delimiter = Some(","),
          typeHintsAt = Map(0 -> LongType, 1 -> DoubleType))
        .resolve[Row, Row](classOf[graft.api.CsvParseError]) { cells =>
          Row(cells.getString(0).toLong,
            cells.getString(1).stripPrefix("USD").toDouble)
        }
        .toDF.agg(count(lit(1)).as("n"), Tables.dsum(col("price")).as("total"),
          count_if(col("k") % 7 === 0).as("n_repaired"))
    },

    // ---- ignore(eclass): silently drop raising rows (dataset.py:319-344) --
    Q("q_ignore",
      """SELECT o_orderkey, 100 // (o_orderkey % 10) AS q
        |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      ctx.fromDataFrame(Tables(s, d, "orders"))
        .withColumnUdf[Long, Long]("q", col("o_orderkey"))(k => 100L / (k % 10))
        .ignore(classOf[ArithmeticException])
        .selectColumns(Seq("o_orderkey", "q"))
        .toDF
    },

    // ---- full-row map with schema change (dataset.py:49-81) ---------------
    Q("q_udf_map",
      """SELECT c_custkey AS id,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
        |  length(c_name) AS name_len
        |FROM customer""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      ctx.fromDataFrame(Tables(s, d, "customer"))
        .selectColumns(Seq("c_custkey", "c_acctbal", "c_name"))
        .mapRows(StructType(Seq(
          StructField("id", LongType),
          StructField("bal_sign", StringType),
          StructField("name_len", IntegerType)))) { r =>
          Row(r.getLong(0), if (r.getDouble(1) < 0) "neg" else "pos",
            r.getString(2).length)
        }
        .toDF
    },

    // ---- UDTF-style flatMap (superset; reference has no flatMap,
    //      SURVEY §2.9) ---------------------------------------------------
    Q("q_udtf_flatmap",
      """SELECT p_partkey, unnest(generate_series(1, p_size % 3 + 1)) AS i
        |FROM part""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      ctx.fromDataFrame(Tables(s, d, "part"))
        .selectColumns(Seq("p_partkey", "p_size"))
        .flatMapRows(StructType(Seq(
          StructField("p_partkey", LongType),
          StructField("i", IntegerType)))) { r =>
          (1 to (r.getInt(1) % 3 + 1)).map(i => Row(r.getLong(0), i))
        }
        .toDF
    },

    // ---- global fold aggregate (dataset.py:593-642): treeAggregate over
    //      partitions; fixed-point accumulation keeps the fold
    //      order-independent hence oracle-exact -----------------------------
    Q("q_agg_fold",
      s"""SELECT count(*) AS n, ${Tables.oSum("l_quantity")} AS sum_qty
         |FROM lineitem""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      import s.implicits._
      ctx.fromDataFrame(Tables(s, d, "lineitem").select("l_quantity"))
        .aggregate[(Long, Long)]((0L, 0L))(
          (b, r) => (b._1 + 1, b._2 + math.floor(r.getDouble(0) * 10000d + 0.5d).toLong),
          (x, y) => (x._1 + y._1, x._2 + y._2))
        .withColumn("sum_qty", col("_2") / 10000.0)
        .renameColumn("_1", "n")
        .selectColumns(Seq("n", "sum_qty"))
        .toDF
    },

    // ---- grouped fold aggregateByKey (dataset.py:644-704) -----------------
    Q("q_agg_fold_bykey",
      s"""SELECT event_type, count(*) AS n, ${Tables.oSum("value")} AS total
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      import s.implicits._
      ctx.fromDataFrame(Tables(s, d, "events").select("event_type", "value"))
        .aggregateByKey[(Long, Long)](Seq("event_type"), (0L, 0L))(
          (b, r) => (b._1 + 1, b._2 + math.floor(r.getDouble(1) * 10000d + 0.5d).toLong),
          (x, y) => (x._1 + y._1, x._2 + y._2))
        .withColumn("total", col("_2") / 10000.0)
        .renameColumn("_1", "n")
        .selectColumns(Seq("event_type", "n", "total"))
        .toDF
    },

    // ---- golden flights-shaped pipeline (FullPipelines.cc:48-110 tier):
    //      the reference's flight pipeline joins the SAME airport dim for
    //      origin and destination plus a carrier dim with a left join and
    //      resolver; here: lineitem → orders → customer → nation (customer
    //      side) → supplier → nation again (supplier side, LEFT join) →
    //      UDF revenue with resolver → grouped fold by the two nations —
    //      the TPC-H Q7 volume-shipping shape through the graft api. ------
    Q("q_flights_golden",
      s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         |  count(*) AS n,
         |  ${Tables.oSum("CASE WHEN l_orderkey % 5 = 0 THEN 0.0 " +
              "ELSE l_extendedprice * (1 - l_discount) END")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      import s.implicits._
      // Join order restructured in r15 (guide §1.2 step 1, §2.3/§2.4, §8;
      // oracle-equivalent — inner joins commute and S ⟕ N pre-joins into
      // L ⋈ S unchanged): the r14 chain joined the FACT first (lineitem ⋈
      // orders), so past broadcast scale every later dimension join
      // re-shuffled the fact-sized stream — at sf100 that is 2-3 shuffles
      // + sorts of 600M rows (the 14.5×-vs-DuckDB wall, VERDICT r14 #2).
      // Now the dimensions enrich each other first at DIMENSION size
      // (orders ⋈ customer ⋈ nation is an orders-sized shuffle; supplier ⟕
      // nation is supplier-sized and broadcasts), and the fact stream is
      // shuffled ONCE — for the orders join — carrying (l_orderkey,
      // l_suppkey, revenue) instead of two raw price columns (the UDFs +
      // resolver run before the exchange, same row count either side of
      // the join, 8 fewer bytes per shuffled row).
      val li = ctx.fromDataFrame(Tables(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
        .withColumnUdf2[Double, Double, Double]("revenue",
          col("l_extendedprice"), col("l_discount"))((p, disc) => p * (1 - disc))
        // stackless error code (reference parity: ExceptionCodes.h i64
        // codes, no stack traces) — a JVM exception here paid
        // fillInStackTrace per thrown row, ~20 s for 12M throws at sf10
        .mapColumnUdf[Long, Long]("l_orderkey") { k =>
          if (k % 5 == 0) GraftErr.fail(5) else k
        }
        .resolveCode[Long, Long](5L)(identity)
        .withColumn("revenue",
          when(col("l_orderkey") % 5 === 0, 0.0).otherwise(col("revenue")))
        .selectColumns(Seq("l_orderkey", "l_suppkey", "revenue"))
      val suppNation = ctx.fromDataFrame(Tables(s, d, "supplier")
          .select("s_suppkey", "s_nationkey"))
        .leftJoin(ctx.fromDataFrame(Tables(s, d, "nation")
          .select("n_nationkey", "n_name")), "s_nationkey", "n_nationkey")
        .renameColumn("n_name", "supp_nation")
        .selectColumns(Seq("s_suppkey", "supp_nation"))
      val ordersEnriched = ctx.fromDataFrame(Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey"))
        .join(ctx.fromDataFrame(Tables(s, d, "customer")
          .select("c_custkey", "c_nationkey")), "o_custkey", "c_custkey")
        .join(ctx.fromDataFrame(Tables(s, d, "nation")
          .select("n_nationkey", "n_name")), "c_nationkey", "n_nationkey")
        .renameColumn("n_name", "cust_nation")
        .selectColumns(Seq("o_orderkey", "cust_nation"))
      li
        .join(suppNation, "l_suppkey", "s_suppkey")
        .join(ordersEnriched, "l_orderkey", "o_orderkey")
        // project to what the fold reads BEFORE aggregating (guide §2.3:
        // the partial FoldAgg otherwise converts every joined column into
        // the per-row Row the closure receives, when it only reads
        // `revenue` and the two group keys)
        .selectColumns(Seq("cust_nation", "supp_nation", "revenue"))
        .aggregateByKey[(Long, Long)](Seq("cust_nation", "supp_nation"), (0L, 0L))(
          (b, r) => (b._1 + 1,
            b._2 + math.floor(r.getAs[Double]("revenue") * 10000d + 0.5d).toLong),
          (x, y) => (x._1 + y._1, x._2 + y._2))
        .withColumn("revenue", col("_2") / 10000.0)
        .renameColumn("_1", "n")
        .selectColumns(Seq("cust_nation", "supp_nation", "n", "revenue"))
        .toDF
    },

    // ---- golden end-to-end pipeline (SURVEY §5 tier "golden pipelines",
    //      test/core/FullPipelines.cc shape): source → filter → join →
    //      UDF column map with thrown exceptions → resolver → second join
    //      → grouped fold → projection, oracle-checked as one unit -------
    Q("q_pipeline_golden",
      s"""SELECT n_name, count(*) AS n_orders,
         |  ${Tables.oSum("o_totalprice")} AS total
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_totalprice > 50000
         |GROUP BY n_name""".stripMargin) { (s, d) =>
      val ctx = new Context(s)
      import s.implicits._
      // r15 (guide §1.2 step 1; oracle-equivalent): the throwing UDF +
      // resolver moved from the post-join orders-sized stream to the
      // CUSTOMER side — the UDF reads only c_name, so running it before
      // the join throws/repairs once per customer instead of once per
      // matching order (|orders| ≈ 10×|customer| at every TPC-H SF), and
      // the customer⋈nation enrichment happens at dimension size before
      // the fact-sized orders join.
      val cust = ctx.fromDataFrame(Tables(s, d, "customer")
          .select("c_custkey", "c_name", "c_nationkey"))
        // UDF that throws for ~half the rows; the resolver supplies the
        // same uppercase result → net semantics = upper(c_name), but the
        // rows flow error-channel → resolve → merge mid-pipeline
        .mapColumnUdf[String, String]("c_name")(nm =>
          if (nm.length % 2 == 0) GraftErr.fail(2) // stackless, see q_flights
          else nm.toUpperCase)
        .resolveCode(2L)((nm: String) => nm.toUpperCase)
        .join(ctx.fromDataFrame(Tables(s, d, "nation")
          .select("n_nationkey", "n_name")), "c_nationkey", "n_nationkey")
        .selectColumns(Seq("c_custkey", "n_name"))
      ctx.fromDataFrame(Tables(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"))
        .filter(col("o_totalprice") > 50000)
        .join(cust, "o_custkey", "c_custkey")
        // narrow the fold input to what the closure reads (guide §2.3)
        .selectColumns(Seq("n_name", "o_totalprice"))
        .aggregateByKey[(Long, Long)](Seq("n_name"), (0L, 0L))(
          (b, r) => (b._1 + 1,
            b._2 + math.floor(r.getAs[Double]("o_totalprice") * 10000d + 0.5d).toLong),
          (x, y) => (x._1 + y._1, x._2 + y._2))
        .withColumn("total", col("_2") / 10000.0)
        .renameColumn("_1", "n_orders")
        .selectColumns(Seq("n_name", "n_orders", "total"))
        .toDF
    }
  )
}
