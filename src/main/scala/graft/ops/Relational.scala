package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.{dsum, davg, oSum, oAvg}

/** Core relational operator inventory (SURVEY.md §2.2–2.6), one verifiable
  * query per operator, expressed Spark-first so Catalyst gets full pushdown
  * / pruning / broadcast freedom.
  *
  * Reference semantics: map/filter/withColumn/mapColumn/selectColumns/
  * renameColumn (`python/tuplex/dataset.py:49-317`), join/leftJoin
  * (`dataset.py:384-498`), unique/aggregate/aggregateByKey
  * (`dataset.py:36-47,593-704`), take (`dataset.py:113-160`). Sort, set
  * ops and semi/anti joins are capability supersets (SURVEY §2.5/2.6).
  */
object Relational {

  private def lineitem(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def orders(s: SparkSession, d: String)   = Tables(s, d, "orders")
  private def customer(s: SparkSession, d: String) = Tables(s, d, "customer")
  private def nation(s: SparkSession, d: String)   = Tables(s, d, "nation")
  private def region(s: SparkSession, d: String)   = Tables(s, d, "region")
  private def part(s: SparkSession, d: String)     = Tables(s, d, "part")
  private def supplier(s: SparkSession, d: String) = Tables(s, d, "supplier")
  private def events(s: SparkSession, d: String)   = Tables(s, d, "events")

  private val oToks = "regexp_split_to_array(trim(text), '\\s+')"

  val all: Seq[Q] = Seq(

    // ---- aggregateByKey capability: grouped aggregation (TPC-H Q1 shape) --
    Q("q1_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  ${oSum("l_extendedprice")} AS sum_base_price,
         |  ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${oAvg("l_quantity")} AS avg_qty,
         |  ${oAvg("l_extendedprice")} AS avg_price,
         |  ${oAvg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- filter + global fold aggregate (TPC-H Q6 shape; TPCH.cc:24) -----
    Q("q6_filter_agg",
      s"""SELECT ${oSum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.02 AND l_discount <= 0.06
         |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // ---- join + disjunctive filter + agg (TPC-H Q19 shape; TPCH.cc:229) --
    Q("q19_join_filter",
      s"""SELECT ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val l = lineitem(s, d)
      val p = part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3"  && col("p_size").between(1, 35) && col("l_quantity").between(20, 30)))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // ---- filter (dataset.py:83) ------------------------------------------
    Q("q_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 45 AND l_discount <= 0.02""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") >= 45 && col("l_discount") <= 0.02)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // ---- map / selectColumns: row-wise computed projection ----------------
    Q("q_map_project",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem""".stripMargin) { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
    },

    // ---- withColumn (dataset.py:201) --------------------------------------
    Q("q_withcolumn",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS tier,
        |  upper(c_name) AS name_upper, c_mktsegment
        |FROM customer""".stripMargin) { (s, d) =>
      customer(s, d)
        .withColumn("tier",
          when(col("c_acctbal") < 0, "debt")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high"))
        .withColumn("name_upper", upper(col("c_name")))
        .select("c_custkey", "tier", "name_upper", "c_mktsegment")
    },

    // ---- mapColumn (dataset.py:231): in-place single-column transform -----
    Q("q_mapcolumn",
      """SELECT c_custkey, lower(c_mktsegment) AS c_mktsegment
        |FROM customer""".stripMargin) { (s, d) =>
      customer(s, d)
        .withColumn("c_mktsegment", lower(col("c_mktsegment")))
        .select("c_custkey", "c_mktsegment")
    },

    // ---- renameColumn (dataset.py:293) ------------------------------------
    Q("q_rename",
      "SELECT o_orderkey AS order_id, o_totalprice AS total FROM orders") { (s, d) =>
      orders(s, d)
        .withColumnRenamed("o_orderkey", "order_id")
        .withColumnRenamed("o_totalprice", "total")
        .select("order_id", "total")
    },

    // ---- inner equi-join chain through broadcast dims (dataset.py:384) ----
    Q("q_join_inner",
      s"""SELECT r_name, count(*) AS n_orders, ${oSum("o_totalprice")} AS total
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin) { (s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
    },

    // ---- leftJoin (dataset.py:442): keep customers w/o orders -------------
    Q("q_join_left",
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
         |  coalesce(${oSum("o_totalprice")}, 0.0) AS total
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total"))
    },

    // ---- right join (enum'd but unimplemented in reference,
    //      PhysicalPlan.cc:138-144 — superset here) -------------------------
    Q("q_join_right",
      """SELECT c_custkey, max(o_totalprice) AS max_price
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy(col("c_custkey"))
        .agg(max(col("o_totalprice")).as("max_price"))
    },

    // ---- left-semi join (superset; SURVEY §2.3) ---------------------------
    Q("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin) { (s, d) =>
      val o = orders(s, d).filter(col("o_orderstatus") === "O")
      customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // ---- left-anti join (superset) ----------------------------------------
    Q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // ---- unique (dataset.py:36) -------------------------------------------
    Q("q_unique",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders") { (s, d) =>
      orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()
    },

    // ---- global fold aggregate (dataset.py:593) ---------------------------
    Q("q_agg_global",
      s"""SELECT count(*) AS n_rows, ${oSum("l_quantity")} AS sum_qty,
         |  max(l_quantity) AS max_qty, min(l_quantity) AS min_qty
         |FROM lineitem""".stripMargin) { (s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_quantity")).as("min_qty"))
    },

    // ---- aggregateByKey fold (dataset.py:644) over events -----------------
    Q("q_agg_bykey",
      s"""SELECT event_type, count(*) AS n, ${oSum("value")} AS total_value,
         |  max(value) AS max_value
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"),
          max(col("value")).as("max_value"))
    },

    // ---- orderBy + limit = deterministic top-k (superset; SURVEY §2.5) ----
    Q("q_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin) { (s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    },

    // ---- union (superset; SURVEY §2.6) ------------------------------------
    Q("q_union",
      """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin) { (s, d) =>
      val o = orders(s, d).select("o_orderkey", "o_orderpriority")
      o.filter(col("o_orderpriority") === "1-URGENT")
        .unionByName(o.filter(col("o_orderpriority") === "5-LOW"))
    },

    // ---- intersect (superset) ---------------------------------------------
    Q("q_intersect",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0""".stripMargin) { (s, d) =>
      val c = customer(s, d)
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
        .intersect(c.filter(col("c_acctbal") > 0).select("c_custkey"))
    },

    // ---- except (superset) ------------------------------------------------
    Q("q_except",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders""".stripMargin) { (s, d) =>
      customer(s, d).select("c_custkey")
        .except(orders(s, d).select(col("o_custkey").as("c_custkey")))
    },

    // ---- TPC-H Q3 shape: selective dim filter → 3-way join → top-k --------
    // The mktsegment filter cuts customer ~5× BEFORE the join (broadcast
    // side stays small); revenue is the exact fixed-point sum so the
    // cross-engine ORDER BY is deterministic (ties break on l_orderkey).
    Q("q3_topk_agg",
      s"""SELECT l_orderkey, o_orderdate,
         |  ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-03-15'
         |  AND l_shipdate > TIMESTAMP '1997-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d).filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "o_orderdate", "revenue")
    },

    // ---- TPC-H Q5 shape: 6-table snowflake with a cross-dim condition -----
    // nation/region broadcast; the c_nationkey = s_nationkey cross-fact
    // condition rides the supplier join (not a post-filter cartesian).
    Q("q5_multi_join",
      s"""SELECT n_name, ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name""".stripMargin) { (s, d) =>
      customer(s, d)
        .join(orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // ---- TPC-H Q10 shape: returned-item revenue per customer, top 20 ------
    Q("q10_group_topk",
      s"""SELECT c_custkey, c_name,
         |  ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  c_acctbal, n_name
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      customer(s, d)
        .join(orders(s, d)
            .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    },

    // ---- TPC-H Q4 shape: EXISTS decorrelates to a semi-join ---------------
    // (lineitem has no commit/receipt dates in this fixture; the EXISTS
    // predicate is a quantity threshold — the plan shape is identical)
    Q("q4_exists_agg",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 30)
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(lineitem(s, d).filter(col("l_quantity") >= 30),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // ---- TPC-H Q12 shape: join + conditional classification counts --------
    // Pure integer CASE aggregation — no float path at all.
    Q("q12_case_agg",
      """SELECT l_linestatus,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS high_count,
        |  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus""".stripMargin) { (s, d) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      orders(s, d)
        .join(lineitem(s, d)
            .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1).otherwise(0)).as("high_count"),
          sum(when(!hi, 1).otherwise(0)).as("low_count"))
    },

    // ---- rolling frame aggregates (ROWS BETWEEN; superset SURVEY §2.4) ----
    // Rolling sum uses the dsum fixed-point scheme inside the frame so the
    // double is identical across engines at every row; max is order-free.
    Q("q_rolling_window",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER w / 10000.0 AS DOUBLE) AS roll_sum,
        |  count(*) OVER w AS roll_n,
        |  max(value) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
      events(s, d).select(
        col("event_id"), col("user_id"),
        (sum(floor(col("value") * 10000d + 0.5d).cast("long")).over(w) / 10000.0)
          .cast("double").as("roll_sum"),
        count(lit(1)).over(w).as("roll_n"),
        max(col("value")).over(w).as("roll_max"))
    },

    // ---- pivot (wide aggregation; superset SURVEY §2.4) -------------------
    // The pivot values are listed EXPLICITLY: without the list Spark first
    // runs a distinct scan over the whole input to discover them — a full
    // extra pass at 100 TB. With it, the plan is a single hash aggregate.
    Q("q_pivot",
      s"""SELECT user_id % 10 AS user_bucket,
         |  ${oSum("CASE WHEN event_type = 'click' THEN value END")} AS click,
         |  ${oSum("CASE WHEN event_type = 'error' THEN value END")} AS error,
         |  ${oSum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
         |  ${oSum("CASE WHEN event_type = 'signup' THEN value END")} AS signup,
         |  ${oSum("CASE WHEN event_type = 'view' THEN value END")} AS view
         |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(dsum(col("value")))
    },

    // ---- unpivot / melt (long-form; superset SURVEY §2.2) -----------------
    // Pure per-row reshaping: values pass through bit-identically, no agg.
    Q("q_unpivot",
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax' AS metric, l_tax AS val FROM lineitem""".stripMargin) { (s, d) =>
      lineitem(s, d).unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        variableColumnName = "metric",
        valueColumnName = "val")
    },

    // ---- TPC-H Q13 shape: order-count distribution over a LEFT join -------
    // Customers with zero orders must appear (count = 0): the left outer
    // join + count(o_orderkey) (nulls uncounted) is the operator under
    // test; the outer distribution is a tiny second aggregate. Integer
    // counts only — no float path.
    Q("q13_distribution",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count""".stripMargin) { (s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    },

    // ---- TPC-H Q14 shape: promo revenue share (conditional agg ratio) -----
    // Both sums use the exact fixed-point scheme; the final division is
    // one IEEE op on identical operands → bit-exact across engines.
    Q("q14_promo_share", {
      val rev = "l_extendedprice * (1 - l_discount)"
      val promoRev = s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0.0 END"
      s"""SELECT CAST(100.00 * ${oSum(promoRev)} / ${oSum(rev)} AS DOUBLE) AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin
    }) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(broadcast(part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.00) * dsum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0.0))) / dsum(rev))
          .cast("double").as("promo_revenue"))
    },

    // ---- TPC-H Q17 shape: per-part average as the filter bound ------------
    // The correlated scalar subquery decorrelates into a per-part
    // aggregate joined back to the fact — the plan Spark and every MPP
    // engine run. The avg is exact fixed-point / exact count, so the
    // l_quantity < 0.5*avg comparison is engine-identical at every row.
    Q("q17_avg_bound",
      s"""WITH pa AS (
         |  SELECT l_partkey AS a_partkey, ${oAvg("l_quantity")} AS avg_qty
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT CAST(count(*) AS BIGINT) AS n_small,
         |  ${oSum("l_extendedprice")} AS small_revenue
         |FROM lineitem JOIN pa ON l_partkey = a_partkey
         |WHERE l_quantity < 0.5 * avg_qty""".stripMargin) { (s, d) =>
      val pa = lineitem(s, d).groupBy(col("l_partkey").as("a_partkey"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      lineitem(s, d)
        .join(pa, col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(count(lit(1)).as("n_small"),
          dsum(col("l_extendedprice")).as("small_revenue"))
    },

    // ---- TPC-H Q18 shape: HAVING-filtered keys rejoined to the facts ------
    // The big-order key set comes from one grouped agg with a HAVING
    // bound; facts then SEMI-join it (never a broadcast of lineitem).
    Q("q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey AS b_orderkey
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) > 2000000)
        |SELECT c_name, o_orderkey, o_orderdate, o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IN (SELECT b_orderkey FROM big)
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      // HAVING over the exact fixed-point sum (200 units × 10⁴)
      val big = lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(floor(col("l_quantity") * 10000d + 0.5d).cast("long")).as("_q"))
        .filter(col("_q") > 2000000L)
        .select(col("l_orderkey").as("b_orderkey"))
      orders(s, d)
        .join(big, col("o_orderkey") === col("b_orderkey"), "left_semi")
        .join(customer(s, d), col("c_custkey") === col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
    },

    // ---- TPC-H Q22 shape: global-average bound + anti join ----------------
    // Two decorrelations in one query: the scalar AVG subquery becomes a
    // broadcast 1-row cross join, and NOT EXISTS becomes a LEFT ANTI join
    // — no correlated re-execution anywhere. Grouping key stands in for
    // the phone country code (fixture has no phone column).
    Q("q22_anti_avg",
      s"""WITH ab AS (SELECT ${oAvg("c_acctbal")} AS avg_bal FROM customer
         |            WHERE c_acctbal > 0.0)
         |SELECT c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
         |  ${oSum("c_acctbal")} AS totacctbal
         |FROM customer, ab
         |WHERE c_acctbal > ab.avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      // the NOT EXISTS side is filtered (urgent orders only) so the
      // anti join actually leaves survivors at every fixture SF — an
      // unfiltered version matches nobody (every customer has orders)
      val avgBal = customer(s, d).filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      customer(s, d)
        .join(broadcast(avgBal)) // 1-row scalar: intentional cross join
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
    },

    // ---- TPC-H Q8 shape: national market share (two nation roles) ---------
    // The same dimension table joins twice under different roles (customer
    // nation gates the region, supplier nation is the share target) — the
    // classic self-dimension disambiguation. Share = ratio of two exact
    // fixed-point sums; one IEEE division per group → bit-exact.
    Q("q8_market_share", {
      val vol = "l_extendedprice * (1 - l_discount)"
      val tgt = s"CASE WHEN supp_nation = 'NATION_7' THEN $vol ELSE 0.0 END"
      s"""WITH v AS (
         |  SELECT year(o_orderdate) AS o_year, l_extendedprice, l_discount,
         |    n2.n_name AS supp_nation
         |  FROM lineitem
         |    JOIN part ON l_partkey = p_partkey
         |    JOIN orders ON l_orderkey = o_orderkey
         |    JOIN customer ON o_custkey = c_custkey
         |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |    JOIN region ON n1.n_regionkey = r_regionkey
         |    JOIN supplier ON l_suppkey = s_suppkey
         |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
         |SELECT o_year,
         |  CAST(${oSum(tgt)} / ${oSum(vol)} AS DOUBLE) AS mkt_share
         |FROM v GROUP BY o_year""".stripMargin
    }) { (s, d) =>
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      // customer-side nations inside the region (broadcast key set)
      val regionNations = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      // supplier-side nation role, renamed to avoid the double-join clash
      val suppNation = nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(regionNations), col("c_nationkey") === col("cn_key"),
          "left_semi")
        .join(supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_7", vol)
            .otherwise(lit(0.0))) / dsum(vol))
          .cast("double").as("mkt_share"))
    },

    // ---- TPC-H Q15 shape: argmax over a grouped view ----------------------
    // The revenue "view" is one grouped agg kept in EXACT fixed-point
    // (bigint) so the max and the equality filter are integer ops on both
    // engines — no float compare anywhere. The scalar max joins back as a
    // broadcast 1-row cross (labeled, same license as q22's avg bound).
    Q("q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey, SUM(CAST(floor(
        |      l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS rev_fp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_fp / 10000.0 AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE rev_fp = (SELECT max(rev_fp) FROM rev)""".stripMargin) { (s, d) =>
      // rev feeds both the scalar max and the equality filter — persisted
      // so the date-sliced fact scan runs once (per-supplier frame is tiny;
      // harness clearCache releases, same license as q2/q11/q21)
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          10000d + 0.5d).cast("long")).as("rev_fp"))
        .persist()
      val maxRev = rev.agg(max(col("rev_fp")).as("max_fp"))
      rev
        .join(broadcast(maxRev)) // 1-row scalar: intentional cross join
        .filter(col("rev_fp") === col("max_fp"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("rev_fp") / 10000.0).cast("double").as("total_revenue"))
    },

    // ---- null-safe equi join (<=> / IS NOT DISTINCT FROM) ------------------
    // The join-surface pin standard `=` silently gets wrong: NULL keys
    // never match themselves under `=`, so rows with unknown keys vanish
    // from an inner join. The null-safe operator (Spark `<=>`, SQL
    // `IS NOT DISTINCT FROM`) matches NULL to NULL — the semantics a
    // reconciliation join on incomplete dimensions needs. Both engines
    // derive the same nullable key (every 7th doc's lang nulled), join
    // against the distinct key domain, and count per bucket — the NULL
    // bucket's survival is the behavior under test.
    Q("q_nullsafe_join",
      """WITH k AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lk
        |  FROM documents),
        |dim AS (SELECT DISTINCT lk FROM k)
        |SELECT coalesce(k.lk, '<null>') AS key_bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM k JOIN dim ON k.lk IS NOT DISTINCT FROM dim.lk
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val k = Tables(s, d, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("lang")).as("lk"))
      val dim = k.select(col("lk").as("dlk")).distinct()
      k.join(dim, col("lk") <=> col("dlk"))
        .groupBy(coalesce(col("lk"), lit("<null>")).as("key_bucket"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // ---- explode vs explode_outer (empty-collection semantics pin) --------
    // explode DROPS a row whose array is empty; explode_outer keeps it
    // with a NULL element — the difference between silently losing every
    // short document downstream of a shingle pipeline and keeping it.
    // Docs under 3 tokens have empty 3-gram arrays here; the oracle
    // emulates OUTER with a CASE-to-[NULL] (DuckDB's unnest of an empty
    // list yields no rows, exactly Spark's inner explode). Output keeps
    // BOTH counts so the pinned difference is visible in the result.
    Q("q_explode_outer",
      s"""WITH t AS (SELECT doc_id, $oToks AS toks FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(toks) >= 3
         |      THEN list_transform(generate_series(1, len(toks) - 2),
         |        i -> array_to_string(toks[i:i+2], ' '))
         |      ELSE [] END AS grams
         |  FROM t),
         |outer_g AS (SELECT doc_id, unnest(CASE WHEN len(grams) = 0
         |      THEN [NULL] ELSE grams END) AS gram
         |  FROM g)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rows_outer,
         |  CAST(count(gram) AS BIGINT) AS n_grams
         |FROM outer_g GROUP BY 1""".stripMargin) { (s, d) =>
      val toks = split(trim(col("text")), "\\s+")
      val grams = expr(
        """CASE WHEN size(toks) >= 3
          |  THEN transform(sequence(1, size(toks) - 2),
          |    i -> concat_ws(' ', slice(toks, i, 3)))
          |  ELSE array() END""".stripMargin)
      Tables(s, d, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), explode_outer(grams).as("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_rows_outer"),
          count(col("gram")).as("n_grams"))
    }
  )
}
