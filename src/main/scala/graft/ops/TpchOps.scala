package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.{dsum, oSum}

/** The remaining TPC-H shapes (Q2/Q7/Q9/Q11/Q16/Q20/Q21), completing the
  * full 22-query suite alongside the ones in [[Relational]]. The fixture
  * schema has no `partsupp` table and no commit/receipt dates, so each
  * query keeps its canonical PLAN shape (the part that matters at scale)
  * with lineitem-derived stand-ins for the missing columns, exactly as the
  * reference's own benchmark tasks adapt TPC-H to their fixtures
  * (`/root/reference/benchmarks/tpch`).
  *
  * Exactness: every float aggregate goes through the fixed-point scheme in
  * [[Tables]]; every scalar-subquery threshold is compared with the
  * identical IEEE expression on both engines; every LIMIT is preceded by a
  * total order on integer keys.
  */
object TpchOps {

  private def lineitem(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def orders(s: SparkSession, d: String)   = Tables(s, d, "orders")
  private def customer(s: SparkSession, d: String) = Tables(s, d, "customer")
  private def nation(s: SparkSession, d: String)   = Tables(s, d, "nation")
  private def region(s: SparkSession, d: String)   = Tables(s, d, "region")
  private def part(s: SparkSession, d: String)     = Tables(s, d, "part")
  private def supplier(s: SparkSession, d: String) = Tables(s, d, "supplier")

  val all: Seq[Q] = Seq(

    // ---- TPC-H Q2 shape: min-cost supplier per part -----------------------
    // The correlated MIN subquery decorrelates into one grouped agg joined
    // back on (part, exact-integer cost) equality. Unit cost stands in for
    // ps_supplycost as the per-(part,supplier) min observed unit price —
    // quantized to fixed point FIRST so the min, the rejoin equality, and
    // the final sort are all integer ops on both engines. Dimension chain
    // (supplier→nation→region) broadcasts; the only shuffle is the
    // lineitem groupBy on (partkey, suppkey) — the natural key at 100 TB.
    Q("q2_min_cost_supplier",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(floor(l_extendedprice / l_quantity * 10000 + 0.5) AS BIGINT)) AS cost_fp
        |  FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey),
        |mn AS (SELECT l_partkey AS mp, min(cost_fp) AS min_fp FROM ps GROUP BY l_partkey)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
        |  CAST(cost_fp / 10000.0 AS DOUBLE) AS unit_cost
        |FROM ps
        |  JOIN mn ON l_partkey = mp AND cost_fp = min_fp
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size < 15 AND r_name = 'ASIA'
        |ORDER BY cost_fp, p_partkey, s_suppkey LIMIT 100""".stripMargin) { (s, d) =>
      // The per-part minimum is a WINDOW over the (part, supplier)
      // aggregate, not a second groupBy self-joined back: the oracle's
      // ps⋈mn states the semantics, but the window form keeps it ONE
      // pipeline — one fact scan, one (part,supp) shuffle, one window
      // pass by part — with no persist and no join, and it stays the
      // right plan at 100 TB (the window input is the aggregate, orders
      // of magnitude smaller than the fact table).
      val ps = lineitem(s, d).filter(col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(floor(col("l_extendedprice") / col("l_quantity") * 10000d + 0.5d)
          .cast("long")).as("cost_fp"))
      val asiaNations = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("rn_key"), col("n_name"))
      ps
        .withColumn("min_fp", min(col("cost_fp")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")))
        .filter(col("cost_fp") === col("min_fp"))
        .join(broadcast(part(s, d).filter(col("p_size") < 15)
          .select("p_partkey", "p_name")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("rn_key"))
        .orderBy(col("cost_fp"), col("p_partkey"), col("s_suppkey"))
        .limit(100)
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
          col("n_name"), (col("cost_fp") / 10000.0).cast("double").as("unit_cost"))
    },

    // ---- TPC-H Q7 shape: volume shipping between two nations --------------
    // The nation dimension joins under BOTH roles (supplier side and
    // customer side) with the symmetric pair predicate; both roles are
    // broadcast key sets so the fact table shuffles only for the final
    // group-by. This is the query whose naive form cross-joins nations —
    // the role-rename keeps it two broadcast hash joins.
    Q("q7_volume_shipping",
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
         |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
         |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin) { (s, d) =>
      val pair = Seq("NATION_3", "NATION_8")
      val suppNation = nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val custNation = nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      lineitem(s, d)
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
          (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // ---- TPC-H Q9 shape: product-type profit by nation and year -----------
    // ps_supplycost stands in as a retail-price fraction; the profit
    // expression is quantized per ROW (one floor over the whole arithmetic,
    // identical operand order both engines — floor of a negative profit is
    // well-defined and identical) so the nation×year sums are exact
    // integers. part is a broadcast filter; the plan is fact-scan →
    // two broadcast joins → one shuffle on the (nation, year) group key.
    Q("q9_product_profit",
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(SUM(CAST(floor(
        |    (l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity)
        |    * 10000 + 0.5) AS BIGINT)) / 10000.0 AS DOUBLE) AS sum_profit
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%e%'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin) { (s, d) =>
      val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * 0.1 * col("l_quantity")
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_name").like("%e%"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(floor(profit * 10000d + 0.5d).cast("long")) / 10000.0)
          .cast("double").as("sum_profit"))
    },

    // ---- TPC-H Q11 shape: important stock (fraction-of-total HAVING) ------
    // The scalar total is a 1-row broadcast cross join (same labeled
    // license as q22's avg bound); part values and the total are exact
    // bigints, and the fraction threshold is the identical double multiply
    // on both engines. One shuffle (partkey group), one 1-row broadcast.
    Q("q11_important_stock",
      """WITH val AS (
        |  SELECT l_partkey,
        |    SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS v_fp
        |  FROM lineitem
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_19'
        |  GROUP BY l_partkey),
        |tot AS (SELECT SUM(v_fp) AS t_fp FROM val)
        |SELECT l_partkey AS p_key, CAST(v_fp / 10000.0 AS DOUBLE) AS part_value
        |FROM val, tot
        |WHERE CAST(v_fp AS DOUBLE) > CAST(t_fp AS DOUBLE) * 0.001""".stripMargin) { (s, d) =>
      val natSupp = supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_19")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("ns_key"))
      // value feeds both the scalar total and the threshold filter —
      // persisted for the same single-fact-scan reason as q2's ps
      val value = lineitem(s, d)
        .join(broadcast(natSupp), col("l_suppkey") === col("ns_key"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum(floor(col("l_extendedprice") * 10000d + 0.5d).cast("long")).as("v_fp"))
        .persist()
      val total = value.agg(sum(col("v_fp")).as("t_fp"))
      value
        .join(broadcast(total)) // 1-row scalar: intentional cross join
        .filter(col("v_fp").cast("double") > col("t_fp").cast("double") * 0.001)
        .select(col("l_partkey").as("p_key"),
          (col("v_fp") / 10000.0).cast("double").as("part_value"))
    },

    // ---- TPC-H Q16 shape: supplier counts with a NOT-IN exclusion ---------
    // The part→supplier bridge is the distinct (partkey, suppkey) pair set
    // from lineitem (partsupp stand-in); the NOT IN becomes a broadcast
    // LEFT ANTI join against the (tiny) excluded-supplier set. The
    // count(DISTINCT) shuffles once on the already-distinct bridge.
    Q("q16_supplier_cnt",
      """WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM bridge JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      val sizes = Seq(1, 4, 7, 10, 13, 16, 19, 23)
      val excluded = supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("x_key"))
      lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(excluded), col("l_suppkey") === col("x_key"), "left_anti")
        .join(broadcast(part(s, d)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(sizes: _*))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },

    // ---- TPC-H Q20 shape: excess-stock suppliers (nested IN chain) --------
    // "availqty > half of shipped quantity" becomes an integer compare of
    // two grouped sums over the same (part, supplier) key — one shuffle
    // produces both via conditional aggregation (no second scan, no self
    // join). The nested INs become a semi-join chain ending in the
    // supplier dimension.
    Q("q20_excess_stock",
      """WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS q_all,
        |    SUM(CASE WHEN year(l_shipdate) = 1997
        |        THEN CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)
        |        ELSE 0 END) AS q_97
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#12'
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT s_suppkey, s_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_19'
        |  AND s_suppkey IN (SELECT l_suppkey FROM q WHERE q_97 * 2 > q_all)
        |ORDER BY s_suppkey LIMIT 100""".stripMargin) { (s, d) =>
      val qfp = floor(col("l_quantity") * 10000d + 0.5d).cast("long")
      val q = lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_brand") === "Brand#12")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(qfp).as("q_all"),
          sum(when(year(col("l_shipdate")) === 1997, qfp).otherwise(0L)).as("q_97"))
      supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_19")),
          col("s_nationkey") === col("n_nationkey"))
        .join(q.filter(col("q_97") * 2 > col("q_all")).select("l_suppkey"),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .orderBy(col("s_suppkey")).limit(100)
        .select("s_suppkey", "s_name")
    },

    // ---- TPC-H Q21 shape: suppliers who kept orders waiting ---------------
    // The EXISTS / NOT-EXISTS pair over the same fact table decorrelates
    // into ONE window-free aggregation per order: a supplier's line
    // qualifies iff it was late, the order is multi-supplier, and it is
    // the ONLY late supplier — exactly the two correlated subqueries,
    // computed in a single shuffle on orderkey instead of two self-joins
    // (the canonical plan's scale killer). "Late" = shipped >60 days
    // after the order date (fixture has no commit/receipt dates).
    Q("q21_waiting_orders",
      """WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |         THEN 1 ELSE 0 END AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_order AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
        |  FROM l GROUP BY l_orderkey)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM l
        |  JOIN per_order USING (l_orderkey)
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1
        |  AND n_name = 'NATION_19'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, d) =>
      // l feeds both the per-order supplier census and the qualifying-line
      // filter — persisted so the lineitem⋈orders join runs once (q2's ps
      // rationale; the projected 3-int frame is far smaller than a second
      // fact join at scale)
      val l = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1)
            .otherwise(0))
        .select("l_orderkey", "l_suppkey", "is_late")
        .persist()
      val perOrder = l.groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("is_late") === 1, col("l_suppkey"))).as("n_late"))
      val natSupp = supplier(s, d)
        .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_19")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      l.filter(col("is_late") === 1)
        .join(perOrder.filter(col("n_supp") >= 2 && col("n_late") === 1)
          .select("l_orderkey"), "l_orderkey")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    }
  )
}
