package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.t

/** The relational operator surface (SURVEY.md §2.3): scans, projections,
  * filters, every join flavor, aggregation, windows, sorts/top-k, set ops,
  * scalar function families. Each query is paired with a DuckDB oracle in
  * `oracles` — identical column names and deterministic result sets (ties
  * always broken by a key; doubles rounded so cross-engine FP noise can't
  * flip the hash).
  *
  * Scale notes (100 TB posture): every query is a declarative plan —
  * filters/projections reach the parquet scan via Catalyst pushdown; small
  * dimensions (region/nation/supplier/customer at TPC-H ratios) are
  * broadcast explicitly; fact-fact joins shuffle on their join keys and
  * aggregate map-side first. No collect(), no driver-side loops.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ Q1
  // Full-scan aggregate (TPC-H Q1 shape): map-side partial agg into 6
  // groups; at 100 TB this is scan-bound and embarrassingly parallel.
  private val q01: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + 1e-6, 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))) + 1e-6, 2).as("sum_charge"),
        round(avg(col("l_quantity")) + 1e-6, 2).as("avg_qty"),
        round(avg(col("l_extendedprice")) + 1e-6, 2).as("avg_price"),
        round(avg(col("l_discount")) + 1e-9, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity),2) AS sum_qty,
       round(sum(l_extendedprice),2) AS sum_base_price,
       round(sum(l_extendedprice*(1-l_discount)) + 1e-6,2) AS sum_disc_price,
       round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)) + 1e-6,2) AS sum_charge,
       round(avg(l_quantity) + 1e-6,2) AS avg_qty,
       round(avg(l_extendedprice) + 1e-6,2) AS avg_price,
       round(avg(l_discount) + 1e-9,4) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus"""

  // ------------------------------------------------------------------ Q2
  // Projection + filter: both must reach the parquet scan (PushedFilters).
  private val q02: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'"""

  // ------------------------------------------------------------------ Q6
  // Scalar aggregate with tight range predicates (TPC-H Q6).
  private val q06: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")) + 1e-6, 2).as("revenue"))

  private val q06Sql =
    """SELECT round(sum(l_extendedprice*l_discount) + 1e-6,2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  // ------------------------------------------------------------------ Q3
  // 3-way join + agg + deterministic top-10 (TPC-H Q3 shape). customer is
  // the small side → broadcast; lineitem⋈orders shuffles on orderkey.
  private val q03: Q = (s, dir) => {
    val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + 1e-6, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    """SELECT l_orderkey,
       round(sum(l_extendedprice*(1-l_discount)) + 1e-6,2) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY l_orderkey
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  // ------------------------------------------------------------------ Q4
  // Semi-join (EXISTS): left_semi never widens rows — at scale this is the
  // cheapest join flavor, no payload shuffle from the probe side.
  private val q04: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem").where(col("l_quantity") > 48)
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders WHERE EXISTS (
         SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48)
       GROUP BY o_orderpriority"""

  // ------------------------------------------------------------------ Q5
  // 6-way star join (TPC-H Q5 shape): all dimensions broadcast; the only
  // shuffles left are lineitem⋈orders and the final small agg.
  private val q05: Q = (s, dir) => {
    val r = t(s, dir, "region").where(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + 1e-6, 2).as("revenue"))
  }

  private val q05Sql =
    """SELECT n_name,
       round(sum(l_extendedprice*(1-l_discount)) + 1e-6,2) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
       GROUP BY n_name"""

  // ----------------------------------------------------------------- Q22
  // Anti-join (NOT EXISTS): customers who never placed a big-ticket order.
  private val q22: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").where(col("o_totalprice") > 300000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")) + 1e-6, 2).as("avg_bal"))
  }

  private val q22Sql =
    """SELECT c_mktsegment, count(*) AS n_customers,
       round(avg(c_acctbal) + 1e-6,2) AS avg_bal
       FROM customer WHERE NOT EXISTS (
         SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
       GROUP BY c_mktsegment"""

  // ----------------------------------------------------------------- Q7w
  // Window ranking: top-3 lineitems per supplier. Total order inside each
  // partition (price desc, then keys) so the rank is deterministic.
  private val q07: Q = (s, dir) => {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
  }

  private val q07Sql =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
         SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                row_number() OVER (PARTITION BY l_suppkey
                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
         FROM lineitem) WHERE rn <= 3"""

  // ----------------------------------------------------------------- Q8w
  // Running total per customer (cumulative frame). Both engines add in the
  // same row order → bitwise-stable sums; rounded anyway.
  private val q08: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
  }

  private val q08Sql =
    """SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
       FROM orders"""

  // ----------------------------------------------------------------- Q9w
  // lag/lead analytics: gap in days between a customer's consecutive orders.
  private val q09: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"),
        (lead(col("o_totalprice"), 1).over(w) - col("o_totalprice")).as("next_delta_raw"))
      .withColumn("next_delta", round(col("next_delta_raw"), 2))
      .drop("next_delta_raw")
  }

  private val q09Sql =
    """SELECT o_custkey, o_orderkey,
       datediff('day',
         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         o_orderdate) AS days_since_prev,
       round(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             - o_totalprice, 2) AS next_delta
       FROM orders"""

  // ---------------------------------------------------------------- Q10s
  // Global top-k: TakeOrderedAndProject — per-partition top-k then a
  // single-reducer merge of k·P rows, never a full sort at scale.
  private val q10: Q = (s, dir) =>
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(15)

  private val q10Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""

  // ---------------------------------------------------------------- Q11s
  // Set operations (set semantics): union / intersect / except.
  private val q11: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val machinery = c.where(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
    val rich = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val debtors = c.where(col("c_acctbal") < 0).select(col("c_custkey"))
    building.union(machinery).distinct()
      .intersect(rich)
      .except(debtors)
  }

  private val q11Sql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')
       INTERSECT
       SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       EXCEPT
       SELECT c_custkey FROM customer WHERE c_acctbal < 0"""

  // ---------------------------------------------------------------- Q12s
  // Bag difference (EXCEPT ALL) — multiplicity-preserving, the primitive
  // behind the reference's flagship multiset `\\` (app/Main.hs:157).
  private val q12: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.select(col("l_partkey"))
      .exceptAll(l.where(col("l_returnflag") === "R").select(col("l_partkey")))
  }

  private val q12Sql =
    """SELECT l_partkey FROM lineitem
       EXCEPT ALL
       SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'"""

  // ---------------------------------------------------------------- Q25j
  // Left outer join preserving empty customers + null-safe counting.
  private val q25: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spend"))
  }

  private val q25Sql =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice),0),2) AS total_spend
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey"""

  // ---------------------------------------------------------------- Q26j
  // Full outer join: nation-level customer vs supplier presence.
  private val q26: Q = (s, dir) => {
    val cByNation = t(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sByNation = t(s, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cByNation.join(sByNation, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  private val q26Sql =
    """SELECT coalesce(c.k, s.k) AS nationkey,
              coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
       FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
       FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
       ON c.k = s.k"""

  // ---------------------------------------------------------------- Q27j
  // Non-equi (range) theta-join: price-band classification of lineitems
  // against a small in-query band table — broadcast nested loop, which is
  // exactly right when one side is tiny.
  private val q27: Q = (s, dir) => {
    val bands = s.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row("low", 0.0, 20000.0),
        org.apache.spark.sql.Row("mid", 20000.0, 45000.0),
        org.apache.spark.sql.Row("high", 45000.0, 1e18)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.DoubleType))))
    t(s, dir, "lineitem")
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("turnover"))
  }

  private val q27Sql =
    """SELECT band, count(*) AS n, round(sum(l_extendedprice),2) AS turnover
       FROM lineitem JOIN (
         SELECT 'low' AS band, 0.0 AS lo, 20000.0 AS hi UNION ALL
         SELECT 'mid', 20000.0, 45000.0 UNION ALL
         SELECT 'high', 45000.0, 1e18) bands
       ON l_extendedprice >= lo AND l_extendedprice < hi
       GROUP BY band"""

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01,
    "q02_filter_project" -> q02,
    "q03_top_revenue_orders" -> q03,
    "q04_semi_join_exists" -> q04,
    "q05_region_star_join" -> q05,
    "q06_scalar_agg" -> q06,
    "q07_window_topk_per_group" -> q07,
    "q08_window_running_total" -> q08,
    "q09_window_lag_lead" -> q09,
    "q10_global_topk" -> q10,
    "q11_set_ops" -> q11,
    "q12_bag_difference" -> q12,
    "q22_anti_join" -> q22,
    "q25_left_outer_join" -> q25,
    "q26_full_outer_join" -> q26,
    "q27_range_theta_join" -> q27)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_top_revenue_orders" -> q03Sql,
    "q04_semi_join_exists" -> q04Sql,
    "q05_region_star_join" -> q05Sql,
    "q06_scalar_agg" -> q06Sql,
    "q07_window_topk_per_group" -> q07Sql,
    "q08_window_running_total" -> q08Sql,
    "q09_window_lag_lead" -> q09Sql,
    "q10_global_topk" -> q10Sql,
    "q11_set_ops" -> q11Sql,
    "q12_bag_difference" -> q12Sql,
    "q22_anti_join" -> q22Sql,
    "q25_left_outer_join" -> q25Sql,
    "q26_full_outer_join" -> q26Sql,
    "q27_range_theta_join" -> q27Sql)
}
