package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.t

/** Scalar-function families, grouping sets, having, subquery patterns, and
  * array/collect surfaces (SURVEY.md §2.3 "scalar functions" +
  * "aggregations"). All codegen'd built-ins — no UDFs — so every expression
  * stays inside whole-stage codegen at scale.
  */
object ScalarQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- string
  private val q13: Q = (s, dir) =>
    t(s, dir, "part")
      .where(col("p_name").like("%widget%") || col("p_name").rlike("^(red|blue)"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_type"), 1, 4).as("type4"),
        length(col("p_name")).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        trim(lit(" x ")).as("trimmed"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        split(col("p_name"), " ").getItem(0).as("first_word"))

  private val q13Sql =
    """SELECT p_partkey,
       upper(p_name) AS uname,
       lower(p_brand) AS lbrand,
       substring(p_type, 1, 4) AS type4,
       length(p_name) AS name_len,
       concat_ws('/', p_brand, p_type) AS brand_type,
       trim(' x ') AS trimmed,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
       string_split(p_name, ' ')[1] AS first_word
       FROM part
       WHERE p_name LIKE '%widget%' OR regexp_matches(p_name, '^(red|blue)')"""

  // ------------------------------------------------------------------ date
  private val q14: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since_epoch"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("qtr_start"))

  private val q14Sql =
    """SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofmonth(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       strftime(o_orderdate, '%Y-%m') AS ym,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start
       FROM orders"""

  // ------------------------------------------------------------------ math
  private val q15: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        round(abs(col("l_extendedprice") - lit(30000.0)), 2).as("abs_dev"),
        floor(col("l_quantity") / 7).as("qty_div7"),
        ceil(col("l_extendedprice") / 1000).as("price_ceil_k"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        round(log(col("l_extendedprice") + 1), 4).as("price_ln"),
        round(log10(col("l_extendedprice") + 1), 4).as("price_log10"),
        (col("l_orderkey") % 7).as("key_mod7"),
        signum(col("l_extendedprice") - lit(30000.0)).cast("int").as("dev_sign"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("greatest_v"),
        least(col("l_quantity"), col("l_tax") * 100).as("least_v"))

  private val q15Sql =
    """SELECT l_orderkey,
       round(abs(l_extendedprice - 30000.0), 2) AS abs_dev,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_ceil_k,
       round(sqrt(l_extendedprice), 4) AS price_sqrt,
       round(pow(l_discount, 2), 6) AS disc_sq,
       round(ln(l_extendedprice + 1), 4) AS price_ln,
       round(log10(l_extendedprice + 1), 4) AS price_log10,
       l_orderkey % 7 AS key_mod7,
       CAST(sign(l_extendedprice - 30000.0) AS INT) AS dev_sign,
       greatest(l_quantity, l_discount * 100) AS greatest_v,
       least(l_quantity, l_tax * 100) AS least_v
       FROM lineitem WHERE l_linenumber = 1"""

  // ---------------------------------------------------------- conditional
  private val q16: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(sum(when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("returned_value"),
        round(sum(when(col("l_returnflag") =!= "R", col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("kept_value"),
        count(when(col("l_quantity") > 25, lit(1))).as("n_bulk"),
        round(avg(coalesce(nullif(col("l_discount"), lit(0.0)), lit(0.05))) + 1e-9, 6)
          .as("avg_disc_defaulted"))

  private val q16Sql =
    """SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS returned_value,
       round(sum(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS kept_value,
       count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
       round(avg(coalesce(nullif(l_discount, 0.0), 0.05)) + 1e-9, 6) AS avg_disc_defaulted
       FROM lineitem GROUP BY l_linestatus"""

  // ---------------------------------------------------------- grouping sets
  // rollup region → nation with grouping() markers so the NULL subtotal rows
  // are distinguishable (and hash identically across engines).
  private val q17: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("total_bal"),
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"))
  }

  private val q17Sql =
    """SELECT r_name, n_name, count(*) AS n_cust,
       round(sum(c_acctbal),2) AS total_bal,
       CAST(grouping(r_name) AS INT) AS g_region,
       CAST(grouping(n_name) AS INT) AS g_nation
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)"""

  // ---------------------------------------------------------------- having
  private val q18: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity")), 2).as("total_qty"))
      .where(col("n_lines") >= 8 && col("total_qty") > 200)

  private val q18Sql =
    """SELECT l_partkey, count(*) AS n_lines,
       round(sum(l_quantity),2) AS total_qty
       FROM lineitem GROUP BY l_partkey
       HAVING count(*) >= 8 AND round(sum(l_quantity),2) > 200"""

  // ------------------------------------------------------------- subquery
  // Correlated-subquery pattern (TPC-H Q17 shape): parts priced above 1.04×
  // the average of their own type — decorrelated to a window average, which
  // is how it should execute at scale (one shuffle, no re-scan per group).
  private val q19: Q = (s, dir) => {
    val w = Window.partitionBy(col("p_type"))
    t(s, dir, "part")
      .withColumn("type_avg", avg(col("p_retailprice")).over(w))
      .where(col("p_retailprice") > col("type_avg") * 1.04)
      .select(col("p_partkey"), col("p_type"), col("p_retailprice"),
        round(col("type_avg") + 1e-6, 2).as("type_avg_price"))
  }

  private val q19Sql =
    """SELECT p_partkey, p_type, p_retailprice,
       round(type_avg + 1e-6, 2) AS type_avg_price
       FROM (SELECT p_partkey, p_type, p_retailprice,
               avg(p_retailprice) OVER (PARTITION BY p_type) AS type_avg
             FROM part)
       WHERE p_retailprice > type_avg * 1.04"""

  // ------------------------------------------------------- scalar subquery
  private val q20: Q = (s, dir) => {
    val globalAvg = t(s, dir, "orders").agg(avg(col("o_totalprice")).as("ga"))
    t(s, dir, "orders")
      .join(broadcast(globalAvg))
      .where(col("o_totalprice") > col("ga") * 1.8)
      .select(col("o_orderkey"), col("o_totalprice"),
        round(col("ga") + 1e-6, 2).as("global_avg"))
  }

  private val q20Sql =
    """SELECT o_orderkey, o_totalprice,
       round((SELECT avg(o_totalprice) FROM orders) + 1e-6, 2) AS global_avg
       FROM orders
       WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8"""

  // ------------------------------------------------- distinct + percentile
  private val q21: Q = (s, dir) =>
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_cust"),
        round(expr("percentile(c_acctbal, 0.5)") + 1e-6, 2).as("median_bal"),
        round(min(col("c_acctbal")), 2).as("min_bal"),
        round(max(col("c_acctbal")), 2).as("max_bal"),
        round(stddev_samp(col("c_acctbal")) + 1e-6, 2).as("sd_bal"))

  private val q21Sql =
    """SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_cust,
       round(quantile_cont(c_acctbal, 0.5) + 1e-6, 2) AS median_bal,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(stddev_samp(c_acctbal) + 1e-6, 2) AS sd_bal
       FROM customer GROUP BY c_mktsegment"""

  // ------------------------------------------------------ collect_list/set
  private val q23: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_orderkey") < 100)
      .groupBy(col("l_orderkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("l_partkey")))).as("parts"),
        concat_ws(",", sort_array(collect_set(col("l_returnflag")))).as("flags"),
        size(collect_set(col("l_suppkey"))).as("n_supps"))

  private val q23Sql =
    """SELECT l_orderkey,
       array_to_string(list_sort(list(l_partkey)), ',') AS parts,
       array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
       CAST(len(list(DISTINCT l_suppkey)) AS INT) AS n_supps
       FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey"""

  // -------------------------------------------------------------- explode
  private val q24: Q = (s, dir) =>
    t(s, dir, "part")
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))

  private val q24Sql =
    """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part"""

  // -------------------------------------------- higher-order array functions
  // transform/filter/aggregate over an array built in-query: per order, the
  // quantities array and derived stats — exercises the lambda-function
  // surface without any UDF.
  private val q28: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_orderkey") < 200)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity"))).as("qtys"))
      .select(
        col("l_orderkey"),
        expr("array_join(transform(qtys, x -> cast(x * 2 as string)), ',')").as("doubled"),
        expr("size(filter(qtys, x -> x > 25))").as("n_large"),
        round(expr("aggregate(qtys, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"), 2).as("qty_sum"))

  private val q28Sql =
    """SELECT l_orderkey,
       array_to_string(list_transform(qtys, x -> CAST(x * 2 AS VARCHAR)), ',') AS doubled,
       CAST(len(list_filter(qtys, x -> x > 25)) AS INT) AS n_large,
       round(list_aggregate(qtys, 'sum'), 2) AS qty_sum
       FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
             FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey)"""

  val queries: Map[String, Q] = Map(
    "q13_string_functions" -> q13,
    "q14_date_functions" -> q14,
    "q15_math_functions" -> q15,
    "q16_conditional_agg" -> q16,
    "q17_rollup_grouping" -> q17,
    "q18_having" -> q18,
    "q19_window_decorrelated_subquery" -> q19,
    "q20_scalar_subquery" -> q20,
    "q21_distinct_percentile" -> q21,
    "q23_collect_list_set" -> q23,
    "q24_explode" -> q24,
    "q28_higher_order_arrays" -> q28)

  val oracles: Map[String, String] = Map(
    "q13_string_functions" -> q13Sql,
    "q14_date_functions" -> q14Sql,
    "q15_math_functions" -> q15Sql,
    "q16_conditional_agg" -> q16Sql,
    "q17_rollup_grouping" -> q17Sql,
    "q18_having" -> q18Sql,
    "q19_window_decorrelated_subquery" -> q19Sql,
    "q20_scalar_subquery" -> q20Sql,
    "q21_distinct_percentile" -> q21Sql,
    "q23_collect_list_set" -> q23Sql,
    "q24_explode" -> q24Sql,
    "q28_higher_order_arrays" -> q28Sql)
}
