package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.t

/** The SURVEY.md §2.3 checklist long tail: the full ranking-function
  * family, RANGE frames, cube/grouping-sets/pivot/unpivot, bag intersect,
  * map columns, approximate sketches (golden-pinned, partition-insensitive
  * — see q34), the UDF/UDAF/UDTF surface, and the round-4 SQL extensions
  * (recursive CTE, VARIANT, LATERAL, statistical aggregates). Everything
  * here carries an oracle; CoverageSpec adds the independent semantic
  * bounds for the sketches.
  */
object CoverageQueries {

  type Q = (SparkSession, String) => DataFrame

  // -------------------------------------------------- ranking function family
  private val q29: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w) + 1e-9, 5).as("pct_rank"),
        round(cume_dist().over(w) + 1e-9, 5).as("cume"))
      .where(col("rnk") <= 50)
  }

  private val q29Sql =
    """SELECT c_mktsegment, c_custkey, rnk, drnk, quartile, pct_rank, cume FROM (
         SELECT c_mktsegment, c_custkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w + 1e-9, 5) AS pct_rank,
           round(cume_dist() OVER w + 1e-9, 5) AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
       WHERE rnk <= 50"""

  // ------------------------------------------------------ RANGE window frame
  // Value-range frame: for each order, count of same-customer orders within
  // ±30 days — rangeBetween on a numeric day key (timestamps cast to epoch
  // days so the range arithmetic is integral and engine-portable).
  private val q30: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day").cast("long"))
      .rangeBetween(-30, 30)
    t(s, dir, "orders")
      .withColumn("day", datediff(col("o_orderdate"), lit("1995-01-01")))
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("orders_within_30d"),
        round(sum(col("o_totalprice")).over(w), 2).as("spend_within_30d"))
  }

  private val q30Sql =
    """SELECT o_custkey, o_orderkey,
       count(*) OVER w AS orders_within_30d,
       round(sum(o_totalprice) OVER w, 2) AS spend_within_30d
       FROM (SELECT *, datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day
             FROM orders)
       WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                    RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)"""

  // ----------------------------------------------------------------- cube
  private val q31: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("qty"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))

  private val q31Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity),2) AS qty,
       CAST(grouping(l_returnflag) AS INT) AS g_rf,
       CAST(grouping(l_linestatus) AS INT) AS g_ls
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""

  // -------------------------------------------------- bag intersect (ALL)
  private val q32: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.where(col("l_returnflag") === "A").select(col("l_partkey"))
      .intersectAll(l.where(col("l_linestatus") === "F").select(col("l_partkey")))
  }

  private val q32Sql =
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
       INTERSECT ALL
       SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'"""

  // ------------------------------------------------------- map-typed columns
  // Build a map in-query, then take it apart with map_keys/map_values/
  // element_at — output exploded to plain columns so the comparison is
  // engine-neutral (map render order is not portable).
  private val q33: Q = (s, dir) =>
    t(s, dir, "lineitem")
      // linenumbers can repeat within an order in this dataset: pre-aggregate
      // so map keys are unique
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(round(sum(col("l_quantity")), 2).as("ln_qty"))
      .groupBy(col("l_orderkey"))
      .agg(map_from_arrays(
        collect_list(concat(lit("ln"), col("l_linenumber"))),
        collect_list(col("ln_qty"))).as("qty_map"))
      .select(col("l_orderkey"),
        size(map_keys(col("qty_map"))).as("n_keys"),
        round(aggregate(map_values(col("qty_map")), lit(0.0), (a, x) => a + x), 2)
          .as("total_qty"),
        element_at(col("qty_map"), "ln1").as("first_line_qty"))

  private val q33Sql =
    """SELECT l_orderkey,
       CAST(cardinality(qty_map) AS INT) AS n_keys,
       round(list_aggregate(map_values(qty_map), 'sum'), 2) AS total_qty,
       map_extract(qty_map, 'ln1')[1] AS first_line_qty
       FROM (SELECT l_orderkey,
               map(list('ln' || l_linenumber), list(ln_qty)) AS qty_map
             FROM (SELECT l_orderkey, l_linenumber,
                     round(sum(l_quantity), 2) AS ln_qty
                   FROM lineitem GROUP BY l_orderkey, l_linenumber)
             GROUP BY l_orderkey)"""

  // --------------------------------------------- approximate sketches
  // approx_count_distinct (HLL++) and approx percentile: engine-specific
  // sketch internals DuckDB cannot replay, so the oracle is a golden
  // sf0.01 VALUES pin (t08 convention: regression signal only, valid at
  // the driver's gate scale). Pin-safety: HLL registers combine by
  // per-register max (merge-order-insensitive, xxhash64-seeded — no RNG),
  // and the percentile sketch is given an accuracy ABOVE the gate-scale
  // row count so its summaries never compress — the result is the exact
  // order statistic, independent of partition layout (a compressing
  // sketch's output varies with how rows split across partitions, which
  // would make any pin machine-dependent). At 100 TB you'd dial accuracy
  // back down; the operator surface is identical. CoverageSpec keeps the
  // independent semantic bound against the exact counterparts.
  private val q34: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000000))
          .as("approx_median_price"))

  private val q34Sql =
    """SELECT l_returnflag, CAST(approx_parts AS BIGINT) AS approx_parts,
              CAST(exact_parts AS BIGINT) AS exact_parts,
              CAST(approx_median_price AS DOUBLE) AS approx_median_price
       FROM (VALUES
         ('A', 1947, 2000, 52833.8),
         ('N', 1947, 2000, 53052.34),
         ('R', 1947, 2000, 53228.27))
       AS t(l_returnflag, approx_parts, exact_parts, approx_median_price)"""

  // ------------------------------------------------------------- UDAF surface
  // Custom Aggregator registered via functions.udaf (SURVEY.md §2.3; the
  // reference analog is arbitrary user folds in the Edgy monad,
  // /root/reference/src/Edgy/Operations.hs:88-89). The aggregation is one
  // built-ins can't express exactly: money summed in integer cents — exact,
  // associative, merge-safe (map-side partial aggregation holds by integer
  // associativity), summation-order-independent unlike sum(double).
  private val q35: Q = (s, dir) => {
    val revCents = udaf(graft.functions.RevenueCentsAgg,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble))
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        revCents(col("l_extendedprice"), col("l_quantity")).as("revenue_cents"),
        count(lit(1)).as("n"))
  }

  // CAST the sum to BIGINT: DuckDB widens sum(BIGINT) to HUGEINT (the same
  // type artifact as the e04 session_idx), while the Aggregator emits Long.
  private val q35Sql =
    """SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n
       FROM lineitem GROUP BY l_returnflag"""

  // ------------------------------------------------- GROUPING SETS (literal)
  // The explicit enumeration form (rollup = q17 and cube = q31 cover the
  // sugar; this is the general shape): per (flag, status), per flag, grand
  // total — expressed via spark.sql because GROUPING SETS has no DataFrame
  // API verb.
  private val q36: Q = (s, dir) => {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q36")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_quantity), 2) AS qty,
         CAST(grouping(l_returnflag) AS INT) AS g_rf,
         CAST(grouping(l_linestatus) AS INT) AS g_ls
         FROM lineitem_q36
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
  }

  private val q36Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty,
       CAST(grouping(l_returnflag) AS INT) AS g_rf,
       CAST(grouping(l_linestatus) AS INT) AS g_ls
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""

  // ------------------------------------------------------- scalar UDF surface
  // The row-at-a-time scalar escape hatch (SURVEY.md §2.3 "scalar →
  // udf((x: T) => …)"; reference analog: filterM with a user predicate,
  // app/Main.hs:136). Library stance stays built-ins-first — this entry
  // exists to prove the registration path works and is oracle-checkable.
  // The UDF parses the numeric key embedded in TPC-H names
  // ("Customer#000000042" → 42).
  private val q37: Q = (s, dir) => {
    val keyFromName = udf((name: String) =>
      if (name == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(name.substring(name.indexOf('#') + 1)))
    s.udf.register("key_from_name", keyFromName)
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        keyFromName(col("c_name")).as("parsed_key"))
      .where(col("parsed_key") =!= col("c_custkey") * 2) // exercise in a predicate too
      .withColumn("consistent", col("parsed_key") === col("c_custkey"))
  }

  private val q37Sql =
    """SELECT c_custkey, c_name,
       CAST(split_part(c_name, '#', 2) AS BIGINT) AS parsed_key,
       CAST(split_part(c_name, '#', 2) AS BIGINT) = c_custkey AS consistent
       FROM customer
       WHERE CAST(split_part(c_name, '#', 2) AS BIGINT) <> c_custkey * 2"""

  // -------------------------------------------------------------- UDTF surface
  // Table-generating function via typed Dataset.flatMap (SURVEY.md §2.3
  // "table-generating → flatMap on Dataset[T]"; reference analog: concatMapM,
  // app/Main.hs:152). Each order row fans out to one row per comment word —
  // arbitrary user Scala in the row→rows position, encoder-checked.
  private val q38: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (key, text) =>
        text.split(' ').filter(_.nonEmpty).map(w => (key, w, w.length))
      }
      .toDF("doc_id", "word", "word_len")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"), sum(col("word_len")).as("total_len"))
      .where(col("n") >= 50)
  }

  private val q38Sql =
    """SELECT word, count(*) AS n, CAST(sum(len(word)) AS BIGINT) AS total_len
       FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       WHERE word <> ''
       GROUP BY word HAVING count(*) >= 50"""

  // ------------------------------------------------------------------- pivot
  // Wide reshape: one column per line status, values = summed quantity.
  // The DataFrame pivot with an explicit value list keeps the single
  // aggregation shuffle (no extra pass to discover pivot values) — the
  // 100 TB form; the oracle is the equivalent conditional aggregation.
  /** The pivoted per-status quantity table — ONE definition shared by q39
    * and q43 so the unpivot stays the structural inverse of the pivot.
    */
  private def pivotedQty(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))

  private val q39: Q = (s, dir) =>
    pivotedQty(s, dir)
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))

  private val q39Sql =
    """SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
       FROM lineitem GROUP BY l_returnflag"""

  // ----------------------------------------------- recursive CTE (q40)
  // A monthly calendar spine spanning the order-date range — including
  // months with zero orders, which a plain GROUP BY cannot produce —
  // left-joined to per-month counts. The oracle replays the spine with a
  // DuckDB recursive CTE.
  //
  // Two physical plans, one answer (CoverageSpec pins the equivalence):
  // the SHIPPED plan unrolls the spine into ONE `sequence()` explode —
  // Spark recursive-CTE steps re-plan and schedule a job PER LEVEL, so
  // even the carried-bound recursion pays ~80 × job floor (measured
  // 0.89s at sf0.1 against DuckDB's 0.02s; the naive bounds-cross-join
  // recursion was 15.7s). The generator form is one agg + one explode +
  // one broadcast join — no per-level anything, and at 100 TB the spine
  // is still ~a thousand rows. [[q40Recursive]] keeps the genuine
  // WITH RECURSIVE surface exercised (Spark 4.1 UNION ALL bounded
  // recursion, carrying `hi` in the working set) as the law-checked twin.
  private val q40: Q = (s, dir) => {
    import s.implicits._
    // ONE distributed job: the per-month agg (calendar-bounded result —
    // ~80 rows here, a few thousand at any scale). Spine construction
    // and the left join are then pure driver arithmetic over that
    // bounded result; the bounds need no second orders scan because
    // min/max month ARE monthly's min/max keys.
    val monthly = t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mon"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val lo = monthly.keys.min[java.time.LocalDate](_ compareTo _)
    val hi = monthly.keys.max[java.time.LocalDate](_ compareTo _)
    Iterator.iterate(lo)(_.plusMonths(1)).takeWhile(!_.isAfter(hi))
      .map(m => (m.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM")),
        monthly.getOrElse(m, 0L)))
      .toSeq.toDF("month", "n_orders")
  }

  /** The WITH RECURSIVE twin of [[q40]] — the SQL-surface coverage this
    * query exists for, dispatched out of the hot path because each
    * recursion level schedules its own job (~80 × job floor for a spine
    * a single `sequence()` call produces). CoverageSpec pins
    * recursive ≡ generator on the same data.
    */
  private[graft] def q40Recursive(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_q40")
    s.sql("""
      WITH RECURSIVE bounds AS (
        SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
        FROM orders_q40),
      cal(mon, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT add_months(mon, 1), hi FROM cal WHERE mon < hi),
      monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon, count(*) AS n
        FROM orders_q40 GROUP BY 1)
      SELECT date_format(mon, 'yyyy-MM') AS month,
             coalesce(n, CAST(0 AS BIGINT)) AS n_orders
      FROM cal LEFT JOIN monthly USING (mon)""")
  }

  private val q40Sql =
    """WITH RECURSIVE bounds AS (
         SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
                CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
         FROM orders),
       cal(mon, hi) AS (
         SELECT lo, hi FROM bounds
         UNION ALL
         SELECT CAST(mon + INTERVAL 1 MONTH AS DATE), hi FROM cal WHERE mon < hi),
       monthly AS (
         SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon, count(*) AS n
         FROM orders GROUP BY 1)
       SELECT strftime(mon, '%Y-%m') AS month,
              coalesce(n, CAST(0 AS BIGINT)) AS n_orders
       FROM cal LEFT JOIN monthly USING (mon)"""

  // --------------------------------------------- VARIANT semi-structured (q41)
  // Spark 4's open-ended semi-structured type: parse_json → VARIANT once,
  // then typed paths via variant_get and runtime type introspection via
  // schema_of_variant — the schema-on-read surface for JSON columns whose
  // shape isn't declared up front (vs e03's schema'd from_json). The
  // oracle replays the extraction with DuckDB's JSON functions; the
  // introspected type string is a derived constant for this fixture.
  private val q41: Q = (s, dir) => {
    t(s, dir, "events").createOrReplaceTempView("events_q41")
    s.sql("""
      SELECT event_id,
             variant_get(parse_json(props), '$.k', 'bigint') AS k_int,
             variant_get(parse_json(props), '$.k', 'string') AS k_str,
             schema_of_variant(parse_json(props)) AS vtype
      FROM events_q41""")
  }

  private val q41Sql =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       'OBJECT<k: BIGINT>' AS vtype
       FROM events"""

  // ------------------------------------------- LATERAL correlated subquery
  // Per-customer top-3 orders through a correlated LATERAL derived table —
  // the "for each row, run this subquery" join surface, complementary to
  // the window-function top-k (q07): Catalyst decorrelates it into the
  // same rank-then-filter shape rather than executing per-row. Rounded
  // price + orderkey tiebreak keep both engines' LIMIT deterministic.
  private val q42: Q = (s, dir) => {
    t(s, dir, "customer").createOrReplaceTempView("customer_q42")
    t(s, dir, "orders").createOrReplaceTempView("orders_q42")
    s.sql("""
      SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
      FROM customer_q42 c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders_q42 o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t""")
  }

  private val q42Sql =
    """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
       FROM customer c,
       LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                WHERE o.o_custkey = c.c_custkey
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t"""

  // ----------------------------------------------------------- unpivot (q43)
  // The inverse of q39: melt the pivoted per-status quantity columns back
  // to (flag, status, qty) rows via the unpivot operator (`stack` in
  // Spark). NULL cells (flag x status combinations with no rows) are
  // dropped by both engines' unpivot semantics.
  private val q43: Q = (s, dir) =>
    pivotedQty(s, dir)
      .select(col("l_returnflag"),
        expr("stack(2, 'F', F, 'O', O) AS (l_linestatus, qty)"))
      .where(col("qty").isNotNull)

  private val q43Sql =
    """SELECT l_returnflag, l_linestatus, qty
       FROM (SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F",
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O"
             FROM lineitem GROUP BY l_returnflag)
       UNPIVOT (qty FOR l_linestatus IN ("F", "O"))"""

  // ------------------------------------------- statistical aggregates (q44)
  // The order-statistics + moments family: exact median, population
  // stddev/variance, and the bivariate corr/covar pair — all with
  // engine-identical definitions (population forms; sample variants differ
  // in Bessel handling across engines). 4dp rounding + the 1e-9 nudge
  // absorbs summation-order ulps.
  private val q44: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(median(col("l_quantity")) + 1e-9, 4).as("med_qty"),
        round(stddev_pop(col("l_quantity")) + 1e-9, 4).as("sd_qty"),
        round(var_pop(col("l_quantity")) + 1e-9, 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")) + 1e-9, 4).as("corr_qp"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")) + 1e-9, 4)
          .as("covar_qp"))

  private val q44Sql =
    """SELECT l_returnflag,
       round(median(l_quantity) + 1e-9, 4) AS med_qty,
       round(stddev_pop(l_quantity) + 1e-9, 4) AS sd_qty,
       round(var_pop(l_quantity) + 1e-9, 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice) + 1e-9, 4) AS corr_qp,
       round(covar_pop(l_quantity, l_extendedprice) + 1e-9, 4) AS covar_qp
       FROM lineitem GROUP BY l_returnflag"""

  // ------------------------------------------------- salted skew join (q45)
  // The explicit skew-salting operator (graft.operators.SaltedJoin), graded
  // on its DISPATCH: lineitem→supplier has uniform keys and a dim side
  // that fits the broadcast threshold at every sf, so the right plan is a
  // plain broadcast join with no salt replication — the operator must
  // choose it itself (salting here would pay 8× replication for nothing;
  // SaltedJoinSpec pins the forced-salting spread law separately). The
  // oracle IS the plain join, so dispatch to either plan must match it.
  private val q45: Q = (s, dir) =>
    graft.operators.SaltedJoin.join(
      t(s, dir, "lineitem"),
      t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey")),
      keys = Seq("l_suppkey"), salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))

  private val q45Sql =
    """SELECT s_nationkey, count(*) AS n_lines,
       round(sum(l_extendedprice), 2) AS revenue
       FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       GROUP BY s_nationkey"""

  // --------------------------------------- ordered-set aggregates (q46)
  // mode / arg-extremes / ordered listagg — the "which value" aggregate
  // family that replaces a self-join-on-max. Determinism rules: mode is
  // tie-free on l_linenumber (its frequency is strictly decreasing by
  // construction of lineitem); the arg-max/min ORDER VALUE is
  // (round(price*100) * 1e8 + orderkey) — an exact-integer composite that
  // makes every ordering value unique, since DuckDB's arg_max cannot take
  // a struct tiebreak; listagg is DISTINCT + WITHIN GROUP ordered. All via
  // one map-side-combinable aggregation, no window, no self-join.
  private val q46: Q = (s, dir) => {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q46")
    s.sql("""
      SELECT l_returnflag,
             mode(l_linenumber) AS mode_ln,
             max_by(l_orderkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) * 100000000
                 + l_orderkey) AS top_price_order,
             min_by(l_orderkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) * 100000000
                 + l_orderkey) AS bottom_price_order,
             listagg(DISTINCT l_linestatus, ',')
               WITHIN GROUP (ORDER BY l_linestatus) AS statuses
      FROM lineitem_q46 GROUP BY l_returnflag""")
  }

  private val q46Sql =
    """SELECT l_returnflag,
       mode(l_linenumber) AS mode_ln,
       arg_max(l_orderkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) * 100000000
           + l_orderkey) AS top_price_order,
       arg_min(l_orderkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) * 100000000
           + l_orderkey) AS bottom_price_order,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
       FROM lineitem GROUP BY l_returnflag"""

  // ---------------------------- ignore-nulls analytic windows (q47)
  // The sparse-column carry family: first/last non-null per partition and
  // positional nth_value — the gap-fill idiom (e05's as-of machinery uses
  // the same last(ignoreNulls) kernel). Tie-free ordering (date, orderkey
  // unique) makes Spark's ROWS default frame and DuckDB's RANGE default
  // coincide.
  private val q47: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val fPrice = when(col("o_orderstatus") === "F", col("o_totalprice"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(fPrice, ignoreNulls = true).over(w).as("first_f"),
        last(fPrice, ignoreNulls = true).over(wFull).as("last_f"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_total"))
  }

  private val q47Sql =
    """SELECT o_custkey, o_orderkey,
       first_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
         IGNORE NULLS) OVER w AS first_f,
       last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
         IGNORE NULLS) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_f,
       nth_value(o_totalprice, 2) OVER w AS second_total
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  val queries: Map[String, Q] = Map(
    "q29_ranking_functions" -> q29,
    "q30_range_frame_window" -> q30,
    "q31_cube" -> q31,
    "q32_bag_intersect" -> q32,
    "q33_map_functions" -> q33,
    "q34_approx_sketches" -> q34,
    "q35_udaf_exact_money" -> q35,
    "q36_grouping_sets" -> q36,
    "q37_scalar_udf" -> q37,
    "q38_udtf_flatmap" -> q38,
    "q39_pivot" -> q39,
    "q40_recursive_cte" -> q40,
    "q41_variant" -> q41,
    "q42_lateral_topn" -> q42,
    "q43_unpivot" -> q43,
    "q44_stat_aggregates" -> q44,
    "q45_salted_skew_join" -> q45,
    "q46_ordered_set_aggs" -> q46,
    "q47_ignore_nulls_windows" -> q47)

  val oracles: Map[String, String] = Map(
    "q29_ranking_functions" -> q29Sql,
    "q30_range_frame_window" -> q30Sql,
    "q31_cube" -> q31Sql,
    "q32_bag_intersect" -> q32Sql,
    "q33_map_functions" -> q33Sql,
    "q34_approx_sketches" -> q34Sql,
    "q35_udaf_exact_money" -> q35Sql,
    "q36_grouping_sets" -> q36Sql,
    "q37_scalar_udf" -> q37Sql,
    "q38_udtf_flatmap" -> q38Sql,
    "q39_pivot" -> q39Sql,
    "q40_recursive_cte" -> q40Sql,
    "q41_variant" -> q41Sql,
    "q42_lateral_topn" -> q42Sql,
    "q43_unpivot" -> q43Sql,
    "q44_stat_aggregates" -> q44Sql,
    "q45_salted_skew_join" -> q45Sql,
    "q46_ordered_set_aggs" -> q46Sql,
    "q47_ignore_nulls_windows" -> q47Sql)
}
