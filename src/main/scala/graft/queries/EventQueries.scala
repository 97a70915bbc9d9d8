package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.t

/** Time-series / event-stream surface over the `events` table (SURVEY.md
  * §2.3 windows + streaming-adjacent batch semantics). Timestamps never
  * leave a query raw: everything derived is formatted to strings or epoch
  * numbers so Spark (us, UTC session) and DuckDB (us, naive) hash
  * identically.
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------ tumbling window
  // Hourly tumbling aggregation — the batch image of the streaming windowed
  // agg (same grouping the Structured Streaming entry uses). At scale this
  // is a single shuffle on (hour, type); partial aggs absorb the volume.
  // group on the RAW truncated timestamp (an 8-byte long key) and format
  // only the aggregated output rows: date_format on the grouping key ran
  // a formatter + string hash per INPUT row through both countDistinct
  // exchanges — hours×types rows pay it now instead of millions
  private val e01: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"), col("n_users"))

  private val e01Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       count(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1, 2"""

  // ------------------------------------------------------- sliding window
  // 3-hour sliding window advancing hourly, via explode of the window slots
  // each event belongs to — the batch equivalent of window(ts, '3 hours',
  // '1 hour'). Deterministic: slots are pure arithmetic on epoch hours.
  private val e02: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("hour_epoch", (unix_timestamp(col("ts")) / 3600).cast("long"))
      .withColumn("slot", explode(sequence(col("hour_epoch") - 2, col("hour_epoch"))))
      .groupBy(col("slot"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(avg(col("value")) + 1e-6, 2).as("avg_value"))
      .withColumn("window_start",
        date_format(timestamp_seconds(col("slot") * 3600), "yyyy-MM-dd HH:mm:ss"))
      .drop("slot")

  private val e02Sql =
    """SELECT event_type, count(*) AS n_events, round(avg(value) + 1e-6, 2) AS avg_value,
       strftime(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL (slot * 3600) SECOND,
                '%Y-%m-%d %H:%M:%S') AS window_start
       FROM (SELECT e.*, unnest(generate_series(he - 2, he)) AS slot
             FROM (SELECT *, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS he FROM events) e)
       GROUP BY slot, event_type"""

  // ------------------------------------------------------------- JSON ops
  private val e03: Q = (s, dir) =>
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k_struct"))
      .withColumn("k_bucket", col("k") % 10)

  private val e03Sql =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
       FROM events"""

  // -------------------------------------------------------- sessionization
  // Gap-based sessions (30 min): lag → gap flag → cumulative session index —
  // the batch image of session_window(ts, '30 minutes'). Two window passes
  // over the same (user_id, ts) partitioning → one shuffle at scale.
  private val e04: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"),
        round(sum(col("value")), 2).as("session_value"))
  }

  /** The lag/cumsum sessionization subquery — SINGLE source of truth for
    * the session convention shared by the e04/e07/s02/s05 oracles: 1800s
    * gap, (ts, event_id) tie-break, and session_idx CAST to BIGINT (DuckDB
    * widens a windowed sum(INTEGER) to HUGEINT while Spark emits BIGINT).
    */
  private[queries] val sessionizedEventsSql =
    """SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         FROM (
           SELECT *, CASE WHEN prev_ts IS NULL
                            OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1
                          ELSE 0 END AS new_session
           FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_ts FROM events))"""

  /** The full per-(user, session_idx) aggregation — e04's oracle, reused
    * verbatim as s02's (the streaming path promises the identical result).
    */
  private[queries] val sessionAggSql =
    s"""SELECT user_id, session_idx, count(*) AS n_events,
       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_sec,
       round(sum(value), 2) AS session_value
       FROM ($sessionizedEventsSql)
       GROUP BY user_id, session_idx"""

  private val e04Sql = sessionAggSql

  // ------------------------------------------------------------ as-of join
  // For every purchase, the most recent signup of the same user at-or-before
  // its timestamp — through the reusable graft.operators.AsOf operator
  // (union + carry-forward: ONE shuffle on user_id, no range cross join;
  // see AsOf.scala for the scale rationale).
  private val e05: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    graft.operators.AsOf.join(
      left = ev.where(col("event_type") === "purchase"),
      right = ev.where(col("event_type") === "signup"),
      on = Seq("user_id"), ts = "ts",
      rightCols = Map("ts" -> "signup_ts"),
      tieBreak = Seq("event_id"))
      .select(
        col("event_id"),
        col("user_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("signup_ts")))
          .as("sec_since_signup"))
  }

  private val e05Sql =
    """SELECT event_id, user_id,
       CAST(floor(epoch(ts)) - floor(epoch(signup_ts)) AS BIGINT) AS sec_since_signup
       FROM (
         SELECT *, last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                  OVER (PARTITION BY user_id
                        ORDER BY ts, kind_rank, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_ts
         FROM (SELECT *, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS kind_rank
               FROM events WHERE event_type IN ('signup', 'purchase')))
       WHERE event_type = 'purchase'"""

  // ------------------------------------------------- dedup-by-latest state
  // Last event per user (dropDuplicates-by-key after ordering) — the batch
  // image of streaming dropDuplicates + state compaction.
  private val e06: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
  }

  private val e06Sql =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_seen
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM events)
       WHERE rn = 1"""

  // ------------------------------------------- builtin session_window variant
  // The same 30-minute gap sessions as e04, but through Spark's builtin
  // session_window (SURVEY.md §2.3 names it explicitly) — one shuffle on
  // user_id, session merging inside the aggregation operator instead of two
  // window passes. Output keyed by (start, end) since the builtin exposes
  // the merged interval, not an index; end = last event + gap.
  private val e07: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("session_value"))

  // Oracle = the e04 lag/cumsum sessionization re-keyed to (min ts, max ts +
  // gap) — the interval the builtin reports. Session split convention is
  // diff > 1800 on both sides (session_window merges when the next event's
  // window [ts, ts+gap) overlaps-or-touches the current session interval).
  /** e04's sessions re-keyed to the builtin's (start, end) interval. */
  private[queries] val sessionIntervalSql =
    s"""SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
       FROM ($sessionizedEventsSql)
       GROUP BY user_id, session_idx"""

  private val e07Sql = sessionIntervalSql

  // ------------------------------------------------------ cohort retention
  // The classic activation analysis: users bucketed by first-seen day,
  // activity counted per (cohort, day-offset) — the retention matrix.
  // Scale shape: the first-seen aggregation and the self-join both key on
  // user_id, so Catalyst reuses one exchange; the final matrix aggregation
  // is tiny (days × days).
  private val e08: Q = (s, dir) => {
    val ev = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(firstDay, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("active_users"))
  }

  private val e08Sql =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
       fd AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
       SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
              CAST(datediff('day', cohort_day, day) AS INT) AS day_offset,
              count(DISTINCT ev.user_id) AS active_users
       FROM ev JOIN fd USING (user_id)
       GROUP BY fd.cohort_day, datediff('day', cohort_day, day)"""

  // --------------------------------------------------- funnel analysis
  // Ordered three-step conversion (view → click → purchase): per user, the
  // first view, the first click strictly AFTER that view, the first
  // purchase strictly after that click — order-sensitive, so a click
  // before any view doesn't count. Stage = how far the user got (1-3).
  // Scale shape: three aggregations all keyed on user_id — one exchange,
  // reused (same pattern as e08); each step's input is pre-filtered to one
  // event type before the join, so raw volume never re-shuffles.
  private val e09: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    def typed(et: String) =
      ev.filter(col("event_type") === et).select(col("user_id"), col("ts"))
    val v = typed("view").groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = v.join(typed("click"), Seq("user_id"), "left")
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(when(col("ts") > col("t_view"), col("ts"))).as("t_click"))
    val p = c.join(typed("purchase"), Seq("user_id"), "left")
      .groupBy(col("user_id"), col("t_view"), col("t_click"))
      .agg(min(when(col("ts") > col("t_click"), col("ts"))).as("t_purchase"))
    p.select(
      col("user_id"),
      (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
        + when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"),
      date_format(col("t_view"), "yyyy-MM-dd HH:mm:ss").as("t_view"),
      date_format(col("t_click"), "yyyy-MM-dd HH:mm:ss").as("t_click"),
      date_format(col("t_purchase"), "yyyy-MM-dd HH:mm:ss").as("t_purchase"))
  }

  private val e09Sql =
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
       c AS (SELECT v.user_id, v.t_view,
                    min(CASE WHEN e.ts > v.t_view THEN e.ts END) AS t_click
             FROM v LEFT JOIN events e
               ON e.user_id = v.user_id AND e.event_type = 'click'
             GROUP BY v.user_id, v.t_view),
       p AS (SELECT c.user_id, c.t_view, c.t_click,
                    min(CASE WHEN e.ts > c.t_click THEN e.ts END) AS t_purchase
             FROM c LEFT JOIN events e
               ON e.user_id = c.user_id AND e.event_type = 'purchase'
             GROUP BY c.user_id, c.t_view, c.t_click)
       SELECT user_id,
              CAST(1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
                     + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS INT)
                AS stage,
              strftime(t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
              strftime(t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
              strftime(t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase
       FROM p"""

  // ------------------------------- event-type transition matrix (e10)
  // First-order Markov transitions per user stream: for each consecutive
  // event pair in (ts, event_id) order, count (from_type → to_type) and
  // the per-source transition probability. ONE user_id exchange (the lag
  // window), then a tiny (types × types) aggregate; the probability is a
  // window share over the matrix — the sequence-model / funnel-discovery
  // primitive.
  private val e10: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFrom = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") / sum(col("n")).over(wFrom) + 1e-9, 4))
  }

  private val e10Sql =
    """WITH pairs AS (
         SELECT lag(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS from_type,
                event_type AS to_type
         FROM events),
       m AS (SELECT from_type, to_type, count(*) AS n
             FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2)
       SELECT from_type, to_type, n,
              round(n * 1.0 / sum(n) OVER (PARTITION BY from_type) + 1e-9, 4)
                AS p
       FROM m"""

  // ---------------------------- trailing-window anomaly scores (e11)
  // Monitoring-style anomaly detection: hourly event counts per type,
  // z-scored against the trailing 24 observed hours (current hour
  // excluded). Rows emit once 12 trailing points exist and the trailing
  // std is positive; the anomaly verdict compares the ROUNDED z (the t25
  // boundary rule). One (type, hour) aggregation + one type-keyed window
  // — the window frame is row-ordered, so both engines fold the trailing
  // stats in the identical order.
  private val e11: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-24, -1)
    t(s, dir, "events")
      .groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600).cast("long").as("h"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_prior", count(col("n")).over(w))
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sd", stddev_samp(col("n")).over(w))
      .where(col("n_prior") >= 12 && col("sd") > 0)
      .select(col("event_type"),
        date_format(timestamp_seconds(col("h") * 3600), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("n"),
        round(col("mu") + 1e-9, 4).as("trailing_mean"),
        round((col("n") - col("mu")) / col("sd") + 1e-9, 4).as("z"))
      .withColumn("anomaly", abs(col("z")) > 2.0)
  }

  private val e11Sql =
    """WITH hourly AS (
         SELECT event_type,
                CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT) AS h,
                count(*) AS n
         FROM events GROUP BY 1, 2),
       scored AS (
         SELECT event_type, h, n,
                count(n) OVER w AS n_prior,
                avg(n) OVER w AS mu,
                stddev_samp(n) OVER w AS sd
         FROM hourly
         WINDOW w AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT event_type,
              strftime(TIMESTAMP '1970-01-01 00:00:00'
                + INTERVAL (h * 3600) SECOND, '%Y-%m-%d %H:%M:%S') AS hour_start,
              n, round(mu + 1e-9, 4) AS trailing_mean,
              round((n - mu) / sd + 1e-9, 4) AS z,
              abs(round((n - mu) / sd + 1e-9, 4)) > 2.0 AS anomaly
       FROM scored WHERE n_prior >= 12 AND sd > 0"""

  val queries: Map[String, Q] = Map(
    "e01_tumbling_window" -> e01,
    "e02_sliding_window" -> e02,
    "e03_json_extraction" -> e03,
    "e04_sessionization" -> e04,
    "e05_asof_join" -> e05,
    "e06_latest_per_key" -> e06,
    "e07_session_window" -> e07,
    "e08_cohort_retention" -> e08,
    "e09_funnel" -> e09,
    "e10_transition_matrix" -> e10,
    "e11_anomaly_zscores" -> e11)

  val oracles: Map[String, String] = Map(
    "e01_tumbling_window" -> e01Sql,
    "e02_sliding_window" -> e02Sql,
    "e03_json_extraction" -> e03Sql,
    "e04_sessionization" -> e04Sql,
    "e05_asof_join" -> e05Sql,
    "e06_latest_per_key" -> e06Sql,
    "e07_session_window" -> e07Sql,
    "e08_cohort_retention" -> e08Sql,
    "e09_funnel" -> e09Sql,
    "e10_transition_matrix" -> e10Sql,
    "e11_anomaly_zscores" -> e11Sql)
}
