package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.EventOps

/** Driver-checked queries for the event-stream relational operators
  * (as-of join, gap sessionization) over the events table. The ev_asof
  * oracle uses DuckDB's NATIVE `ASOF JOIN` — the Spark union-tag plan must
  * reproduce another engine's built-in as-of semantics exactly, not just a
  * hand-rolled SQL rewrite of itself.
  */
object EventQueries {

  private def events(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/events.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_asof" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
      // one right row per (user, ts) — max event_id — so ties are pinned
      // on BOTH engines (DuckDB ASOF picks an arbitrary row among exact-ts
      // duplicates; the dedupe removes the ambiguity, asofJoin's
      // rightIdCol tie-break covers the Spark side regardless)
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      val j = EventOps.asofJoin(purchases, clicks, "user_id", "ts",
        rightIdCol = "click_id", rightCols = Seq("click_id"))
      j.agg(
        count(lit(1)).cast("bigint").as("n_purchases"),
        count(col("matched_ts")).cast("bigint").as("matched"),
        sum(EventOps.epochMicros(col("ts")) - EventOps.epochMicros(col("matched_ts")))
          .cast("bigint").as("sum_lag_us"),
        sum("matched_click_id").cast("bigint").as("click_checksum"),
        max(EventOps.epochMicros(col("ts")) - EventOps.epochMicros(col("matched_ts")))
          .cast("bigint").as("max_lag_us"))
    }),

    "ev_range" -> ((s, dir) => {
      val ev = events(s, dir)
      // promo windows: every 50th event opens a 1-hour interval
      val iv = ev.where(col("event_id") % 50 === 0)
        .select(col("event_id").as("ivl_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("end_ts"))
      val pts = ev.select("event_id", "ts", "user_id")
      val j = EventOps.rangeJoin(pts, "ts", iv, "start_ts", "end_ts",
        binSeconds = 1800L)
      j.agg(
        count(lit(1)).cast("bigint").as("n_pairs"),
        countDistinct(col("event_id")).cast("bigint").as("matched_points"),
        countDistinct(col("ivl_id")).cast("bigint").as("hit_intervals"),
        sum(col("event_id") * col("ivl_id")).cast("bigint").as("pair_checksum"),
        max(EventOps.epochMicros(col("ts")) - EventOps.epochMicros(col("start_ts")))
          .cast("bigint").as("max_offset_us"))
    }),

    "ev_sessions" -> ((s, dir) => {
      val sess = EventOps.gapSessions(events(s, dir), "user_id", "ts",
        "event_id", gapSeconds = 1800)
      val perSession = sess.groupBy("user_id", "session_idx").agg(
        count(lit(1)).as("n_ev"),
        (max(EventOps.epochMicros(col("ts"))) - min(EventOps.epochMicros(col("ts")))).as("dur_us"))
      perSession.agg(
        count(lit(1)).cast("bigint").as("n_sessions"),
        max("n_ev").cast("bigint").as("max_session_events"),
        count(when(col("n_ev") === 1, 1)).cast("bigint").as("singleton_sessions"),
        sum("dur_us").cast("bigint").as("total_duration_us"),
        sum(col("user_id") * (col("session_idx") + 1))
          .cast("bigint").as("session_checksum"))
    }),

    "ev_rolling" -> ((s, dir) => {
      // trailing 10-minute per-user window; the rolled value is an integer
      // (event_id % 97) so every aggregate below is exact on both engines
      val ev = events(s, dir).withColumn("v", col("event_id") % 97)
      val r = EventOps.rollingWindow(ev, "user_id", "ts",
        windowSeconds = 600, valueCol = "v")
      r.agg(
        count(lit(1)).cast("bigint").as("n_events"),
        sum("roll_cnt").cast("bigint").as("sum_roll_cnt"),
        max("roll_cnt").cast("bigint").as("max_roll_cnt"),
        sum("roll_sum").cast("bigint").as("sum_roll_sum"),
        sum(col("roll_cnt") * col("event_id")).cast("bigint").as("roll_checksum"))
    }),

    "ev_retention" -> ((s, dir) =>
      // daily cohorts over the 30-day log: full (cohort, offset) matrix
      EventOps.retention(events(s, dir), "user_id", "ts", periodSeconds = 86400L)
        .orderBy("cohort", "offset")),

    "ev_funnel" -> ((s, dir) => {
      // view -> click -> purchase conversion over the whole event log
      val f = EventOps.funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      f.agg(
        count(lit(1)).cast("bigint").as("n_step1"),
        count(col("t_2")).cast("bigint").as("n_step2"),
        count(col("t_3")).cast("bigint").as("n_step3"),
        sum(col("t_3") - col("t_1")).cast("bigint").as("span_us_sum"),
        max(col("t_3") - col("t_1")).cast("bigint").as("span_us_max"),
        sum(when(col("t_3").isNotNull, col("user"))).cast("bigint")
          .as("converted_checksum"))
    }),

    "ev_sliding" -> ((s, dir) => {
      // 10-minute windows sliding by 5 — every event lands in exactly two
      // epoch-aligned windows; integer value so sums are engine-exact
      val ev = events(s, dir).withColumn("v", col("event_id") % 91)
      EventOps.slidingCounts(ev, "ts", sizeSeconds = 600, slideSeconds = 300,
        valueCol = "v")
        .select((EventOps.epochMicros(col("window_start"))).as("ws_us"),
          col("cnt"), col("sum_v").cast("bigint").as("sum_v"))
        .orderBy("ws_us")
    }))

  val oracleSql: Map[String, String] = Map(
    "ev_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.user_id, p.ts, c.ts AS matched_ts, c.click_id
        |  FROM p ASOF LEFT JOIN clicks c
        |    ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(count(matched_ts) AS BIGINT) AS matched,
        |       CAST(sum(epoch_us(ts) - epoch_us(matched_ts)) AS BIGINT) AS sum_lag_us,
        |       CAST(sum(click_id) AS BIGINT) AS click_checksum,
        |       CAST(max(epoch_us(ts) - epoch_us(matched_ts)) AS BIGINT) AS max_lag_us
        |FROM j""".stripMargin,

    "ev_range" ->
      """WITH i AS (
        |  SELECT event_id AS ivl_id, ts AS start_ts,
        |         ts + INTERVAL 1 HOUR AS end_ts
        |  FROM events WHERE event_id % 50 = 0),
        |j AS (
        |  SELECT e.event_id, e.ts, i.ivl_id, i.start_ts
        |  FROM events e JOIN i
        |    ON e.ts >= i.start_ts AND e.ts < i.end_ts)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(count(DISTINCT event_id) AS BIGINT) AS matched_points,
        |       CAST(count(DISTINCT ivl_id) AS BIGINT) AS hit_intervals,
        |       CAST(sum(event_id * ivl_id) AS BIGINT) AS pair_checksum,
        |       CAST(max(epoch_us(ts) - epoch_us(start_ts)) AS BIGINT) AS max_offset_us
        |FROM j""".stripMargin,

    "ev_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |n AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev IS NULL
        |                OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
        |           AS session_idx
        |  FROM n),
        |g AS (
        |  SELECT user_id, session_idx, count(*) AS n_ev,
        |         max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
        |  FROM s GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |       CAST(max(n_ev) AS BIGINT) AS max_session_events,
        |       CAST(count(*) FILTER (WHERE n_ev = 1) AS BIGINT) AS singleton_sessions,
        |       CAST(sum(dur_us) AS BIGINT) AS total_duration_us,
        |       CAST(sum(user_id * (session_idx + 1)) AS BIGINT) AS session_checksum
        |FROM g""".stripMargin,

    "ev_rolling" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tsu, event_id % 97 AS v
        |  FROM events),
        |r AS (
        |  SELECT event_id,
        |         count(*) OVER w AS roll_cnt,
        |         sum(v) OVER w AS roll_sum
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu
        |               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW))
        |SELECT CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(roll_cnt) AS BIGINT) AS sum_roll_cnt,
        |       CAST(max(roll_cnt) AS BIGINT) AS max_roll_cnt,
        |       CAST(sum(roll_sum) AS BIGINT) AS sum_roll_sum,
        |       CAST(sum(roll_cnt * event_id) AS BIGINT) AS roll_checksum
        |FROM r""".stripMargin,

    "ev_retention" ->
      """WITH ue AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS period
        |  FROM events),
        |c AS (SELECT u, min(period) AS cohort FROM ue GROUP BY 1)
        |SELECT c.cohort, ue.period - c.cohort AS "offset",
        |       CAST(count(DISTINCT ue.u) AS BIGINT) AS active_users
        |FROM ue JOIN c ON c.u = ue.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS u, min(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS u, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN s1 ON s1.u = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS u, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN s2 ON s2.u = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1),
        |f AS (
        |  SELECT s1.u, s1.t1, s2.t2, s3.t3
        |  FROM s1 LEFT JOIN s2 ON s2.u = s1.u LEFT JOIN s3 ON s3.u = s1.u)
        |SELECT CAST(count(*) AS BIGINT) AS n_step1,
        |       CAST(count(t2) AS BIGINT) AS n_step2,
        |       CAST(count(t3) AS BIGINT) AS n_step3,
        |       CAST(sum(t3 - t1) AS BIGINT) AS span_us_sum,
        |       CAST(max(t3 - t1) AS BIGINT) AS span_us_max,
        |       CAST(sum(u) FILTER (WHERE t3 IS NOT NULL) AS BIGINT)
        |         AS converted_checksum
        |FROM f""".stripMargin,

    "ev_sliding" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) AS t, event_id % 91 AS v FROM events),
        |cand AS (
        |  SELECT (t // 300000000) * 300000000 AS ws, v FROM ev
        |  UNION ALL
        |  SELECT (t // 300000000) * 300000000 - 300000000 AS ws, v FROM ev)
        |SELECT ws AS ws_us, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(v) AS BIGINT) AS sum_v
        |FROM cand GROUP BY ws ORDER BY ws""".stripMargin)
}
