package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators Spark lacks as primitives: as-of join
  * and gap-based sessionization. Both are single-shuffle window plans —
  * partitioned by the join/session key, ordered by time — never a range
  * cross-join; skew follows the per-key event volume, the same contract as
  * the streaming Sessionize path.
  */
object EventOps {

  /** Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns (parquet
    * event times read as NTZ; `unix_micros` alone rejects NTZ). The NTZ →
    * TIMESTAMP cast interprets the value in the SESSION time zone — every
    * entry point in this engine pins it to UTC, which also matches
    * DuckDB's naive `epoch_us`, so the oracle compares identical integers.
    */
  def epochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Trailing time-range window features: for every row, count / sum / mean
    * of `valueCol` over the same key's rows in [ts - windowSeconds, ts]
    * (inclusive both ends — `rangeBetween` and DuckDB's `RANGE BETWEEN x
    * PRECEDING AND CURRENT ROW` both include the frame bounds). Appends
    * `roll_cnt`, `roll_sum`, `roll_mean`.
    *
    * The frame is a RANGE frame over epoch micros, so simultaneous events
    * (exact-ts ties) all see the full tie group — deterministic without an
    * intra-ts ordering. One shuffle on the key; each key is one ordered
    * scan. Scale note: a window cannot be salted (the frame is
    * order-dependent), so a pathologically hot key serializes on one task —
    * the standard mitigation is upstream per-entity partitioning (user ids
    * are high-cardinality by construction) rather than a plan change.
    */
  def rollingWindow(df: DataFrame, keyCol: String, tsCol: String,
                    windowSeconds: Long, valueCol: String): DataFrame = {
    require(windowSeconds >= 0, "windowSeconds must be >= 0")
    val w = Window.partitionBy(keyCol).orderBy(epochMicros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, Window.currentRow)
    // one select, one shared spec: chained withColumn calls would each plant
    // their own Window operator (fresh ordering alias per call defeats
    // CollapseWindow) — 3x the sort work for the same result
    df.select(col("*"),
      count(lit(1)).over(w).cast("bigint").as("roll_cnt"),
      sum(col(valueCol)).over(w).as("roll_sum"),
      avg(col(valueCol)).over(w).as("roll_mean"))
  }

  /** Cohort retention: bucket time into `periodSeconds` periods, assign
    * each user to the cohort of their FIRST active period, and count the
    * distinct cohort members active at each later offset — one row per
    * (cohort, offset) with `active_users`. offset 0 is the cohort size by
    * construction.
    *
    * Scale shape: one distinct on (user, period) — the only pass over the
    * raw stream — then a user-keyed min aggregation and a user-keyed join
    * back; the final count groups on the tiny (cohort, offset) key space.
    * Period ids use exact long floor division (ADVICE r3: the double
    * division was exact only for the documented magnitudes; near the
    * half-ulp boundary it could floor into the wrong period and diverge
    * from the oracle's integer `//`).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val p = periodSeconds * 1000000L
    val ue = events.select(col(userCol).as("user"),
      floorDiv(epochMicros(col(tsCol)), p).as("period")).distinct()
    val cohorts = ue.groupBy("user").agg(min("period").as("cohort"))
    ue.join(cohorts, "user")
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count_distinct(col("user")).as("active_users"))
  }

  /** Funnel analysis: for an ordered step sequence (event types), the
    * per-user earliest completion times — one row per user who reached
    * step 1, with `t_1 .. t_n` epoch-micro columns, null from the first
    * step the user never reached. Matching is greedy-earliest with
    * STRICTLY increasing timestamps (an equal-ts event does not advance
    * the funnel); greedy is complete — if any increasing chain exists,
    * the earliest-first chain exists.
    *
    * Scale shape: one filtered aggregation per step, each joined on the
    * user key against the (shrinking) reached-set — k steps cost k
    * equi-shuffles over progressively smaller frames, never a per-user
    * sort or a window over the whole event stream.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user"))
      .agg(min(epochMicros(col(tsCol))).as("t_1"))
    steps.tail.zipWithIndex.foreach { case (s, i) =>
      val k = i + 1 // previous step index (1-based)
      val next = events.where(col(typeCol) === s)
        .select(col(userCol).as("user"), epochMicros(col(tsCol)).as("__ts"))
        .join(acc.select(col("user"), col(s"t_$k").as("__prev")), "user")
        .where(col("__ts") > col("__prev"))
        .groupBy("user").agg(min("__ts").as(s"t_${k + 1}"))
      acc = acc.join(next, Seq("user"), "left_outer")
    }
    acc
  }

  /** Sliding-window aggregation: count / sum of `valueCol` per
    * epoch-aligned window of `sizeSeconds` sliding by `slideSeconds`
    * (Spark `window()` semantics: an event at t belongs to every window
    * with start in (t - size, t] on the slide grid, i.e. size/slide
    * windows). Returns (window_start, window_end, cnt, sum_v).
    *
    * One groupBy shuffle on the window struct; the per-event window fanout
    * is size/slide rows — bounded and explicit, the streaming-compatible
    * shape (`readStream` + the identical expression is the stream twin).
    */
  def slidingCounts(df: DataFrame, tsCol: String, sizeSeconds: Long,
                    slideSeconds: Long, valueCol: String): DataFrame = {
    require(sizeSeconds > 0 && slideSeconds > 0 && sizeSeconds % slideSeconds == 0,
      "size must be a positive multiple of slide")
    df.groupBy(window(col(tsCol), s"$sizeSeconds seconds", s"$slideSeconds seconds"))
      .agg(count(lit(1)).cast("bigint").as("cnt"), sum(col(valueCol)).as("sum_v"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("cnt"), col("sum_v"))
  }

  /** As-of join: for every left row, the single most recent right row of
    * the same `keyCol` with `right.tsCol <= left.tsCol` (backward as-of,
    * the market-data/attribution semantics; DuckDB's `ASOF JOIN` — which
    * the oracle twin uses verbatim — matches it).
    *
    * Implementation is the union-tag trick, NOT a range join: both sides
    * are unioned with a side tag, one window pass per key carries the
    * last-seen right payload forward (`last(..., ignoreNulls)` over
    * (ts, side) order, right-before-left on ties so an equal-timestamp
    * right row is visible), and left rows are filtered back out. ONE
    * shuffle on `keyCol`, O(n log n) per key for the sort — a range join
    * would be O(n_l * n_r) per key.
    *
    * Output: every left row (all left columns) plus, from the matched
    * right row, `tsCol` as `matched_ts` and each `rightCols` column as
    * `matched_<name>` — all null when no right row precedes the left row.
    *
    * Determinism: ties on (key, ts) WITHIN the right side are broken by
    * the greatest `rightIdCol`, pinning the result (and oracle parity)
    * when timestamps collide.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightIdCol: String,
               rightCols: Seq[String]): DataFrame = {
    val payloadCols = (tsCol +: rightCols).distinct
    val lpay = struct(left.columns.map(col).toIndexedSeq: _*)
    val rpay = struct(payloadCols.map(col).toIndexedSeq: _*)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)).toIndexedSeq)
    val l = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(1).as("__side"), lit(null).cast("long").as("__rid"),
      lpay.as("__lpay"), lit(null).cast(rType).as("__rpay"))
    val r = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(0).as("__side"), col(rightIdCol).cast("long").as("__rid"),
      lit(null).cast(lType).as("__lpay"), rpay.as("__rpay"))
    // right rows sort before left rows at equal ts (side 0 < 1) so <= ties
    // match; among right ties the greatest __rid wins (sorted last)
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols =
      col("__matched").getField(tsCol).as("matched_ts") +:
        rightCols.map(c => col("__matched").getField(c).as(s"matched_$c"))
    l.union(r)
      .withColumn("__matched", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__lpay.*") +: matchedCols.toIndexedSeq: _*)
  }

  /** Floor division on long columns (`div` truncates toward zero — wrong
    * for pre-epoch timestamps). Subtracting the positive mod first makes
    * the numerator an exact multiple of `d`; the double division is then
    * exact while |c| < 2^53 µs (~year 2255), same exactness reasoning as
    * `Curation.packChunksGlobal`'s integral `div`.
    */
  private def floorDiv(c: Column, d: Long): Column =
    ((c - ((c % d) + d) % d) / d).cast("long")

  /** Interval (range) join: one row per (point, interval) pair with
    * `start <= ts < end` (half-open, the SQL range-join convention the
    * DuckDB oracle twin states literally as `ts >= start AND ts < end`).
    *
    * Spark has no range-join strategy: the naive
    * `points.join(intervals, ts >= start && ts < end)` plans a
    * BroadcastNestedLoopJoin (or worse, a CartesianProduct) — O(n_p * n_i)
    * comparisons, a non-starter once the interval side outgrows a
    * broadcast. This instead bins time into fixed `binSeconds` buckets:
    * each point maps to exactly ONE bin, each interval explodes to the
    * bins it covers, and the join is a hash EQUI-join on the bin id with
    * the exact range predicate as a residual filter. A matching pair is
    * found exactly once (the point's single bin is among the interval's
    * covered bins), so no post-join dedup is needed. Shuffle keys are time
    * bins — skew follows time density and is tunable via `binSeconds`.
    *
    * The interval explosion is bounded by `maxBinsPerInterval` with a
    * runtime `raise_error` guard (same philosophy as the embedding-cosine
    * block audit): an unexpectedly long interval fails loudly instead of
    * silently materializing an unbounded bin list. Pick `binSeconds` near
    * the typical interval length — one output row per interval-bin, ~2
    * bins per interval at the default.
    *
    * Column contract: output = all point columns ++ all interval columns;
    * the two schemas must be disjoint (rename on the way in).
    */
  def rangeJoin(points: DataFrame, tsCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                binSeconds: Long = 3600L,
                maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"rangeJoin: column names clash across sides: $clash")
    val binUs = binSeconds * 1000000L
    val p = points.withColumn("__bin", floorDiv(epochMicros(col(tsCol)), binUs))
    val sBin = floorDiv(epochMicros(col(startCol)), binUs)
    val eBin = floorDiv(epochMicros(col(endCol)) - 1, binUs) // end exclusive
    val i = intervals
      .where(epochMicros(col(endCol)) > epochMicros(col(startCol)))
      .withColumn("__bin", explode(
        when(eBin - sBin >= maxBinsPerInterval.toLong,
          raise_error(concat(
            lit(s"rangeJoin: interval covers >= $maxBinsPerInterval bins of " +
              s"$binSeconds s (start="), col(startCol).cast("string"),
            lit(", end="), col(endCol).cast("string"),
            lit("); raise binSeconds or maxBinsPerInterval"))))
          .otherwise(sequence(sBin, eBin))))
    p.join(i, Seq("__bin"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
      .select((points.columns ++ intervals.columns).map(col).toIndexedSeq: _*)
  }

  /** Gap-based sessionization (batch twin of
    * [[graft.streaming.Sessionize]]'s stateful shape): events of one
    * `keyCol` whose successive `tsCol` gaps are <= `gapSeconds` share a
    * session. Appends `session_idx` (0-based per key, in time order) and
    * `session_id` ("<key>#<idx>"). Ties on ts are ordered by `idCol` so
    * the assignment is deterministic. One shuffle on the key; two chained
    * window passes over the same (key, ts, id) sort — Spark folds them
    * into one sort.
    */
  def gapSessions(events: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val newSession = when(
      lag(col(tsCol), 1).over(order).isNull ||
        epochMicros(col(tsCol)) - epochMicros(lag(col(tsCol), 1).over(order)) >
          gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("session_idx",
        sum(newSession).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .withColumn("session_id",
        concat(col(keyCol).cast("string"), lit("#"), col("session_idx")))
  }

  /** First/last-touch conversion attribution: for every conversion event
    * (`typeCol` == `conversionType`), find the earliest and latest touch
    * event (`typeCol` in `touchTypes`) of the same `keyCol` STRICTLY before
    * the conversion and within `lookbackSeconds`. Returns the conversion
    * rows with `first_touch_type` / `last_touch_type` (null when no touch
    * in window).
    *
    * One shuffle on the key: both models are RANGE-frame window aggregates
    * over the same (key, ts-micros) sort, so Spark folds them into a single
    * exchange+sort — no self-join, no per-conversion scan. Ties (equal ts)
    * are pinned by (ts, idCol) through a zero-padded sortable encoding so
    * both engines pick the same touch row.
    */
  def attribution(events: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, typeCol: String,
                  conversionType: String, touchTypes: Seq[String],
                  lookbackSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(epochMicros(col(tsCol)))
      .rangeBetween(-lookbackSeconds * 1000000L, -1L)
    // sortable encoding: ts then id pin the row, the type rides along
    val key = concat(
      lpad(epochMicros(col(tsCol)).cast("string"), 20, "0"), lit(":"),
      lpad(col(idCol).cast("string"), 12, "0"), lit(":"), col(typeCol))
    val touchKey = when(col(typeCol).isin(touchTypes: _*), key)
    events
      .withColumn("first_touch_type",
        substring_index(min(touchKey).over(w), ":", -1))
      .withColumn("last_touch_type",
        substring_index(max(touchKey).over(w), ":", -1))
      .where(col(typeCol) === conversionType)
  }

  /** Rolling z-score anomaly detection: flag rows whose integer `valueCol`
    * deviates more than `zThresh` trailing standard deviations from the
    * same key's previous `lookback` values. Appends `roll_n`, `roll_sum`,
    * `roll_sumsq` (trailing frame, EXCLUDING the current row) and
    * `is_anomaly`.
    *
    * The z-test is evaluated in exact integer arithmetic — `(n·v − s)² >
    * z²·(n·q − s²)` is `(v − μ)² > z²σ²` cleared of denominators — so the
    * flag is bit-stable across engines (no float in the decision), which is
    * why `valueCol` must be integral and `zThresh` is an Int. Rows with
    * fewer than `minPoints` trailing values are never flagged (cold start).
    * ANSI overflow throws; safe while `lookback·max|v|²` fits a long.
    *
    * One shuffle on the key, one ordered scan per key (ROWS frame over
    * (ts, tieCol) so exact-ts ties are deterministically ordered); the
    * same no-salting scale contract as [[rollingWindow]].
    */
  def rollingZAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, valueCol: String,
                        lookback: Int = 20, minPoints: Int = 10,
                        zThresh: Int = 3): DataFrame = {
    require(lookback > 0 && minPoints > 1 && zThresh > 0,
      "lookback/minPoints/zThresh out of range")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(epochMicros(col(tsCol)), col(tieCol))
      .rowsBetween(-lookback, -1)
    val v = col(valueCol).cast("long")
    val withRoll = df.select(col("*"),
      count(lit(1)).over(w).cast("bigint").as("roll_n"),
      coalesce(sum(v).over(w), lit(0L)).as("roll_sum"),
      coalesce(sum(v * v).over(w), lit(0L)).as("roll_sumsq"))
    val n = col("roll_n"); val s = col("roll_sum"); val q = col("roll_sumsq")
    val dev = n * v - s
    withRoll.withColumn("is_anomaly",
      n >= minPoints && dev * dev > lit(zThresh.toLong * zThresh) * (n * q - s * s))
  }
}
