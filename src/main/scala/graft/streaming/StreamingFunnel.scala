package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel: the per-user step state machine of
  * [[graft.ops.EventOps.funnel]] kept as flatMapGroupsWithState custom
  * state across micro-batches. Emits the user's funnel progress whenever
  * it ADVANCES (update mode); state is one (step, times) record per user —
  * bounded by funnel depth, independent of event volume.
  *
  * Ordering contract: within each batch the group's events are processed
  * in ts order; ACROSS batches the machine only moves forward, so the
  * result equals the batch funnel whenever each user's events arrive in
  * non-decreasing ts order across batches (the normal production feed).
  * A cross-batch late event older than the machine's position cannot
  * retroactively improve an earlier step — the same forward-only trade
  * every watermark-bounded streaming operator makes (cf.
  * [[StreamingDedup]]'s re-admission caveat).
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)
  /** TTL-path row: keeps the watermarked timestamp column alive through the
    * typed plan (projecting it away would strip the watermark the
    * event-time timeout needs).
    */
  case class FunnelEventTs(user_id: Long, ts: java.sql.Timestamp,
                           ts_us: Long, event_type: String)
  case class FunnelState(step: Int, times: Seq[Long])
  case class FunnelUpdate(user: Long, step: Int, times: Seq[Long])

  /** Per-batch group update: fold the ts-sorted events through the step
    * machine (strictly increasing ts between consecutive steps, matching
    * the batch operator's tie semantics).
    */
  private def advance(steps: Seq[String])(userId: Long,
      rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelUpdate] = {
    val prev = state.getOption.getOrElse(FunnelState(0, Seq.empty))
    var step = prev.step
    var times = prev.times
    rows.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
      if (step < steps.size && e.event_type == steps(step) &&
        (step == 0 || e.ts_us > times.last)) {
        step += 1
        times = times :+ e.ts_us
      }
    }
    if (step != prev.step) {
      state.update(FunnelState(step, times))
      Iterator.single(FunnelUpdate(userId, step, times))
    } else Iterator.empty
  }

  /** TTL flavor of [[advance]] (VERDICT r3 next #8): same step machine,
    * plus an event-time timeout re-armed to (latest event in this batch +
    * idle horizon). On timeout the user's state row is REMOVED — an
    * abandoned funnel stops costing state; a user who comes back restarts
    * from step 0, the standard attribution-window semantics.
    */
  private def advanceTtl(steps: Seq[String], idleMs: Long)(userId: Long,
      rows: Iterator[FunnelEventTs],
      state: GroupState[FunnelState]): Iterator[FunnelUpdate] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var maxTsMs = Long.MinValue
      val buffered = rows.map { e =>
        maxTsMs = math.max(maxTsMs, e.ts_us / 1000L)
        FunnelEvent(e.user_id, e.ts_us, e.event_type)
      }
      val out = advance(steps)(userId, buffered, state) // consumes `buffered` eagerly
      // keep abandoned-but-armed funnels evictable even when no event
      // advanced the machine: state must exist for the timeout to be set
      if (state.getOption.isEmpty) state.update(FunnelState(0, Seq.empty))
      state.setTimeoutTimestamp(
        math.max(maxTsMs + idleMs, state.getCurrentWatermarkMs() + 1))
      out
    }
  }

  /** Streaming events (user_id, ts, event_type) -> funnel-advance updates.
    * `steps` is the ordered event-type sequence. `idleTimeoutSeconds > 0`
    * (the production shape on an unbounded user keyspace) watermarks the
    * stream and evicts a user's funnel state once the watermark passes
    * their last event + the idle horizon — mirroring [[StreamingDedup]]'s
    * watermark-bounded contract; 0 keeps unbounded state (test use).
    */
  def progress(events: DataFrame, steps: Seq[String],
               idleTimeoutSeconds: Long = 0L): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        graft.ops.EventOps.epochMicros(col("ts")).as("ts_us"),
        col("event_type"))
    if (idleTimeoutSeconds <= 0L)
      typed.select("user_id", "ts_us", "event_type").as[FunnelEvent]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
          advance(steps))
    else
      typed.withWatermark("ts", s"$idleTimeoutSeconds seconds")
        .select("user_id", "ts", "ts_us", "event_type").as[FunnelEventTs]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
          advanceTtl(steps, idleTimeoutSeconds * 1000L))
  }
}
