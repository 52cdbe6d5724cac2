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

  /** Streaming events (user_id, ts, event_type) -> funnel-advance updates.
    * `steps` is the ordered event-type sequence.
    */
  def progress(events: DataFrame, steps: Seq[String]): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        graft.ops.EventOps.epochMicros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        advance(steps))
  }
}
