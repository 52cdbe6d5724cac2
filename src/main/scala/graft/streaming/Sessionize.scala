package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.io.Turn

/** Stateful streaming over the transcripts stream: per-conversation running
  * state via flatMapGroupsWithState (KeyValueGroupedDataset custom state,
  * SURVEY.md §2.10 — beyond the batch-only reference). Emits an updated
  * conversation summary whenever new turns arrive for it.
  *
  * State-TTL contract (VERDICT r3 next #8): per-conversation state is
  * bounded in SIZE by construction (three counters), but on an unbounded
  * conversation keyspace the number of state ROWS grows forever unless
  * idle keys are evicted. `idleTimeoutSeconds > 0` (the production shape)
  * watermarks the turn stream and arms an EVENT-TIME timeout per
  * conversation: when the watermark passes the conversation's last turn
  * + the idle horizon, its state row is dropped — mirroring
  * [[StreamingDedup]]'s watermark-bounded contract, with the same
  * documented trade: a turn arriving after eviction restarts that
  * conversation's summary from zero. `idleTimeoutSeconds = 0` keeps the
  * unbounded semantics (test/finite-keyspace use).
  */
object Sessionize {

  case class ConvState(turns: Long, toolCalls: Long, lastTurnIdx: Int)
  case class ConvUpdate(conv_id: String, turns: Long, tool_calls: Long, last_turn_idx: Int)

  def updateConv(convId: String, rows: Iterator[Turn],
                 state: GroupState[ConvState]): Iterator[ConvUpdate] = {
    val prev = state.getOption.getOrElse(ConvState(0L, 0L, -1))
    var turns = prev.turns
    var tools = prev.toolCalls
    var last = prev.lastTurnIdx
    rows.foreach { t =>
      turns += 1
      if (t.role == "tool") tools += 1
      if (t.turn_idx > last) last = t.turn_idx
    }
    val next = ConvState(turns, tools, last)
    state.update(next)
    Iterator.single(ConvUpdate(convId, next.turns, next.toolCalls, next.lastTurnIdx))
  }

  /** TTL flavor of [[updateConv]]: same fold, plus the event-time timeout
    * re-armed to (latest turn in this batch + idle horizon). On timeout the
    * state row is REMOVED and nothing is emitted (the last update already
    * carried the final summary).
    */
  private def updateConvTtl(idleMs: Long)(convId: String, rows: Iterator[Turn],
      state: GroupState[ConvState]): Iterator[ConvUpdate] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var maxTsMs = Long.MinValue
      val buffered = rows.map { t => maxTsMs = math.max(maxTsMs, t.ts.getTime); t }
      val out = updateConv(convId, buffered, state)
      // the timeout timestamp must sit strictly past the current watermark
      state.setTimeoutTimestamp(
        math.max(maxTsMs + idleMs, state.getCurrentWatermarkMs() + 1))
      out
    }
  }

  /** Streaming Dataset[Turn] -> per-conversation running summaries.
    * `idleTimeoutSeconds > 0` bounds state by evicting conversations idle
    * past that event-time horizon (see the object scaladoc).
    */
  def conversationSummaries(turns: Dataset[Turn],
                            idleTimeoutSeconds: Long = 0L): Dataset[ConvUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    if (idleTimeoutSeconds <= 0L)
      turns.groupByKey(_.conv_id)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateConv)
    else
      turns.withWatermark("ts", s"$idleTimeoutSeconds seconds")
        .groupByKey(_.conv_id)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
          updateConvTtl(idleTimeoutSeconds * 1000L))
  }
}
