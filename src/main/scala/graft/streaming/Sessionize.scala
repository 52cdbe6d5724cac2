package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.io.Turn

/** Stateful streaming over the transcripts stream: per-conversation running
  * state via flatMapGroupsWithState (KeyValueGroupedDataset custom state,
  * SURVEY.md §2.10 — beyond the batch-only reference). Emits an updated
  * conversation summary whenever new turns arrive for it.
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

  /** Streaming Dataset[Turn] -> per-conversation running summaries. */
  def conversationSummaries(turns: Dataset[Turn]): Dataset[ConvUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateConv)
  }
}
