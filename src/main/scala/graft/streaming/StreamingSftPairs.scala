package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.io.Turn

/** Streaming twin of [[graft.extract.Extractor.sftPairs]]: instruction
  * pairs materialize AS THE TRANSCRIPTS ARRIVE — each assistant turn pairs
  * with the nearest preceding user turn of its conversation, held as
  * per-conversation state (one (idx, text) tuple) across micro-batches, so
  * a prompt in batch N and its response in batch N+7 still pair.
  *
  * Semantics contract: identical to the batch op under per-conversation
  * event-order delivery (the transcript producer's natural order); within
  * one micro-batch arrival order is repaired by a turn_idx sort of the
  * group's rows. A user turn always REPLACES the held prompt regardless of
  * length — exactly like the batch window — and the minChars gate applies
  * per emitted pair, so a short user turn shadows an earlier long one
  * there too.
  *
  * State-TTL contract: state is one tuple per ACTIVE conversation;
  * `idleTimeoutSeconds > 0` watermarks the stream and evicts conversations
  * idle past the horizon (the [[Sessionize]]/[[StreamingDedup]] contract —
  * a turn arriving after eviction sees no prompt and re-primes from its
  * own conversation's later user turns).
  */
object StreamingSftPairs {

  case class PromptState(lastUserIdx: Int, lastUserText: String)
  case class SftPair(conv_id: String, turn_idx: Int, prompt: String, response: String)

  private def fold(minChars: Int)(convId: String, rows: Iterator[Turn],
                                  state: GroupState[PromptState]): Iterator[SftPair] = {
    val prev = state.getOption.getOrElse(PromptState(-1, null))
    var lastIdx = prev.lastUserIdx
    var lastText = prev.lastUserText
    val out = Seq.newBuilder[SftPair]
    rows.toSeq.sortBy(_.turn_idx).foreach { t =>
      if (t.role == "user") {
        if (t.turn_idx > lastIdx) { lastIdx = t.turn_idx; lastText = t.text }
      } else if (t.role == "assistant" && lastText != null &&
        t.turn_idx > lastIdx &&
        t.text.length >= minChars && lastText.length >= minChars) {
        out += SftPair(convId, t.turn_idx, lastText, t.text)
      }
    }
    state.update(PromptState(lastIdx, lastText))
    out.result().iterator
  }

  private def foldTtl(minChars: Int, idleMs: Long)(convId: String,
      rows: Iterator[Turn], state: GroupState[PromptState]): Iterator[SftPair] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var maxTsMs = Long.MinValue
      val buffered = rows.map { t => maxTsMs = math.max(maxTsMs, t.ts.getTime); t }
      val out = fold(minChars)(convId, buffered, state)
      state.setTimeoutTimestamp(
        math.max(maxTsMs + idleMs, state.getCurrentWatermarkMs() + 1))
      out
    }
  }

  /** Streaming Dataset[Turn] -> appended instruction pairs. */
  def pairs(turns: Dataset[Turn], minChars: Int = 1,
            idleTimeoutSeconds: Long = 0L): Dataset[SftPair] = {
    val spark = turns.sparkSession
    import spark.implicits._
    if (idleTimeoutSeconds <= 0L)
      turns.groupByKey(_.conv_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
          fold(minChars))
    else
      turns.withWatermark("ts", s"$idleTimeoutSeconds seconds")
        .groupByKey(_.conv_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          foldTtl(minChars, idleTimeoutSeconds * 1000L))
  }
}
