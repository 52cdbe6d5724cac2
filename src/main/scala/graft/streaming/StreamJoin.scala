package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join (engine addition; the reference is
  * batch-only): correlate two LIVE event streams on a key within a bounded
  * trailing time window — the streaming twin of the batch attribution
  * shapes (`EventOps.asofJoin` / `rangeJoin`).
  *
  * Structured Streaming buffers both sides in state until the other side
  * can no longer produce a match; that is only decidable when BOTH streams
  * carry a watermark AND the join condition bounds the event-time gap.
  * This helper pins that contract: without the time-range conjunct the
  * join state grows without bound on a production feed.
  */
object StreamJoin {

  /** Inner join: every left row paired with every right row of the same
    * `keyCol` whose `tsCol` lies in `[left.ts - lookbackSeconds, left.ts]`
    * (the trailing attribution window; `<=` on both ends, so an
    * equal-timestamp right row matches). Right-side columns are suffixed
    * `_r`. `delay` is the event-time watermark for both sides — state for
    * a buffered row is dropped once the opposite watermark passes its
    * latest possible match.
    *
    * Works identically on static DataFrames (the batch twin the
    * StreamingSpec equivalence test runs), since the join condition is
    * plain Catalyst — streams just add the state-eviction semantics.
    */
  def within(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
             lookbackSeconds: Long, delay: String): DataFrame = {
    require(lookbackSeconds >= 0, "lookbackSeconds must be >= 0")
    val renamed = right.columns.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, c + "_r"))
    val l = if (left.isStreaming) left.withWatermark(tsCol, delay) else left
    val r = if (renamed.isStreaming) renamed.withWatermark(tsCol + "_r", delay)
            else renamed
    l.join(r,
      col(keyCol) === col(keyCol + "_r") &&
        col(tsCol + "_r") <= col(tsCol) &&
        col(tsCol + "_r") >= col(tsCol) - expr(s"INTERVAL $lookbackSeconds SECONDS"))
  }
}
