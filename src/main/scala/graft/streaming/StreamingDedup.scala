package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming deduplication for a continuously-ingested corpus (engine
  * addition; the reference is batch-only): exact and signature-level dedup
  * across micro-batches with WATERMARK-BOUNDED state.
  *
  * `dropDuplicatesWithinWatermark` keeps first-seen rows and drops
  * re-arrivals of the same key until the event-time watermark passes the
  * stored row's timestamp + the watermark delay, then evicts the key's
  * state. That bound is the 100-TB-ingest shape — unbounded
  * `dropDuplicates` state on a feed of 10^9 docs/day never stops growing —
  * at the documented cost of re-admitting a duplicate that reappears after
  * the horizon (downstream batch dedup catches those; this op is the
  * in-flight filter that keeps the hot path small).
  */
object StreamingDedup {

  /** Exact streaming dedup: first document per content hash (md5 of
    * `textCol`) within the watermark horizon passes; later identical
    * payloads are dropped. State per distinct hash, evicted by watermark.
    */
  def dedupByContent(docs: DataFrame, tsCol: String, textCol: String,
                     delay: String): DataFrame =
    dedupByKey(docs, tsCol, delay, md5(col(textCol)))

  /** Signature-level streaming dedup: drops documents whose 60-bit SimHash
    * (the native one-pass codegen kernel) equals an already-admitted one —
    * i.e. the identical-signature clusters the batch LSH path collapses to
    * representatives, filtered at ingest instead. Token-order/multiset
    * changes that flip no hash bit are treated as duplicates by design.
    */
  def dedupBySimHash(docs: DataFrame, tsCol: String, textCol: String,
                     delay: String, bits: Int = 60): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sig = Bridge.column(graft.functions.PortableSimHash(
      Bridge.expression(graft.ops.TextOps.tokens(col(textCol))), bits))
    dedupByKey(docs, tsCol, delay, sig)
  }

  /** Shared shape: stamp the dedup key as a column, watermark, drop
    * duplicates within the horizon, strip the key column again.
    */
  private def dedupByKey(docs: DataFrame, tsCol: String, delay: String,
                         key: Column): DataFrame = {
    require(!docs.columns.contains("__dedup_key"),
      "input already has a __dedup_key column")
    docs.withColumn("__dedup_key", key)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__dedup_key")
      .drop("__dedup_key")
  }
}
