package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al. 2023,
  * public): score every raw document by the log-likelihood ratio of a
  * TARGET distribution vs the RAW distribution under a hashed bag-of-ngrams
  * model, so a 100-TB crawl can be resampled toward a small high-quality
  * target domain without training a classifier.
  *
  * Model: token -> bucket via the portable 64-bit hash mod `buckets`;
  * both distributions are add-one-smoothed bucket multinomials; a
  * document's weight is sum over its token INSTANCES of
  * ln p_target(b) - ln p_raw(b).
  *
  * Scale shape: one pass builds both bucket tables simultaneously (the
  * target is flagged per row, counted with a conditional sum — no second
  * scan of the corpus); the per-bucket log-ratio table has exactly
  * `buckets` rows and joins back BROADCAST, so scoring is map-side; the
  * only wide exchange is the per-document sum. Nothing here is
  * proportional to corpus size except the two streaming aggregations.
  */
object Dsir {

  /** (idCol, n_tokens, weight) for every document; `targetFilter` marks the
    * target-domain rows (they stay in the raw distribution too, as in the
    * paper's setup where target ⊂ raw is permitted).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetFilter: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "need buckets >= 2")
    val toks = docs.select(col(idCol), targetFilter.as("__t"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col(idCol), col("__t"),
        pmod(TextOps.portableHash64(col("tok")), lit(buckets.toLong)).as("b"))
    val stats = toks.groupBy("b").agg(
      count(lit(1)).as("r"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("t"))
    val tot = stats.agg(sum("r").as("rTot"), sum("t").as("tTot"))
    val lr = stats.crossJoin(tot).select(col("b"),
      (log((col("t") + 1).cast("double") / (col("tTot") + buckets)) -
        log((col("r") + 1).cast("double") / (col("rTot") + buckets))).as("lr"))
    toks.join(broadcast(lr), "b")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_tokens"),
        sum("lr").as("weight"))
  }
}
