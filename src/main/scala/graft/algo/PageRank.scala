package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank with graph-tool's conventions (`centrality.py:81-98` calls
  * `graph_tool.centrality.pagerank`): the *unnormalized* fixpoint
  * PR(v) = (1 - d) + d * sum_{(u,v) in E} PR(u) / outdeg(u),
  * damping d = 0.85, L1 convergence epsilon = 1e-6, parallel edges counted
  * with multiplicity, dangling vertices contribute nothing.
  *
  * DataFrame-iterative: one shuffle join per iteration against a cached
  * (src, dst, out_deg) link table; lineage truncated via localCheckpoint.
  */
object PageRank {

  def run(edges: DataFrame, damping: Double = 0.85, eps: Double = 1e-6,
          maxIter: Int = 100): DataFrame = {
    // loop-state frames re-read every iteration: row-format checkpoints at
    // a size-derived partition count (see IterUtil) instead of 128-pinned
    // columnar persists
    // ONE evaluation of the caller's edge plan: links and vertices both
    // derive from this checkpoint (the old shape read the upstream plan
    // four times: twice for the degree join, twice for the vertex union)
    val sel = edges.select("src", "dst").localCheckpoint(true)
    val links = IterUtil.pin(sel
      .join(sel.groupBy("src").agg(count(lit(1)).as("out_deg")), "src"))
    val vertices = IterUtil.pin(sel
      .select(explode_outer(array(col("src"), col("dst"))).as("vertex"))
      .distinct())

    var ranks = vertices.withColumn("rank", lit(1.0 - damping)).localCheckpoint(true)
    var iter = 0
    var delta = Double.MaxValue
    while (delta > eps && iter < maxIter) {
      val contribs = links
        .join(ranks.withColumnRenamed("rank", "prev"), links("src") === col("vertex"))
        .groupBy(col("dst").as("vertex"))
        .agg(sum(col("prev") / col("out_deg")).as("c"))
      // fold the convergence check into the rank-update job: carry prev in
      // the same frame; the checkpoint is LAZY (plan truncated now, RDD
      // cached when first computed), so the delta agg below is the ONE job
      // per iteration — it materializes the checkpoint and reads the delta
      // in the same pass
      val next = ranks.withColumnRenamed("rank", "prev")
        .join(contribs, Seq("vertex"), "left_outer")
        .select(col("vertex"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"),
          col("prev"))
        .localCheckpoint(false)
      delta = next.agg(coalesce(sum(abs(col("rank") - col("prev"))), lit(0.0)))
        .head().getDouble(0)
      ranks = next.select("vertex", "rank")
      iter += 1
    }
    ranks.select("vertex", "rank")
  }

  /** Fixed-iteration variant (deterministic, no convergence action) — used
    * by the driver-checked oracle queries where DuckDB runs the identical
    * unrolled recurrence.
    */
  def runFixed(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    // ONE evaluation of the caller's edge plan: links and vertices both
    // derive from this checkpoint (the old shape read the upstream plan
    // four times: twice for the degree join, twice for the vertex union)
    val sel = edges.select("src", "dst").localCheckpoint(true)
    val links = IterUtil.pin(sel
      .join(sel.groupBy("src").agg(count(lit(1)).as("out_deg")), "src"))
    val vertices = IterUtil.pin(sel
      .select(explode_outer(array(col("src"), col("dst"))).as("vertex"))
      .distinct())
    // every per-round checkpoint is LAZY: each round's plan is truncated to
    // a LogicalRDD immediately, but nothing executes until the single count
    // below — the whole fixed loop runs as ONE multi-stage job (each round's
    // RDD is cached as it is first computed), not `iters` driver round-trips
    var ranks = vertices.withColumn("rank", lit(1.0 - damping)).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contribs = links
        .join(ranks, links("src") === ranks("vertex"))
        .groupBy(col("dst").as("vertex"))
        .agg(sum(col("rank") / col("out_deg")).as("c"))
      ranks = vertices.join(contribs, Seq("vertex"), "left_outer")
        .select(col("vertex"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint(false)
    }
    ranks.count() // materialize the chain BEFORE dropping the link cache
    ranks
  }

  /** Edge-weighted PageRank, fixed iterations: contributions distribute
    * proportionally to edge weight,
    *   PR(v) = (1 - d) + d * Σ_{(u,v,w)} PR(u) · w / wsum(u),
    * the confidence-weighted centrality for a FUSED KG (compose with
    * [[graft.graph.Fusion.tripleFusion]]'s noisy-or confidences so
    * well-attested facts carry more rank mass than single-source ones).
    * Non-positive weights are excluded (they would invert or zero the
    * distribution). With integer multiplicities as weights this is
    * EXACTLY [[runFixed]] on the expanded multigraph — the cross-check
    * GraphAlgoSpec pins. Same plan shape: one contribs shuffle per
    * iteration against the cached weighted link table.
    */
  def runWeightedFixed(edges: DataFrame, wCol: String, iters: Int,
                       damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col(wCol).cast("double").as("w"))
      .where(col("w") > 0)
      .localCheckpoint(true) // one upstream pass
    val links = IterUtil.pin(
      e.join(e.groupBy("src").agg(sum("w").as("wsum")), "src"))
    val vertices = IterUtil.pin(e
      .select(explode_outer(array(col("src"), col("dst"))).as("vertex"))
      .distinct())
    // lazy per-round checkpoints + one materializing count: see runFixed
    var ranks = vertices.withColumn("rank", lit(1.0 - damping)).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contribs = links
        .join(ranks, links("src") === ranks("vertex"))
        .groupBy(col("dst").as("vertex"))
        .agg(sum(col("rank") * col("w") / col("wsum")).as("c"))
      ranks = vertices.join(contribs, Seq("vertex"), "left_outer")
        .select(col("vertex"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint(false)
    }
    ranks.count() // materialize the chain BEFORE dropping the link cache
    ranks
  }

  /** Personalized PageRank, fixed iterations: the teleport mass lands only
    * on `seeds` (uniformly), so ranks measure importance RELATIVE to the
    * seed set — the standard seeded-entity relevance kernel for KG
    * construction (rank neighborhoods of known-good entities). Same
    * unnormalized convention as [[runFixed]]:
    *   PPR(v) = (1 - d) * p(v) + d * Σ_{(u,v)} PPR(u) / outdeg(u),
    * p(v) = 1/|seeds| on seeds, 0 elsewhere.
    *
    * Plan shape matches [[runFixed]] — one contribs shuffle per iteration
    * against the cached link table, lineage truncated per round; the base
    * vector is a column expression, never a driver-side map.
    */
  def runPersonalizedFixed(edges: DataFrame, seeds: Seq[String], iters: Int,
                           damping: Double = 0.85): DataFrame = {
    require(seeds.nonEmpty, "seeds must be non-empty")
    // ONE evaluation of the caller's edge plan: links and vertices both
    // derive from this checkpoint (the old shape read the upstream plan
    // four times: twice for the degree join, twice for the vertex union)
    val sel = edges.select("src", "dst").localCheckpoint(true)
    val links = IterUtil.pin(sel
      .join(sel.groupBy("src").agg(count(lit(1)).as("out_deg")), "src"))
    val vertices = IterUtil.pin(sel
      .select(explode_outer(array(col("src"), col("dst"))).as("vertex"))
      .distinct())
    val base = when(col("vertex").isInCollection(seeds),
      lit((1.0 - damping) / seeds.size)).otherwise(lit(0.0))
    // lazy per-round checkpoints + one materializing count: see runFixed
    var ranks = vertices.select(col("vertex"), base.as("rank")).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contribs = links
        .join(ranks, links("src") === ranks("vertex"))
        .groupBy(col("dst").as("vertex"))
        .agg(sum(col("rank") / col("out_deg")).as("c"))
      ranks = vertices.join(contribs, Seq("vertex"), "left_outer")
        .select(col("vertex"),
          (base + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        .localCheckpoint(false)
    }
    ranks.count() // materialize the chain BEFORE dropping the caches
    ranks
  }

  /** (max_pagerank, max_pagerank_vertex) — argmax, ties resolved like lodcc's
    * `>=` scan (`centrality.py:88-98`: later vertex wins) pinned here as
    * greatest vertex id among ties.
    */
  def maxRank(ranks: DataFrame): DataFrame =
    ranks.agg(
      max(col("rank")).as("max_pagerank"),
      max_by(col("vertex"), struct(col("rank"), col("vertex"))).as("max_pagerank_vertex"))

  /** Rank-value distribution table — the Spark analog of lodcc's pagerank
    * plot (`centrality.py:57-79` buckets the rank vector for the plot file).
    * Values are rounded to `precision` decimals first so the bucketing is
    * deterministic and engine-portable; output is (rank, cnt), at most
    * |distinct rounded ranks| rows after one distributed groupBy.
    */
  def distribution(ranks: DataFrame, precision: Int = 6): DataFrame =
    ranks.groupBy(round(col("rank"), precision).as("rank"))
      .agg(count(lit(1)).as("cnt"))
}
