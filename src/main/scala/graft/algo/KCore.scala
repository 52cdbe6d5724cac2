package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.GraphTables

/** k-core decomposition by distributed iterative peeling — an engine
  * addition beyond lodcc's measure set (the natural next step after its
  * degree/h-index family: the k-core is the maximal subgraph where every
  * vertex keeps degree >= k, the standard "dense backbone" extract).
  *
  * Same loop discipline as [[ConnectedComponents]]: per round one degree
  * aggregation + two left-semi joins (all equi-keyed on the vertex — the
  * peel never shuffles anything wider than the surviving edge list),
  * `localCheckpoint` lineage truncation, and a convergence test that
  * needs only the edge COUNT: peeling strictly removes edges, so an
  * unchanged count is exactly the fixpoint.
  */
object KCore {

  /** Vertices of the k-core of the simple undirected view of `edges`
    * (parallel edges + self loops dropped), as (vertex, core_deg) with
    * core_deg = degree inside the converged core (>= k by construction).
    * Empty when the graph has no k-core.
    *
    * `maxIter` bounds the peel rounds. Rounds beyond convergence are
    * no-ops, so a replayed fixed-round oracle matches whenever its round
    * count >= the actual convergence round (the peel count is small for
    * dense graphs; pathological chain graphs can need O(n) rounds — at
    * that point raise maxIter or accept the partially-peeled superset,
    * which the early-exit makes explicit in the logs).
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val log = org.slf4j.LoggerFactory.getLogger("graft.algo.KCore")
    var cur = GraphTables.simpleUndirected(edges)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var m = cur.count()
    var iter = 0
    var converged = m == 0L
    while (!converged && iter < maxIter) {
      val deg = cur.select(col("a").as("v")).union(cur.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val keep = deg.where(col("d") >= k).select("v")
      val next = cur
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(false) // lazy: the count below materializes it —
                                // one job per round, lineage still truncated
      val m2 = next.count()
      cur.unpersist(false)
      cur = next
      converged = m2 == m // monotone peel: equal edge count == fixpoint
      m = m2
      iter += 1
    }
    if (!converged) log.warn(s"kCore(k=$k): not converged after $maxIter rounds")
    cur.select(col("a").as("v")).union(cur.select(col("b").as("v")))
      .groupBy(col("v").as("vertex")).agg(count(lit(1)).as("core_deg"))
  }

  /** One-row summary of [[kCore]] (vertex/edge counts + degree stats) —
    * the driver-checked shape.
    */
  def summary(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame =
    kCore(edges, k, maxIter).agg(
      count(lit(1)).cast("bigint").as("core_vertices"),
      coalesce((sum("core_deg") / 2).cast("bigint"), lit(0L)).as("core_edges"),
      coalesce(min("core_deg").cast("bigint"), lit(0L)).as("min_core_deg"),
      coalesce(max("core_deg").cast("bigint"), lit(0L)).as("max_core_deg"),
      coalesce(sum("core_deg").cast("bigint"), lit(0L)).as("deg_checksum"))
}
