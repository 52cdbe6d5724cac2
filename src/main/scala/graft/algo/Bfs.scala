package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier-join BFS and the pseudo-diameter double sweep
  * (lodcc `edge_based.py:15-32` via graph-tool `pseudo_diameter`).
  *
  * Each BFS level is one hash join frontier-vs-edges plus an anti-join
  * against the visited set; lineage truncated per level. Directed traversal
  * (graph-tool respects edge direction on directed graphs).
  *
  * The adjacency prep (dedup + eager localCheckpoint) is hoisted into
  * [[prepareAdj]] so that (a) callers whose edge set is ALREADY distinct
  * pass `assumeDistinct = true` and skip a full re-dedup exchange of the
  * edge table, and (b) [[pseudoDiameter]] pays the prep once for all its
  * sweeps instead of once per sweep. The checkpoint is a row-format cache
  * at the AQE-coalesced partitioning — every level re-reads it, and the
  * old columnar `persist` paid a decode per level at the static shuffle
  * partition count.
  */
object Bfs {

  /** Deduped, eagerly checkpointed (src, dst) adjacency for the level
    * loops. `assumeDistinct` skips the dedup exchange when the caller's
    * edge set is distinct already (BFS distances are identical on the
    * multigraph and its simple projection — dedup is purely a
    * don't-join-duplicates optimization, so trusting the caller is safe
    * for correctness even if mis-declared).
    */
  def prepareAdj(edges: DataFrame, assumeDistinct: Boolean = false): DataFrame = {
    val sel = edges.select("src", "dst")
    (if (assumeDistinct) sel else sel.distinct()).localCheckpoint(true)
  }

  /** distances (vertex, dist) from `source` following src->dst edges. */
  def distances(edges: DataFrame, source: String,
                assumeDistinct: Boolean = false): DataFrame =
    distancesOnAdj(prepareAdj(edges, assumeDistinct), source)

  /** [[distances]] over an adjacency already prepared by [[prepareAdj]]. */
  def distancesOnAdj(adj: DataFrame, source: String): DataFrame = {
    val spark = adj.sparkSession
    import spark.implicits._
    var visited = Seq((source, 0L)).toDF("vertex", "dist").localCheckpoint(true)
    var frontier = visited.select("vertex")
    var level = 0L
    var frontierCount = 1L
    while (frontierCount > 0) {
      level += 1
      val next = adj.join(frontier, adj("src") === frontier("vertex"))
        .select(col("dst").as("vertex")).distinct()
        .join(visited, Seq("vertex"), "left_anti")
        .localCheckpoint(false) // lazy: the count below materializes it
      frontierCount = next.count()
      if (frontierCount > 0) {
        // lazy too: a pure union of already-materialized frames, computed
        // inside whichever job consumes it next (the following level's
        // anti-join count, or the caller's action) — one job per level
        visited = visited.union(next.withColumn("dist", lit(level))).localCheckpoint(false)
        frontier = next
      }
    }
    visited
  }

  /** Directed BFS distances from a SET of sources in ONE fixpoint: the
    * frontier is keyed (seed, vertex), so k seeds cost max-eccentricity
    * rounds total instead of k independent BFS loops — the scale shape for
    * sampled centralities (harmonic/closeness), where k is a constant and
    * the per-round join fans each frontier row by its out-degree. Same
    * lazy-checkpoint/one-job-per-level discipline as [[distances]].
    * Returns (seed, vertex, dist) with dist = min #hops seed -> vertex.
    */
  def multiSourceDistances(edges: DataFrame, seeds: Seq[String],
                           assumeDistinct: Boolean = false): DataFrame = {
    val adj = prepareAdj(edges, assumeDistinct)
    val spark = adj.sparkSession
    import spark.implicits._
    var visited = seeds.map(s => (s, s, 0L)).toDF("seed", "vertex", "dist")
      .localCheckpoint(true)
    var frontier = visited.select("seed", "vertex")
    var level = 0L
    var frontierCount = seeds.size.toLong
    while (frontierCount > 0) {
      level += 1
      val next = adj.join(frontier, adj("src") === frontier("vertex"))
        .select(col("seed"), col("dst").as("vertex")).distinct()
        .join(visited, Seq("seed", "vertex"), "left_anti")
        .localCheckpoint(false) // lazy: the count below materializes it
      frontierCount = next.count()
      if (frontierCount > 0) {
        visited = visited.union(next.withColumn("dist", lit(level))).localCheckpoint(false)
        frontier = next
      }
    }
    visited
  }

  /** Farthest vertex from source: (vertex, dist); ties -> greatest vertex. */
  def farthest(dists: DataFrame): (String, Long) = {
    val r = dists.agg(
      max_by(struct(col("vertex"), col("dist")), struct(col("dist"), col("vertex"))).as("m"))
      .select(col("m.vertex"), col("m.dist")).head()
    (r.getString(0), r.getLong(1))
  }

  /** Pseudo-diameter: alternating directed BFS sweeps from `source0` until
    * the eccentricity estimate stops improving (graph-tool's algorithm).
    * Returns (dist, srcVertex, trgVertex). The adjacency is prepared ONCE
    * for every sweep.
    */
  def pseudoDiameter(edges: DataFrame, source0: String, maxSweeps: Int = 10,
                     assumeDistinct: Boolean = false): (Long, String, String) = {
    val adj = prepareAdj(edges, assumeDistinct)
    var cur = source0
    var best = -1L
    var bestSrc = source0
    var bestTrg = source0
    var improved = true
    var sweeps = 0
    while (improved && sweeps < maxSweeps) {
      val (far, d) = farthest(distancesOnAdj(adj, cur))
      if (d > best) { best = d; bestSrc = cur; bestTrg = far; cur = far }
      else improved = false
      sweeps += 1
    }
    (best, bestSrc, bestTrg)
  }
}
