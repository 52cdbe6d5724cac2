package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Frontier-join BFS and the pseudo-diameter double sweep
  * (lodcc `edge_based.py:15-32` via graph-tool `pseudo_diameter`).
  *
  * Each BFS level is one hash join frontier-vs-edges plus an anti-join
  * against the visited set; lineage truncated per level. Directed traversal
  * (graph-tool respects edge direction on directed graphs).
  */
object Bfs {

  /** distances (vertex, dist) from `source` following src->dst edges. */
  def distances(edges: DataFrame, source: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select("src", "dst").distinct().persist(StorageLevel.MEMORY_AND_DISK)
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
    adj.unpersist(false)
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
  def multiSourceDistances(edges: DataFrame, seeds: Seq[String]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select("src", "dst").distinct().persist(StorageLevel.MEMORY_AND_DISK)
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
    adj.unpersist(false)
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
    * Returns (dist, srcVertex, trgVertex).
    */
  def pseudoDiameter(edges: DataFrame, source0: String, maxSweeps: Int = 10): (Long, String, String) = {
    var cur = source0
    var best = -1L
    var bestSrc = source0
    var bestTrg = source0
    var improved = true
    var sweeps = 0
    while (improved && sweeps < maxSweeps) {
      val (far, d) = farthest(distances(edges, cur))
      if (d > best) { best = d; bestSrc = cur; bestTrg = far; cur = far }
      else improved = false
      sweeps += 1
    }
    (best, bestSrc, bestTrg)
  }
}
