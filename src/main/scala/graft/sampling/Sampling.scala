package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators (SURVEY.md §2.8).
  *
  * SA1 edge sampling: lodcc samples n*k edges uniformly without replacement,
  * k in linspace(0.05, 0.5, 10) (`sample_edgelist_weighted.py:9-79`) —
  * `edges.sample(fraction, seed)` is the distributed equivalent. A
  * deterministic hash-mod variant is provided for cross-engine reproducible
  * tests (seeded RNG streams differ between engines).
  *
  * SA2 vertex sampling: uniform vertex subset -> induced subgraph via two
  * semi-joins (`sample_vertices_data.graph.gt.gz.py:9-36`).
  */
object Sampling {

  /** SA1: uniform edge sample without replacement. */
  def edgeSample(edges: DataFrame, fraction: Double, seed: Long): DataFrame =
    edges.sample(withReplacement = false, fraction, seed)

  /** Deterministic hash-mod edge sample: keeps rows where
    * xxhash64(cols) mod 100 < percent. Engine-portable and stable.
    */
  def edgeSampleDeterministic(edges: DataFrame, percent: Int, cols: Column*): DataFrame =
    edges.where(pmod(xxhash64(cols: _*), lit(100)) < percent)

  /** SA2: sample vertices at `fraction`, return the induced subgraph
    * (both endpoints sampled) via two left-semi joins.
    */
  def vertexInducedSample(edges: DataFrame, fraction: Double, seed: Long): DataFrame = {
    val vs = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .distinct()
      .sample(withReplacement = false, fraction, seed)
    edges
      .join(vs.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
      .join(vs.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst", "label")
  }

  /** Deterministic induced subgraph: vertex kept iff xxhash64(v) mod 100 <
    * percent — reproducible across engines for the oracle twin.
    */
  def vertexInducedDeterministic(edges: DataFrame, percent: Int): DataFrame = {
    val keep = (c: Column) => pmod(xxhash64(c), lit(100)) < percent
    edges.where(keep(col("src")) && keep(col("dst")))
  }
}
