package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triple reconciliation across extractors/sources, and schema induction —
  * the "fuse then summarize" tail of KG construction (engine additions on
  * the transcripts->graph path; lodcc assumes a single already-merged
  * edge list).
  */
object Fusion {

  /** Fuse duplicate (src, label, dst) assertions from multiple sources into
    * one row per triple with provenance counts and a noisy-or confidence:
    * independent sources each asserting with reliability w combine to
    * 1 - prod(1 - w_i), folded as exp(sum(ln(1 - w))) so the product is a
    * single map-side-combinable aggregate (no per-group array collection —
    * a triple asserted by millions of rows still aggregates in O(1) state).
    *
    * One shuffle, keyed on the triple itself; parallel assertions of one
    * triple are exactly the duplicates being merged, so the key cardinality
    * is the output size and hot keys collapse INTO the combine.
    *
    * The noisy-or contract wants w in (0, 1); out-of-range weights are
    * CLAMPED IN-PLAN to [0, 1-1e-12] before the log (ln(1-w) of w >= 1 is
    * null and sum() would silently drop the assertion): w >= 1 therefore
    * forces confidence ~1 (a certain source decides the triple), w <= 0
    * contributes nothing (ln(1) = 0) but still counts in n_assertions.
    */
  def tripleFusion(triples: DataFrame, srcCol: String, wCol: String): DataFrame = {
    val w = least(greatest(col(wCol), lit(0.0)), lit(1.0 - 1e-12))
    triples.groupBy("src", "label", "dst").agg(
      count_distinct(col(srcCol)).as("n_sources"),
      count(lit(1)).as("n_assertions"),
      (lit(1.0) - exp(sum(log(lit(1.0) - w)))).as("confidence"))
  }

  /** Schema induction over a typed edge list: one row per
    * (class(src), label, class(dst)) with the assertion count and the
    * distinct instance-pair count — the class-level summary an ontology
    * view of the KG needs. `classOf` maps a vertex id column to its class
    * (e.g. an rdf:type lookup or a deterministic id rule).
    *
    * Distinct-pair counting runs as a two-level aggregation (exact
    * distinct on the grouped key, partial-combined), never a
    * collect_set; class-space output is tiny by construction. The pair
    * key is the (src, dst) column PAIR itself — a delimiter-concatenated
    * string key would collide for ids containing the delimiter.
    */
  def schemaStats(edges: DataFrame, classOf: Column => Column): DataFrame =
    edges.select(
        classOf(col("src")).as("src_class"), col("label"),
        classOf(col("dst")).as("dst_class"),
        col("src"), col("dst"))
      .groupBy("src_class", "label", "dst_class").agg(
        count(lit(1)).as("n_assertions"),
        count_distinct(col("src"), col("dst")).as("n_distinct_pairs"))

  /** Per-vertex degree evolution between two snapshots of the graph (the
    * KG-maintenance diff after an incremental build): a full-outer
    * equi-join of the two degree aggregates, so vertices that appear or
    * disappear carry an explicit 0 on the missing side. Both inputs
    * aggregate with map-side combine before the single join; nothing is
    * proportional to edge count after the two degree shuffles.
    */
  def degreeDelta(before: DataFrame, after: DataFrame): DataFrame = {
    def deg(e: DataFrame) = e
      .select(explode(array(col("src"), col("dst"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("d"))
    deg(before).select(col("vertex"), col("d").as("deg_before"))
      .join(deg(after).select(col("vertex"), col("d").as("deg_after")),
        Seq("vertex"), "full_outer")
      .select(col("vertex"),
        coalesce(col("deg_before"), lit(0L)).as("deg_before"),
        coalesce(col("deg_after"), lit(0L)).as("deg_after"))
      .withColumn("delta", col("deg_after") - col("deg_before"))
  }

  /** Distinct-edge churn between two snapshots: edges added, removed, and
    * carried over — three anti/semi equi-joins on the (src, label, dst)
    * key, returned as one summary row.
    */
  def edgeChurn(before: DataFrame, after: DataFrame): DataFrame = {
    val key = Seq("src", "label", "dst")
    val b = before.select("src", "label", "dst").distinct()
    val a = after.select("src", "label", "dst").distinct()
    val added = a.join(b, key, "left_anti").agg(count(lit(1)).as("n_added"))
    val removed = b.join(a, key, "left_anti").agg(count(lit(1)).as("n_removed"))
    b.agg(count(lit(1)).as("n_edges_before"))
      .crossJoin(a.agg(count(lit(1)).as("n_edges_after")))
      .crossJoin(added).crossJoin(removed)
  }
}
