package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphTables

/** k-truss decomposition (Cohen, "Trusses: cohesive subgraphs for social
  * network analysis", 2008 — public algorithm, original implementation):
  * the maximal subgraph in which every edge is supported by >= k-2
  * triangles WITHIN the subgraph — the edge-cohesion companion to the
  * vertex-peeling [[KCore]]. Computed by iterative support peeling:
  * per round, enumerate triangles of the surviving edge set with the
  * degree-ordered compact-forward scheme ([[Triangles.triangles]], wedge
  * volume O(m^1.5) regardless of hub skew), count per-edge support, drop
  * edges below k-2, repeat to fixpoint. Removal-only peeling makes the
  * edge COUNT a faithful convergence signature (equal count ⇔ equal set).
  *
  * Same loop discipline as the other fixpoints: localCheckpoint per round
  * truncates lineage; per-round cost is one triangle enumeration + one
  * (a, b)-keyed aggregation + one equi-join.
  */
object KTruss {

  /** (a, b, support) over the k-truss of the simple undirected graph;
    * `support` is the edge's within-truss triangle count.
    */
  def run(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 3, "k must be >= 3 (the 2-truss is the whole simple graph)")
    // Orient by (degree, id) and carry the oriented endpoints through the
    // peel: any FIXED total vertex order finds each triangle of the
    // surviving subgraph exactly once, so rounds can reuse an earlier
    // orientation — the per-round re-simplification, degree aggregation
    // and two orientation joins the generic [[Triangles.triangles]] entry
    // pays are hoisted out of the loop. The orientation is REFRESHED from
    // the CURRENT degrees whenever the edge set has at least halved since
    // it was last computed: correctness never needs the refresh (the
    // triangle set is orientation-invariant), but the wedge-volume bound
    // Σ d_lo(oriented)² = O(m^1.5) only holds for the degrees of the graph
    // being joined — a heavy peel leaves round-0 hubs mis-oriented and the
    // sf1 probe measured the wedge join 3-4x over budget on the stale
    // order. The halving rule is deterministic (a pure function of the
    // materialized counts) and amortizes the re-orientation joins to
    // O(log m) total.
    def orient(simple: DataFrame): DataFrame = {
      val deg = simple.select(col("a").as("v"))
        .union(simple.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val loFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
      simple
        .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
        .select(col("a"), col("b"),
          when(loFirst, col("a")).otherwise(col("b")).as("lo"),
          when(loFirst, col("b")).otherwise(col("a")).as("hi"),
          when(loFirst, col("db")).otherwise(col("da")).as("dhi"))
    }
    var cur = orient(GraphTables.simpleUndirected(edges)).localCheckpoint(false)
    var lastSup: DataFrame = null
    var prev = -1L
    var cnt = cur.count()
    var orientCnt = cnt
    var round = 0
    while (cnt != prev && round < maxRounds) {
      prev = cnt
      if (cnt * 2 <= orientCnt) {
        cur = orient(cur.select("a", "b")).localCheckpoint(true)
        orientCnt = cnt
      }
      val e1 = cur.select(col("lo").as("u"), col("hi").as("v"), col("dhi").as("dv"))
      val e2 = cur.select(col("lo").as("u"), col("hi").as("w"), col("dhi").as("dw"))
      val wedges = e1.join(e2, Seq("u"))
        .where(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      val probe = cur.select(col("lo").as("v"), col("hi").as("w"))
      val tri = wedges.join(probe, Seq("v", "w"), "left_semi")
        .select(col("u"), col("v"), col("w"))
      // triangle members are (deg, id)-oriented — normalize each of the 3
      // edges back to the id-ordered (a, b) key of the edge set
      val sup = tri.select(explode(array(
          struct(col("u").as("x"), col("v").as("y")),
          struct(col("u").as("x"), col("w").as("y")),
          struct(col("v").as("x"), col("w").as("y")))).as("e"))
        .select(least(col("e.x"), col("e.y")).as("a"),
          greatest(col("e.x"), col("e.y")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
      val next = cur.join(sup, Seq("a", "b"))
        .where(col("support") >= k - 2)
        .localCheckpoint(false) // lazy: the count below materializes it —
                                // one job per round, lineage still truncated
      // when the set stops changing, these supports were computed over
      // exactly the final set — no extra pass needed
      lastSup = next
      cur = next.drop("support")
      cnt = cur.count()
      round += 1
    }
    // an unconverged exit would silently return a non-truss whose supports
    // were computed over the PREVIOUS round's edge set — fail loudly instead
    // (mirrors how the bench docs treat unconverged fixpoints)
    if (cnt != prev)
      throw new IllegalStateException(
        s"k-truss peel did not converge in $maxRounds rounds " +
          s"(edge count still moving: $prev -> $cnt); raise maxRounds")
    if (lastSup == null)
      cur.select("a", "b").withColumn("support", lit(0L)).where(lit(false))
    else lastSup.select(col("a"), col("b"), col("support"))
  }

  /** One-row truss summary, [[KCore.summary]]-shaped. */
  def summary(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    val t = run(edges, k, maxRounds) // already checkpointed by the loop
    val es = t.agg(
      count(lit(1)).cast("bigint").as("truss_edges"),
      coalesce(min("support").cast("bigint"), lit(0L)).as("min_support"),
      coalesce(max("support").cast("bigint"), lit(0L)).as("max_support"),
      coalesce(sum("support").cast("bigint"), lit(0L)).as("support_checksum"))
    val vs = t.select(explode(array(col("a"), col("b"))).as("v"))
      .agg(count_distinct(col("v")).cast("bigint").as("truss_vertices"))
    es.crossJoin(vs)
  }
}
