package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphTables

/** Triangle counting + clustering coefficients (lodcc `clustering.py:8-26`,
  * graph-tool `global_clustering` / `local_clustering` on the undirected
  * view, `core_measures.py:74-76`).
  *
  * Convention (documented; pinned by fixture goldens): the graph is first
  * reduced to its *simple undirected* form (parallel edges + self loops
  * dropped). Triangles are counted with the degree-ordered "compact forward"
  * scheme: orient each edge from the lower-(degree, id) endpoint to the
  * higher one, join wedges at the low vertex, probe the oriented edge set —
  * every triangle is found exactly once and the wedge join is bounded by
  * sum(d_oriented^2) = O(m^1.5), the standard scalable plan.
  */
object Triangles {

  /** (a, b, c) triangle triples over the simple undirected graph. */
  def triangles(edges: DataFrame): DataFrame = {
    val simple = GraphTables.simpleUndirected(edges) // (a < b)
    val deg = simple.select(col("a").as("v")).union(simple.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient by (degree, vertex): lo -> hi
    val oriented = simple
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a")).otherwise(col("b")).as("lo"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b")).otherwise(col("a")).as("hi"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("da")).otherwise(col("db")).as("dlo"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db")).otherwise(col("da")).as("dhi"))
    val e1 = oriented.select(col("lo").as("u"), col("hi").as("v"), col("dhi").as("dv"))
    val e2 = oriented.select(col("lo").as("u"), col("hi").as("w"), col("dhi").as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .where(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val probe = oriented.select(col("lo").as("v"), col("hi").as("w"))
    wedges.join(probe, Seq("v", "w"), "left_semi").select(col("u"), col("v"), col("w"))
  }

  /** single row: (triangle_count, global_clustering, local_clustering).
    * global = 3T / sum(k(k-1)/2); local mean = avg over ALL vertices of
    * 2*T_v / (k_v (k_v - 1)) with 0 when k_v < 2 (vertex_average semantics).
    */
  def clustering(edges: DataFrame): DataFrame = {
    val simple = GraphTables.simpleUndirected(edges)
    val deg = simple.select(col("a").as("v")).union(simple.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val tri = triangles(edges).persist()
    val perVertex = tri.select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("t"))
    val localStats = deg.join(perVertex, Seq("v"), "left_outer")
      .select(col("d"), coalesce(col("t"), lit(0L)).as("t"))
      .agg(
        sum(col("d") * (col("d") - 1) / 2).as("triplets"),
        avg(when(col("d") >= 2, lit(2.0) * col("t") / (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0))).as("local_clustering"))
    val tcount = tri.agg(count(lit(1)).as("triangle_count"))
    tcount.crossJoin(localStats).select(
      col("triangle_count"),
      (lit(3.0) * col("triangle_count") / col("triplets")).as("global_clustering"),
      col("local_clustering"))
  }

  /** Per-vertex triangle table: (vertex, degree, triangles,
    * local_clustering) over the simple undirected graph — the full local
    * coefficient vector behind [[clustering]]'s vertex_average (lodcc
    * reports the mean; this exposes the distribution the plots bucket).
    * Same compact-forward core, one extra explode + groupBy on the
    * triangle list.
    */
  def perVertex(edges: DataFrame): DataFrame = {
    val simple = GraphTables.simpleUndirected(edges)
    val deg = simple.select(col("a").as("v")).union(simple.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val pv = triangles(edges)
      .select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("t"))
    deg.join(pv, Seq("v"), "left_outer")
      .select(col("v").as("vertex"),
        col("d").cast("bigint").as("degree"),
        coalesce(col("t"), lit(0L)).cast("bigint").as("triangles"),
        when(col("d") >= 2,
          lit(2.0) * coalesce(col("t"), lit(0L)) / (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0)).as("local_clustering"))
  }
}
