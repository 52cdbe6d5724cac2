package graft.measures

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** lodcc core topology measures (SURVEY.md §2.4 A1-A14) as lazy single-row
  * DataFrames over the hashed edge table (src, dst, label). Heavy inputs
  * (the degrees DF) are computed once and passed in, mirroring lodcc's
  * "compute once" degree vector (`degree_based.py:26`).
  */
object CoreMeasures {

  /** A1-A5: n, m, mean_degree, fill_overall, parallel_edges, m_unique, fill
    * (`core/basic_measures.py:8-51`). One pass over edges + one over the
    * distinct vertex set.
    */
  def basic(edges: DataFrame): DataFrame = {
    val nDF = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .agg(count_distinct(col("v")).as("n"))
    val mDF = edges.agg(
      count(lit(1)).as("m"),
      count_distinct(col("src"), col("dst")).as("m_unique"))
    nDF.crossJoin(mDF).select(
      col("n"), col("m"),
      try_divide(lit(2.0) * col("m"), col("n")).as("mean_degree"),
      try_divide(col("m").cast("double"), col("n") * col("n")).as("fill_overall"),
      (col("m") - col("m_unique")).as("parallel_edges"),
      col("m_unique"),
      try_divide(col("m_unique").cast("double"), col("n") * col("n")).as("fill"))
  }

  /** A6-A8: max degrees + degree centralities + stddev/var/CV
    * (`degree_based.py:30-88`). NumPy `.std()`/`.var()` are population
    * variants -> stddev_pop / var_pop. Centrality scale s = 1/(n-1).
    */
  def degreeStats(degrees: DataFrame): DataFrame =
    degrees.agg(
      count(lit(1)).as("n"),
      max("deg").as("max_degree"),
      max("in_deg").as("max_in_degree"),
      max("out_deg").as("max_out_degree"),
      sum("deg").as("sum_degrees"),
      sum("in_deg").as("sum_in_degrees"),
      sum("out_deg").as("sum_out_degrees"),
      stddev_pop(col("in_deg")).as("stddev_in_degree"),
      stddev_pop(col("out_deg")).as("stddev_out_degree"),
      var_pop(col("in_deg")).as("var_in_degree"),
      var_pop(col("out_deg")).as("var_out_degree"))
      .select(
        col("max_degree"), col("max_in_degree"), col("max_out_degree"),
        try_divide(try_divide(col("sum_degrees"), col("n") - 1), col("n")).as("mean_degree_centrality"),
        try_divide(try_divide(col("sum_in_degrees"), col("n") - 1), col("n")).as("mean_in_degree_centrality"),
        try_divide(try_divide(col("sum_out_degrees"), col("n") - 1), col("n")).as("mean_out_degree_centrality"),
        try_divide(col("max_degree"), col("n") - lit(1.0)).as("max_degree_centrality"),
        try_divide(col("max_in_degree"), col("n") - lit(1.0)).as("max_in_degree_centrality"),
        try_divide(col("max_out_degree"), col("n") - lit(1.0)).as("max_out_degree_centrality"),
        col("stddev_in_degree"),
        (try_divide(col("stddev_in_degree"), try_divide(col("sum_in_degrees"), col("n"))) * 100).as("coefficient_variation_in_degree"),
        col("stddev_out_degree"),
        (try_divide(col("stddev_out_degree"), try_divide(col("sum_out_degrees"), col("n"))) * 100).as("coefficient_variation_out_degree"),
        col("var_in_degree"), col("var_out_degree"))

  /** A6 argmax vertices. lodcc's tie-break is ">= in vertex-index order ->
    * last inserted vertex wins" (`degree_based.py:41-59`); vertex index order
    * is a property of graph-tool's load order, so we pin a deterministic
    * equivalent: among tied degrees the lexicographically greatest vertex
    * wins when `orderCol` is None, else the greatest `orderCol` value wins.
    */
  def maxDegreeVertices(degrees: DataFrame, orderCol: Option[String] = None): DataFrame = {
    val ord = orderCol.map(col).getOrElse(col("vertex"))
    degrees.agg(
      max_by(col("vertex"), struct(col("deg"), ord)).as("max_degree_vertex"),
      max_by(col("vertex"), struct(col("in_deg"), ord)).as("max_in_degree_vertex"),
      max_by(col("vertex"), struct(col("out_deg"), ord)).as("max_out_degree_vertex"))
  }

  /** Degree assortativity: Pearson correlation between the TOTAL degrees
    * of edge endpoints, every directed edge one sample (parallel edges
    * each count) — the graph-tool `scalar_assortativity` analog for the
    * degree vector; r > 0 means hubs link to hubs. Two broadcast-friendly
    * joins of the degree vector onto the edge list plus one corr()
    * aggregation — no shuffle wider than the edge list. NaN (degenerate
    * variance: all endpoint degrees equal) is surfaced as null.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val deg = Degrees.degrees(edges).select(col("vertex"), col("deg"))
    val samples = edges.select("src", "dst")
      .join(deg.select(col("vertex").as("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("vertex").as("dst"), col("deg").as("dy")), "dst")
      .select(col("dx").cast("double").as("x"), col("dy").cast("double").as("y"))
    // centered two-pass Pearson: the naive n*Σxy − ΣxΣy sums blow past
    // 2^53 on web-scale edge counts; centered products stay ~n·var. ANSI
    // mode: try_divide, not corr() — corr THROWS on zero variance, this
    // returns the null the caller expects for a degree-regular graph
    val m = samples.agg(avg("x").as("mx"), avg("y").as("my"))
    samples.crossJoin(broadcast(m))
      .agg(
        sum((col("x") - col("mx")) * (col("y") - col("my"))).as("sxy"),
        sum((col("x") - col("mx")) * (col("x") - col("mx"))).as("sxx"),
        sum((col("y") - col("my")) * (col("y") - col("my"))).as("syy"))
      .select(try_divide(col("sxy"), sqrt(col("sxx") * col("syy")))
        .as("assortativity"))
  }

  /** A14 reciprocity (`edge_based.py:8-13`): fraction of edges (s,t) such
    * that at least one edge (t,s) exists. Semi-join against the distinct
    * reversed pair set; parallel edges each count.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val rev = edges.select(col("dst").as("src"), col("src").as("dst")).distinct()
    val recip = edges.join(rev, Seq("src", "dst"), "left_semi").agg(count(lit(1)).as("r"))
    val m = edges.agg(count(lit(1)).as("m"))
    recip.crossJoin(m).select(try_divide(col("r").cast("double"), col("m")).as("reciprocity"))
  }

  /** A15 pseudo_diameter (`edge_based.py:15-32`): BFS double sweep on the
    * largest component, falling back to the whole graph when the LC has
    * <= 1 vertex. Deviation (documented): lodcc/graph-tool's
    * label_largest_component uses STRONG components on directed graphs; we
    * use weak components — sparse KG strong components are near-singletons,
    * which would always trigger the whole-graph fallback. Source vertex =
    * the max-out-degree vertex of the component (deterministic and never a
    * sink, unlike graph-tool's vertex 0); ties on farthest vertex break to
    * the greatest vertex (lodcc's later-wins analog).
    *
    * `precomputedCC` (VERDICT r3 next #3): a (vertex, component) table from
    * a prior [[graft.algo.ConnectedComponents.run]] — e.g. the measure
    * suite's shared CC snapshot — skips the iterative CC job entirely; when
    * absent, CC is computed (and cached only for the duration of this call).
    */
  def pseudoDiameter(edges: DataFrame,
                     precomputedCC: Option[DataFrame] = None): DataFrame = {
    import graft.algo.{Bfs, ConnectedComponents}
    val spark = edges.sparkSession
    val ownCC = precomputedCC.isEmpty
    val cc = precomputedCC.getOrElse(ConnectedComponents.run(edges).cache())
    val top = ConnectedComponents.componentSizes(cc)
      .orderBy(col("size").desc, col("component").asc).limit(1).collect()
    def maxOutSource(e: DataFrame): String =
      e.groupBy(col("src")).agg(count(lit(1)).as("od"))
        .agg(max_by(col("src"), struct(col("od"), col("src"))))
        .head().getString(0)
    // the selected edge set is read by the source-degree aggregation AND by
    // every BFS sweep: checkpoint the (possibly semi-joined) multigraph once
    // so neither consumer re-executes the caller's upstream plan
    val useEdges =
      (if (top.isEmpty || top.head.getLong(1) <= 1) edges.select("src", "dst")
       else {
         val comp = top.head.getString(0)
         val members = cc.where(col("component") === comp).select(col("vertex"))
         edges.select("src", "dst")
           .join(members.withColumnRenamed("vertex", "src"), Seq("src"), "left_semi")
           .join(members.withColumnRenamed("vertex", "dst"), Seq("dst"), "left_semi")
       }).localCheckpoint(true)
    val source = maxOutSource(useEdges)
    val (d, s, t) = Bfs.pseudoDiameter(useEdges, source)
    if (ownCC) cc.unpersist(false)
    import spark.implicits._
    Seq((d, s, t)).toDF("pseudo_diameter", "pseudo_diameter_src_vertex", "pseudo_diameter_trg_vertex")
  }

  /** A13 centralization_degree (`centrality.py:21-40`): on the
    * parallel-edge-free copy, sum(max_deg - deg) / ((N-1)(N-2))
    * = (N*max - sum) / ((N-1)(N-2)).
    */
  def centralizationDegree(edges: DataFrame): DataFrame = {
    val simple = edges.select("src", "dst").distinct()
    Degrees.degrees(simple).agg(
      count(lit(1)).as("nv"), max("deg").as("mx"), sum("deg").as("sm"))
      .select(try_divide((col("nv") * col("mx") - col("sm")).cast("double"),
        (col("nv") - 1) * (col("nv") - 2)).as("centralization_degree"))
  }
}
