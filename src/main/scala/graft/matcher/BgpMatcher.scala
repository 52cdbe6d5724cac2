package graft.matcher

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basic-graph-pattern (subgraph) matcher — the relational reformulation of
  * lodcc's `subgraph_isomorphism(QG, D, max_n)` (`query/generator.py:62-121`,
  * SURVEY.md §2.3 J1): one self-equi-join of the edge table per pattern
  * edge, chained on shared variables, plus pairwise inequality filters for
  * vertex-disjoint embeddings (graph-tool isomorphism semantics). Catalyst
  * orders the join chain and broadcasts selective sides.
  */
object BgpMatcher {

  /** One pattern edge: subject var, object var, optional required label. */
  final case class PatternEdge(s: String, o: String, label: Option[String] = None)

  /** Find embeddings of `pattern` in `edges(src, dst, label)`. Returns one
    * column per distinct variable; at most `maxN` rows when maxN > 0
    * (lodcc generates up to 3 embeddings per query graph).
    */
  def find(edges: DataFrame, pattern: Seq[PatternEdge], maxN: Int = 0,
           distinctVertices: Boolean = true,
           keepEdgeLabels: Boolean = false): DataFrame = {
    require(pattern.nonEmpty)
    // connectivity guard: greedily reorder so every edge after the first
    // shares >= 1 variable with the already-joined prefix. Without this, a
    // disconnected pattern edge would silently degrade the equi-join chain
    // to a cartesian product (both join conditions become lit(true)).
    // Each edge keeps its ORIGINAL pattern index (the eI name in a WatDiv
    // template), so output label columns are stable under reordering.
    val ordered: Seq[(PatternEdge, Int)] = {
      val rest = scala.collection.mutable.ArrayBuffer(pattern.zipWithIndex: _*)
      val out = scala.collection.mutable.ArrayBuffer(rest.remove(0))
      var vars = Set(out.head._1.s, out.head._1.o)
      while (rest.nonEmpty) {
        val i = rest.indexWhere { case (pe, _) => vars.contains(pe.s) || vars.contains(pe.o) }
        require(i >= 0,
          s"disconnected basic graph pattern: no remaining edge shares a variable " +
            s"with {${vars.toSeq.sorted.mkString(",")}}; " +
            s"remaining=${rest.map { case (pe, _) => s"(${pe.s},${pe.o})" }.mkString(",")}")
        val pe = rest.remove(i)
        vars = vars + pe._1.s + pe._1.o
        out += pe
      }
      out.toSeq
    }
    var bound = Set.empty[String]
    var acc: DataFrame = null
    ordered.foreach { case (pe, i) =>
      var e = edges.select(
        col("src").as(s"__s$i"), col("dst").as(s"__o$i"), col("label").as(s"e$i"))
      pe.label.foreach(l => e = e.where(col(s"e$i") === l))
      if (acc == null) {
        acc = e.select(col(s"__s$i").as(pe.s), col(s"__o$i").as(pe.o), col(s"e$i"))
        bound = Set(pe.s, pe.o)
      } else {
        // join on whichever pattern variables are already bound
        var joined = acc.join(e,
          (if (bound.contains(pe.s)) col(pe.s) === col(s"__s$i") else lit(true)) &&
            (if (bound.contains(pe.o)) col(pe.o) === col(s"__o$i") else lit(true)))
        if (!bound.contains(pe.s)) joined = joined.withColumn(pe.s, col(s"__s$i"))
        if (!bound.contains(pe.o)) joined = joined.withColumn(pe.o, col(s"__o$i"))
        bound = bound + pe.s + pe.o
        acc = joined.drop(s"__s$i", s"__o$i")
      }
    }
    val varCols = bound.toSeq.sorted.map(col)
    val labelCols =
      if (keepEdgeLabels) pattern.indices.map(i => col(s"e$i")) else Seq.empty
    var out = acc.select(varCols ++ labelCols: _*)
    if (distinctVertices) {
      val vars = bound.toSeq.sorted
      for (a <- vars.indices; b <- (a + 1) until vars.size)
        out = out.where(col(vars(a)) =!= col(vars(b)))
    }
    if (maxN > 0) out.limit(maxN) else out
  }

  /** Driver-side template instantiation (lodcc SF5, `generator.py:118` via
    * pystache): replace {{var}} placeholders with one embedding's bindings.
    */
  def render(template: String, binding: Map[String, String]): String =
    binding.foldLeft(template) { case (t, (k, v)) =>
      t.replace(s"{{$k}}", v).replace(s"{{ $k }}", v)
    }

  /** lodcc SF4 (`query/generator.py:15-41`): split a URI token into
    * (prefix, localname) at the last '/' or '#' inside the angle brackets.
    */
  def uriPrefixLocal(uri: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      regexp_extract(uri, "^<(.*[/#])[^/#]*>$", 1).as("prefix"),
      regexp_extract(uri, "^<.*[/#]([^/#]*)>$", 1).as("localname"))
}
