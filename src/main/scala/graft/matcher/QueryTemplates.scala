package graft.matcher

import org.apache.spark.sql.DataFrame

import BgpMatcher.PatternEdge

/** WatDiv-style query templates (lodcc's 4th entry point,
  * `query/generator.py:190-271` + `query/watdiv/query_graphs.py` + the
  * 20 mustache templates under `query/watdiv/templates/`): canned basic
  * graph patterns whose
  * embeddings in the data graph instantiate SPARQL query strings.
  *
  * The reference ships 20 template graphs (L/S/F/C families: linear, star,
  * snowflake, complex). We model the three structural families; adding more
  * is data, not code.
  */
object QueryTemplates {

  final case class Template(name: String, pattern: Seq[PatternEdge], sparql: String)

  /** Linear path L: ?a -> ?b -> ?c (watdiv l1.tpl analog). */
  val l1: Template = Template(
    "l1",
    Seq(PatternEdge("a", "b"), PatternEdge("b", "c")),
    """SELECT ?b ?c WHERE {
      |  {{a}} ?p1 ?b .
      |  ?b ?p2 ?c .
      |}""".stripMargin)

  /** Star S: one subject, three objects (watdiv s* analog). */
  val s1: Template = Template(
    "s1",
    Seq(PatternEdge("a", "b"), PatternEdge("a", "c"), PatternEdge("a", "d")),
    """SELECT ?b ?c ?d WHERE {
      |  {{a}} ?p1 ?b .
      |  {{a}} ?p2 ?c .
      |  {{a}} ?p3 ?d .
      |}""".stripMargin)

  /** Complex C: diamond a->b->d, a->c->d (watdiv c* analog). */
  val c1: Template = Template(
    "c1",
    Seq(PatternEdge("a", "b"), PatternEdge("b", "d"),
      PatternEdge("a", "c"), PatternEdge("c", "d")),
    """SELECT ?b ?c WHERE {
      |  {{a}} ?p1 ?b . ?b ?p2 {{d}} .
      |  {{a}} ?p3 ?c . ?c ?p4 {{d}} .
      |}""".stripMargin)

  val all: Seq[Template] = Seq(l1, s1, c1)

  /** lodcc flow: find up to `maxN` embeddings of each template in the data
    * graph and render one SPARQL string per embedding (template vars bound
    * to the matched vertex surface forms).
    */
  def instantiate(edges: DataFrame, template: Template, maxN: Int = 3): Seq[String] = {
    val m = BgpMatcher.find(edges, template.pattern, maxN)
    val vars = m.columns
    m.collect().toSeq.map { row =>
      val binding = vars.zipWithIndex.map { case (v, i) => v -> row.getString(i) }.toMap
      BgpMatcher.render(template.sparql, binding)
    }
  }
}
