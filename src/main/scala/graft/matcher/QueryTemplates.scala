package graft.matcher

import org.apache.spark.sql.DataFrame

import BgpMatcher.PatternEdge

/** The full WatDiv query-template inventory (lodcc's 4th entry point,
  * `query/generator.py:62-121` + `query/watdiv/query_graphs.py:3-381` + the
  * 20 mustache templates under `query/watdiv/templates/`): 20 canned basic
  * graph patterns in four structural families — L (linear), S (star),
  * F (snowflake), C (complex) — whose embeddings in the data graph
  * instantiate SPARQL query strings.
  *
  * Faithful semantics: the reference matches the UNLABELED query structure
  * (graph-tool `subgraph_isomorphism`) and fills each template's `{{eI}}`
  * predicate slot and `{{eI_subj}}`/`{{eI_obj}}` constant slots from the
  * matched data edges (`generator.py:85-101`) — predicates are OUTPUTS of
  * the match. Each edge here additionally records the WatDiv predicate the
  * template intends (from the reference's per-edge comments,
  * `query_graphs.py:26-380`), so [[Template.labeled]] can run the
  * label-constrained variant when the data graph carries those predicates.
  *
  * Documented deviation: SPARQL variable names follow the query graph's
  * vertex ids (?v0..?vN) and the projection is "all non-constant vertices";
  * the reference .tpl files use template-local names, which is cosmetic.
  */
object QueryTemplates {

  final case class Template(name: String, family: String,
                            edges: Seq[PatternEdge], constSlots: Set[String]) {

    /** All pattern variables, sorted. */
    def vars: Seq[String] = edges.flatMap(e => Seq(e.s, e.o)).distinct.sorted

    /** Constant slot ("e1_subj") -> the pattern variable it is filled from. */
    def constVars: Map[String, String] = constSlots.iterator.map { slot =>
      val i = slot.drop(1).takeWhile(_.isDigit).toInt
      slot -> (if (slot.endsWith("_subj")) edges(i).s else edges(i).o)
    }.toMap

    /** Structure-only pattern (the reference's matching mode). */
    def structural: Seq[PatternEdge] = edges.map(_.copy(label = None))

    /** Label-constrained pattern: WatDiv predicates mapped through `rename`
      * onto the data graph's label vocabulary.
      */
    def labeled(rename: String => String): Seq[PatternEdge] =
      edges.map(pe => pe.copy(label = pe.label.map(rename)))

    /** SPARQL text with `{{eI}}` predicate slots and `{{eI_subj/obj}}`
      * constant slots, rendered per embedding by [[QueryTemplates.instantiate]].
      */
    lazy val sparql: String = {
      val constOf = constVars.map(_.swap) // variable -> slot
      def term(v: String): String =
        constOf.get(v).map(s => s"{{$s}}").getOrElse(s"?$v")
      val lines = edges.zipWithIndex.map { case (pe, i) =>
        s"  ${term(pe.s)} {{e$i}} ${term(pe.o)} ."
      }
      val selected = vars.filterNot(constOf.keySet)
      s"SELECT ${selected.map("?" + _).mkString(" ")} WHERE {\n${lines.mkString("\n")}\n}"
    }
  }

  /** Shorthand constructor: edges as (srcIdx, dstIdx, watdivPredicate|null). */
  private def t(name: String, family: String, consts: String*)(
      es: (Int, Int, String)*): Template =
    Template(name, family,
      es.map { case (s, o, p) => PatternEdge(s"v$s", s"v$o", Option(p)) },
      consts.toSet)

  // ---- L: linear (query_graphs.py:3-67) --------------------------------
  val l1: Template = t("l1", "L", "e0_obj")(
    (0, 1, null), (0, 2, null), (2, 3, null))
  val l2: Template = t("l2", "L", "e2_subj", "e0_obj")(
    (2, 3, "wsdbm:likes"), (2, 1, "sorg:nationality"), (0, 1, "gn:parentCountry"))
  val l3: Template = t("l3", "L", "e1_obj")(
    (0, 1, "wsdbm:likes"), (0, 2, "wsdbm:subscribes"))
  val l4: Template = t("l4", "L", "e0_obj")(
    (0, 1, "og:tag"), (0, 2, "sorg:caption"))
  val l5: Template = t("l5", "L")(
    (0, 1, "sorg:jobTitle"), (0, 3, "sorg:nationality"), (2, 3, "gn:parentCountry"))

  // ---- S: star (query_graphs.py:69-192) --------------------------------
  val s1: Template = t("s1", "S", "e1_subj")(
    (0, 1, "gr:includes"), (2, 0, "gr:offers"), (0, 3, "gr:price"),
    (0, 4, "gr:serial_number"), (0, 5, "gr:validFrom"), (0, 6, "gr:validThrough"),
    (0, 7, "sorg:eligible_Region"), (0, 8, "sorg:eligible_Region"),
    (0, 9, "gr:priceValidUntil"))
  val s2: Template = t("s2", "S", "e1_obj")(
    (0, 1, "dc:Location"), (0, 2, "sorg:nationality"), (0, 3, "wsdbm:gender"),
    (0, 4, "rdf:type"))
  val s3: Template = t("s3", "S", "e0_obj")(
    (0, 1, "rdf:type"), (0, 2, "sorg:caption"), (0, 3, "wsdbm:hasGenre"),
    (0, 4, "sorg:publisher"))
  val s4: Template = t("s4", "S", "e0_obj")(
    (0, 1, "foaf:age"), (0, 2, "foaf:familyName"), (3, 0, "mo:artist"),
    (0, 4, "sorg:nationality"))
  val s5: Template = t("s5", "S", "e0_obj", "e3_obj")(
    (0, 1, "dc:Location"), (0, 2, "sorg:nationality"), (0, 3, "wsdbm:gender"),
    (0, 4, "rdf:type"))
  val s6: Template = t("s6", "S", "e2_obj")(
    (0, 1, "mo:conductor"), (0, 2, "rdf:type"), (0, 3, "wsdbm:hasGenre"))
  val s7: Template = t("s7", "S", "e2_subj")(
    (0, 1, "rdf:type"), (0, 2, "sorg:text"), (3, 0, "wsdbm:likes"))

  // ---- F: snowflake (query_graphs.py:194-307) --------------------------
  val f1: Template = t("f1", "F", "e0_obj", "e4_obj")(
    (0, 1, "og:tag"), (0, 2, "rdf:type"), (3, 0, "wsdbm:hasGenre"),
    (3, 4, "sorg:trailer"), (3, 5, "rdf:type"), (3, 6, "sorg:keywords"))
  val f2: Template = t("f2", "F", "e7_obj")(
    (0, 1, "foaf:homepage"), (0, 2, "og:title"), (0, 3, "rdf:type"),
    (0, 4, "sorg:caption"), (0, 5, "sorg:description"), (1, 6, "sorg:url"),
    (1, 7, "wsdbm:hits"), (0, 8, "wsdbm:hasGenre"))
  val f3: Template = t("f3", "F", "e2_obj")(
    (0, 1, "sorg:contentRating"), (0, 2, "sorg:contentSize"),
    (0, 3, "wsdbm:hasGenre"), (5, 0, "wsdbm:purchaseFor"),
    (4, 5, "wsdbm:makesPurchase"), (5, 6, "wsdbm:purchaseDate"))
  val f4: Template = t("f4", "F", "e2_obj", "e8_obj")(
    (0, 1, "foaf:homepage"), (2, 0, "gr:includes"), (0, 3, "og:title"),
    (0, 4, "sorg:description"), (0, 8, "sorg:contentSize"), (1, 5, "sorg:url"),
    (1, 6, "wsdbm:hits"), (7, 1, "wsdbm:likes"), (1, 9, "sorg:language"))
  val f5: Template = t("f5", "F", "e1_subj")(
    (0, 1, "gr:includes"), (2, 0, "gr:offers"), (0, 3, "gr:price"),
    (0, 4, "gr:validThrough"), (1, 5, "og:title"), (1, 6, "rdf:type"))

  // ---- C: complex (query_graphs.py:309-381) ----------------------------
  val c1: Template = t("c1", "C")(
    (0, 1, "sorg:caption"), (0, 2, "sorg:text"), (0, 3, "sorg:contentRating"),
    (0, 4, "rev:hasReview"), (4, 5, "rev:title"), (4, 6, "rev:reviewer"),
    (7, 6, "sorg:actor"), (7, 8, "sorg:language"))
  val c2: Template = t("c2", "C", "e3_obj")(
    (0, 1, "sorg:legalName"), (0, 2, "gr:offers"), (2, 3, "gr:includes"),
    (2, 5, "sorg:eligibleRegion"), (3, 8, "sorg:actor"), (8, 9, "rev:totalVotes"),
    (7, 3, "wsdbm:purchaseFor"), (4, 7, "wsdbm:makesPurchase"),
    (4, 10, "sorg:jobTitle"), (4, 6, "foaf:homepage"))
  val c3: Template = t("c3", "C")(
    (0, 1, "wsdbm:likes"), (0, 2, "wsdbm:friendOf"), (0, 3, "dc:Location"),
    (0, 4, "foaf:age"), (0, 5, "wsdbm:gender"), (0, 6, "foaf:givenName"))

  val all: Seq[Template] = Seq(
    l1, l2, l3, l4, l5, s1, s2, s3, s4, s5, s6, s7,
    f1, f2, f3, f4, f5, c1, c2, c3)

  def byName(name: String): Template = all.find(_.name == name).get

  /** lodcc flow (`generator.py:62-121`): find up to `maxN` structural
    * embeddings of the template in the data graph, then render one SPARQL
    * string per embedding — `{{eI}}` filled with the matched edge's
    * predicate, `{{eI_subj/obj}}` with the matched constant vertices.
    */
  def instantiate(edges: DataFrame, template: Template, maxN: Int = 3): Seq[String] = {
    val m = BgpMatcher.find(edges, template.structural, maxN, keepEdgeLabels = true)
    val cols = m.columns
    m.collect().toSeq.map { row =>
      val binding = cols.zipWithIndex.map { case (c, i) => c -> row.getString(i) }.toMap
      val full = binding ++ template.constVars.map { case (slot, v) => slot -> binding(v) }
      BgpMatcher.render(template.sparql, full)
    }
  }

  /** lodcc's .sparql file sink (`query/generator.py:118-121`: one file per
    * instantiated query): render up to `maxN` embeddings per template and
    * write each as <dir>/<template>_<i>.sparql. Driver-side file IO by
    * design — the rendered strings are tiny and <= maxN * |templates| many,
    * exactly like the reference's generator output. Returns written paths.
    */
  def writeSparql(edges: DataFrame, templates: Seq[Template], dir: String,
                  maxN: Int = 3): Seq[java.nio.file.Path] = {
    val d = java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    templates.flatMap { tpl =>
      instantiate(edges, tpl, maxN).zipWithIndex.map { case (s, i) =>
        java.nio.file.Files.write(d.resolve(s"${tpl.name}_$i.sparql"),
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }
}
