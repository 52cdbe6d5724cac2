package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-link scoring (north-star stage between mention detection and
  * canonicalization): ambiguous surface forms are resolved to a candidate
  * entity by context-keyword overlap, entirely as built-in column
  * expressions (no UDFs, no shuffle — the stage is map-only, so it scales
  * linearly with input partitions; the tiny in-row candidate sort uses a
  * higher-order-function comparator, which Spark embeds in the codegen'd
  * stage via its fallback path).
  *
  * Semantics (shared verbatim with the DuckDB oracle twin in
  * `queries.ExtractQueries`):
  *   1. normalize text with [[Extractor.normalizeCol]]; tokenize on ' '
  *   2. an ambiguous alias is "mentioned" iff it appears as a whole token
  *   3. each candidate's score = |tokens(turn) ∩ context(candidate)|
  *   4. chosen = argmax score, ties broken by lexicographically smallest
  *      entity id (deterministic regardless of partitioning)
  *
  * Reference analog: lodcc resolves surface forms to graph vertices by a
  * fixed hash of the full token (`graph/building/edgelist.py:34`); linking
  * there is degenerate (1:1). This stage generalizes it to 1:N with a
  * scoring rule, as the north star requires.
  */
object EntityLinker {

  final case class Candidate(id: String, etype: String, context: Seq[String])

  /** Ambiguous alias -> candidates with single-token lowercase contexts
    * (disjoint from aliases and from each other's discriminating terms).
    */
  val ambiguous: Map[String, Seq[Candidate]] = Map(
    "jordan" -> Seq(
      Candidate("person:michael_jordan", "Person", Seq("basketball", "bulls", "nba", "dunk")),
      Candidate("place:jordan", "Place", Seq("amman", "river", "country", "visa"))),
    "mercury" -> Seq(
      Candidate("person:freddie_mercury", "Person", Seq("queen", "singer", "bohemian", "concert")),
      Candidate("org:mercury_labs", "Org", Seq("insurance", "policy", "claim", "premium"))),
    "amazon" -> Seq(
      Candidate("org:amazon", "Org", Seq("aws", "shopping", "delivery", "prime")),
      Candidate("place:amazon_river", "Place", Seq("rainforest", "brazil", "jungle", "piranha"))))

  /** All aliases, sorted — the deterministic scan order. */
  val aliases: Seq[String] = ambiguous.keys.toSeq.sorted

  /** Union of all context keywords, sorted (query-synthesis vocabulary). */
  val allKeywords: Seq[String] =
    ambiguous.values.flatten.flatMap(_.context).toSeq.distinct.sorted

  private def bestOf(toks: Column, cands: Seq[Candidate]): Column = {
    val scored = array(cands.map { c =>
      struct(
        size(array_intersect(toks, typedlit(c.context))).as("score"),
        lit(c.id).as("entity"))
    }: _*)
    // max score first, then lexicographically smallest id — a comparator
    // sort on a tiny in-row array (no shuffle)
    val ordered = array_sort(scored, (l, r) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .when(l.getField("entity") < r.getField("entity"), -1)
        .when(l.getField("entity") > r.getField("entity"), 1)
        .otherwise(0))
    element_at(ordered, 1)
  }

  /** turns(..., text) -> one row per DISTINCT ambiguous alias present in the
    * turn (repeated occurrences of the same alias within one turn collapse
    * to a single row — the mention test is set-based): output columns are
    * (input columns..., mention, entity, score). Map-only.
    *
    * The three output columns are appended; to avoid silently overwriting
    * data from an earlier stage, the input schema must not already contain
    * `mention`, `entity`, or `score` (fails fast otherwise).
    */
  def link(turns: DataFrame, textCol: String = "text"): DataFrame = {
    // only the three APPENDED columns can clash; the exploded struct lives
    // in a prefixed temp column so a legitimate input `link` column passes
    // through untouched (ADVICE r2)
    val tmp = "__graft_link"
    val tmpToks = "__graft_link_toks"
    // tmp/tmpToks are in the clash list because withColumn would silently
    // clobber (and drop) a caller column of that name
    val clash = Seq("mention", "entity", "score", tmp, tmpToks)
      .filter(turns.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename them before link()")
    // tokenization (regex normalize + split) lands in its OWN projected
    // column first: referenced as an attribute, it is evaluated once per
    // row, where inlining the expression into every per-alias branch
    // (array_contains + 2 candidate intersects x 3 aliases) re-ran the
    // regex chain ~7x per row
    val toks = col(tmpToks)
    val perAlias = aliases.map { alias =>
      val best = bestOf(toks, ambiguous(alias))
      when(array_contains(toks, alias),
        struct(
          lit(alias).as("mention"),
          best.getField("entity").as("entity"),
          best.getField("score").as("score")))
    }
    // explode_OUTER + isNotNull, not plain explode: InferFiltersFromGenerate
    // would otherwise push a size(...) > 0 filter below the Generate with
    // the entire per-alias scoring tree inlined — one full extra evaluation
    // per row (the doc_minhash_lsh pathology). The outer generate emits one
    // null row for mention-free turns, which the post-filter drops — same
    // output.
    turns
      .withColumn(tmpToks, split(Extractor.normalizeCol(col(textCol)), " "))
      .withColumn(tmp, explode_outer(array_compact(array(perAlias: _*))))
      .where(col(tmp).isNotNull)
      .withColumn("mention", col(s"$tmp.mention"))
      .withColumn("entity", col(s"$tmp.entity"))
      .withColumn("score", col(s"$tmp.score"))
      .drop(tmp, tmpToks)
  }
}
