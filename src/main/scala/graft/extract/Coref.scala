package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recency-based pronoun resolution over multi-turn transcripts — the
  * coreference stage of KG construction from conversations (reference
  * analog: lodcc consumes pre-built graphs, so this is an engine addition
  * on the transcripts->triples path; without it every "they/he/she" turn
  * drops its triple).
  *
  * Rule (deterministic, the classic recency heuristic): a pronoun turn
  * resolves to the most recent PRIOR turn's person mention within the same
  * conversation; unresolved when no prior mention exists. Mentions are
  * gazetteer person aliases (leftmost match after [[TextNorm]] folding),
  * pronoun detection is a word-boundary regex over the normalized text.
  *
  * Scale shape: ONE window shuffle keyed on the conversation id — no join,
  * no explode. Conversations are bounded (a transcript has bounded turns),
  * so partitions are balanced under hash partitioning by conv and the
  * running `last(_, ignoreNulls)` state is one value per conversation.
  * Everything before the window is a per-row projection inside whole-stage
  * codegen.
  */
object Coref {

  /** Alternation over normalized PERSON aliases, longest-first so the
    * leftmost match is also leftmost-longest; RE2-compatible (shared with
    * the DuckDB oracle twins, like [[Gazetteer.pattern]]).
    */
  val personPattern: String = {
    val norm = Gazetteer.people.flatMap(_.aliases).map(TextNorm.normalize)
      .distinct.sortBy(a => (-a.length, a))
    norm.mkString("\\b(", "|", ")\\b")
  }

  /** Word-boundary pronoun test over normalized (space-separated) text. */
  val pronounPattern: String = "(^| )(he|she|they)( |$)"

  private val personAliasToId: Map[String, String] =
    (for { e <- Gazetteer.people; a <- e.aliases }
      yield TextNorm.normalize(a) -> e.id).toMap

  /** Appends to `turns` (convCol, idxCol, textCol):
    *  - `mention_entity`: canonical id of the first person mention (null if none)
    *  - `is_pronoun`:     the turn contains he/she/they
    *  - `antecedent`:     for pronoun turns, the most recent prior
    *                      mention_entity in the conversation (null if
    *                      unresolved or not a pronoun turn)
    */
  def resolve(turns: DataFrame, convCol: String, idxCol: String,
              textCol: String): DataFrame = {
    val norm = Extractor.normalizeCol(col(textCol))
    val mention = regexp_extract(norm, personPattern, 1)
    val entity = element_at(typedlit(personAliasToId), nullif(mention, lit("")))
    val w = Window.partitionBy(convCol).orderBy(idxCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("mention_entity", entity)
      .withColumn("is_pronoun", norm.rlike(pronounPattern))
      .withColumn("antecedent",
        when(col("is_pronoun"),
          last(col("mention_entity"), ignoreNulls = true).over(w)))
  }
}
