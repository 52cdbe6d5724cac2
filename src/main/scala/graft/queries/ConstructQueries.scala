package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.extract.{Coref, Gazetteer, TextNorm}
import graft.graph.{Fusion, LinkPredict}
import graft.ops.Dsir
import QueryUtil._

/** Round-4 KG-construction additions: coreference, link prediction, triple
  * fusion, schema induction, DSIR importance resampling. Each query has an
  * exact DuckDB twin over the same parquet tables (transcript text is
  * synthesized from orders by SQL-expressible transforms, like
  * [[ExtractQueries]]).
  */
object ConstructQueries {

  private val pAliases: IndexedSeq[String] = Gazetteer.people.flatMap(_.aliases)

  /** Person alias (normalized) -> id VALUES CTE for the coref oracle. */
  private val pmapCte: String =
    (for { e <- Gazetteer.people; a <- e.aliases }
      yield s"('${TextNorm.normalize(a)}', '${e.id}')").distinct
      .mkString("pmap(alias, entity) AS (VALUES ", ", ", ")")

  private val palCte: String =
    pAliases.zipWithIndex.map { case (a, i) => s"($i, '$a')" }
      .mkString("pal(i, alias) AS (VALUES ", ", ", ")")

  /** The sparser 20011-vertex graph used by link prediction (the shared
    * 4096-vertex graph is near-complete at sf0.1, which makes neighborhood
    * overlap degenerate — every pair shares everything).
    */
  private def sparseEdges(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet").select(
      concat(lit("v"), (col("l_orderkey") % 20011).cast("string")).as("src"),
      concat(lit("v"), ((col("l_partkey") * 31 + 7) % 20011).cast("string")).as("dst"),
      concat(lit("p"), (col("l_suppkey") % 7).cast("string")).as("label"))

  private val sparseEdgesCte: String =
    """WITH edges AS (
      |  SELECT 'v' || (l_orderkey % 20011) AS src,
      |         'v' || ((l_partkey * 31 + 7) % 20011) AS dst,
      |         'p' || (l_suppkey % 7) AS label
      |  FROM lineitem
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "kg_coref" -> ((s, dir) => {
      // transcripts from orders: conversations of ~(rows/257) turns; turn
      // templates cycle mention -> pronoun -> neither within a conversation
      val turns = s.read.parquet(s"$dir/orders.parquet").select(
        (col("o_orderkey") % 257).as("conv"), col("o_orderkey").as("k"),
        when(col("o_orderkey") % 3 === 0,
          concat(lit("Tell me about "),
            get(typedlit(pAliases), ((col("o_orderkey") * 7 + 1) % pAliases.size).cast("int")),
            lit(".")))
          .when(col("o_orderkey") % 3 === 1, lit("And what did they build next?"))
          .otherwise(lit("Thanks, noted.")).as("text"))
        .withColumn("turn_idx",
          row_number().over(Window.partitionBy("conv").orderBy("k")))
      Coref.resolve(turns, "conv", "turn_idx", "text")
        .where(col("is_pronoun"))
        .groupBy(coalesce(col("antecedent"), lit("(unresolved)")).as("antecedent"))
        .agg(count(lit(1)).as("n_pronouns"))
        .orderBy("antecedent")
    }),

    "kg_link_pred" -> ((s, dir) => {
      val sc = LinkPredict.scores(sparseEdges(s, dir), maxHubDeg = 64)
      roundDoubles(sc
        .orderBy(desc("common_neighbors"), col("a"), col("b")).limit(30)
        .select(col("a"), col("b"), col("common_neighbors"),
          col("adamic_adar"), col("jaccard")))
    }),

    "kg_triple_fusion" -> ((s, dir) => {
      val t = s.read.parquet(s"$dir/lineitem.parquet").select(
        concat(lit("v"), (col("l_orderkey") % 4096).cast("string")).as("src"),
        concat(lit("v"), (col("l_partkey") % 4096).cast("string")).as("dst"),
        concat(lit("p"), (col("l_suppkey") % 7).cast("string")).as("label"),
        concat(lit("s"), (col("l_linenumber") % 5).cast("string")).as("source"),
        (lit(0.3) + (col("l_linenumber") % 5).cast("double") * 0.05).as("w"))
      val fused = Fusion.tripleFusion(t, "source", "w")
      roundDoubles(fused.groupBy("n_sources").agg(
          count(lit(1)).as("n_triples"),
          sum("n_assertions").as("n_assertions"),
          sum(round(col("confidence") * 1e6).cast("long")).as("conf_sum_micros"),
          min(round(col("confidence"), 6)).as("min_conf"),
          max(round(col("confidence"), 6)).as("max_conf"))
        .orderBy("n_sources"))
    }),

    "kg_schema_stats" -> ((s, dir) => {
      val cls = (v: org.apache.spark.sql.Column) =>
        concat(lit("c"), pmod(substring(v, 2, 10).cast("long"), lit(8L)).cast("string"))
      Fusion.schemaStats(liEdges(s, dir), cls)
        .orderBy(desc("n_assertions"), col("src_class"), col("label"), col("dst_class"))
        .limit(40)
    }),

    "doc_dsir" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val w = Dsir.importanceWeights(d, "doc_id", "text",
        col("lang") === "en", buckets = 64)
      roundDoubles(w.select(col("doc_id"), col("n_tokens"), col("weight"))
        .orderBy(desc("weight"), col("doc_id")).limit(20))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "kg_coref" ->
      s"""WITH $palCte,
         |$pmapCte,
         |turns AS (
         |  SELECT o.o_orderkey % 257 AS conv, o.o_orderkey AS k,
         |    CASE WHEN o.o_orderkey % 3 = 0 THEN 'Tell me about ' || p.alias || '.'
         |         WHEN o.o_orderkey % 3 = 1 THEN 'And what did they build next?'
         |         ELSE 'Thanks, noted.' END AS text
         |  FROM orders o JOIN pal p ON p.i = (o.o_orderkey * 7 + 1) % ${pAliases.size}
         |),
         |idx AS (
         |  SELECT conv,
         |    row_number() OVER (PARTITION BY conv ORDER BY k) AS turn_idx,
         |    trim(regexp_replace(translate(lower(text), 'üã', 'ua'),
         |         '[^a-z0-9]+', ' ', 'g')) AS n
         |  FROM turns),
         |res AS (
         |  SELECT conv, turn_idx,
         |    nullif(regexp_extract(n, '${Coref.personPattern}', 1), '') AS mention,
         |    regexp_matches(n, '${Coref.pronounPattern}') AS is_pronoun
         |  FROM idx),
         |ent AS (
         |  SELECT r.conv, r.turn_idx, r.is_pronoun, m.entity
         |  FROM res r LEFT JOIN pmap m ON m.alias = r.mention),
         |win AS (
         |  SELECT is_pronoun,
         |    last_value(entity IGNORE NULLS) OVER (
         |      PARTITION BY conv ORDER BY turn_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ante
         |  FROM ent)
         |SELECT coalesce(ante, '(unresolved)') AS antecedent,
         |       CAST(count(*) AS BIGINT) AS n_pronouns
         |FROM win WHERE is_pronoun GROUP BY 1 ORDER BY 1""".stripMargin,

    "kg_link_pred" ->
      s"""$sparseEdgesCte,
         |und AS (SELECT src AS u, dst AS v FROM edges WHERE src <> dst),
         |nbr AS (SELECT DISTINCT u, v FROM
         |        (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und) x),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY u),
         |ctr AS (SELECT n.u AS w, n.v AS x, g.d AS dw
         |        FROM nbr n JOIN deg g ON g.u = n.u WHERE g.d <= 64),
         |pairs AS (SELECT l.x AS a, r.x AS b, l.dw AS dw
         |          FROM ctr l JOIN ctr r ON l.w = r.w AND l.x < r.x),
         |agg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
         |               sum(1.0 / ln(CAST(dw AS DOUBLE))) AS adamic_adar
         |        FROM pairs GROUP BY a, b)
         |SELECT g.a, g.b, g.common_neighbors,
         |       CAST(round(g.adamic_adar, 6) AS DOUBLE) AS adamic_adar,
         |       CAST(round(CAST(g.common_neighbors AS DOUBLE)
         |             / CAST(da.d + db.d - g.common_neighbors AS DOUBLE), 6) AS DOUBLE) AS jaccard
         |FROM agg g JOIN deg da ON da.u = g.a JOIN deg db ON db.u = g.b
         |ORDER BY g.common_neighbors DESC, g.a, g.b LIMIT 30""".stripMargin,

    "kg_triple_fusion" ->
      """WITH t AS (
        |  SELECT 'v' || (l_orderkey % 4096) AS src,
        |         'v' || (l_partkey % 4096) AS dst,
        |         'p' || (l_suppkey % 7) AS label,
        |         's' || (l_linenumber % 5) AS source,
        |         0.3 + CAST(l_linenumber % 5 AS DOUBLE) * 0.05 AS w
        |  FROM lineitem),
        |fused AS (
        |  SELECT src, label, dst,
        |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |         CAST(count(*) AS BIGINT) AS n_assertions,
        |         1.0 - exp(sum(ln(1.0 - w))) AS confidence
        |  FROM t GROUP BY src, label, dst)
        |SELECT n_sources,
        |       CAST(count(*) AS BIGINT) AS n_triples,
        |       CAST(sum(n_assertions) AS BIGINT) AS n_assertions,
        |       CAST(sum(CAST(round(confidence * 1e6, 0) AS BIGINT)) AS BIGINT) AS conf_sum_micros,
        |       CAST(min(round(confidence, 6)) AS DOUBLE) AS min_conf,
        |       CAST(max(round(confidence, 6)) AS DOUBLE) AS max_conf
        |FROM fused GROUP BY n_sources ORDER BY n_sources""".stripMargin,

    "kg_schema_stats" ->
      """WITH edges AS (
        |  SELECT 'v' || (l_orderkey % 4096) AS src,
        |         'v' || (l_partkey % 4096) AS dst,
        |         'p' || (l_suppkey % 7) AS label
        |  FROM lineitem)
        |SELECT 'c' || (CAST(substr(src, 2) AS BIGINT) % 8) AS src_class, label,
        |       'c' || (CAST(substr(dst, 2) AS BIGINT) % 8) AS dst_class,
        |       CAST(count(*) AS BIGINT) AS n_assertions,
        |       CAST(count(DISTINCT src || '|' || dst) AS BIGINT) AS n_distinct_pairs
        |FROM edges GROUP BY 1, 2, 3
        |ORDER BY n_assertions DESC, src_class, label, dst_class LIMIT 40""".stripMargin,

    "doc_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS is_t,
        |         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) u),
        |stats AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS r,
        |         CAST(count(*) FILTER (WHERE is_t) AS BIGINT) AS t
        |  FROM toks GROUP BY b),
        |tot AS (SELECT sum(r) AS rtot, sum(t) AS ttot FROM stats),
        |lr AS (
        |  SELECT b, ln(CAST(t + 1 AS DOUBLE) / (ttot + 64))
        |           - ln(CAST(r + 1 AS DOUBLE) / (rtot + 64)) AS lr
        |  FROM stats, tot)
        |SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(round(sum(l.lr), 6) AS DOUBLE) AS weight
        |FROM toks k JOIN lr l ON l.b = k.b
        |GROUP BY k.doc_id
        |ORDER BY weight DESC, k.doc_id LIMIT 20""".stripMargin,
  )
}
