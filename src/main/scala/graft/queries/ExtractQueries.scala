package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{EntityLinker, Extractor, Gazetteer}

/** Driver-checked extraction-parity query (SF6): gazetteer+regex mention
  * detection over transcripts that are themselves derived from the orders
  * table by pure SQL-expressible transforms — so the DuckDB oracle can
  * replay the exact same text synthesis AND the exact same extraction
  * (shared RE2-compatible pattern, shared normalization).
  */
object ExtractQueries {

  private val pAliases = Gazetteer.people.flatMap(_.aliases)
  private val oAliases = Gazetteer.orgs.flatMap(_.aliases)
  private val lAliases = Gazetteer.places.flatMap(_.aliases)

  /** SQL-literal hygiene for the oracle twins: every constant interpolated
    * into a VALUES list below must need no quoting/escaping. Asserted at
    * class-load so a future vocabulary entry with an apostrophe (or any
    * other SQL metacharacter) fails loudly instead of silently producing
    * broken oracle SQL.
    */
  private def sqlSafe(items: Iterable[String]): Unit = {
    // a single quote or backslash would break the quoted literal; anything
    // else is inert inside '...'
    val bad = items.filter(s => s.contains("'") || s.contains("\\"))
    require(bad.isEmpty, s"SQL-unsafe vocabulary entries: ${bad.mkString(", ")}")
  }
  sqlSafe(pAliases); sqlSafe(oAliases); sqlSafe(lAliases)
  sqlSafe(Gazetteer.aliasToId.keys); sqlSafe(Gazetteer.aliasToId.values)
  sqlSafe(EntityLinker.aliases); sqlSafe(EntityLinker.allKeywords)
  sqlSafe(EntityLinker.ambiguous.values.flatten.map(_.id))

  private def valuesCte(name: String, items: Seq[String]): String =
    items.zipWithIndex
      .map { case (a, i) => s"($i, '$a')" }
      .mkString(s"$name(i, alias) AS (VALUES ", ", ", ")")

  private val aliasMapCte: String =
    Gazetteer.aliasToId.toSeq.sortBy(_._1)
      .map { case (a, id) => s"('$a', '$id')" }
      .mkString("amap(alias, entity) AS (VALUES ", ", ", ")")

  private def textExpr(s: SparkSession): org.apache.spark.sql.Column = {
    concat(
      lit("Tell me about "), get(typedlit(pAliases), (col("o_orderkey") % pAliases.size).cast("int")),
      lit(" who works at "), get(typedlit(oAliases), ((col("o_orderkey") * 31 + 7) % oAliases.size).cast("int")),
      lit(" in "), get(typedlit(lAliases), ((col("o_orderkey") * 17 + 3) % lAliases.size).cast("int")),
      lit("."))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_extract_mentions" -> ((s, dir) => {
      val turns = s.read.parquet(s"$dir/orders.parquet").select(textExpr(s).as("text"))
      val aliasIdMap = typedlit(Gazetteer.aliasToId)
      // explode_OUTER + isNotNull, not plain explode: the inferred
      // size(...) > 0 filter of a plain explode is pushed below the
      // Generate with the normalize + gazetteer regex chain INLINED — the
      // whole extraction regex evaluated twice per row. The outer generate
      // emits one null row for mention-free turns (none exist in this
      // synthesis, but the plan shape must not depend on that), which the
      // post-filter drops — identical output.
      turns
        .select(explode_outer(regexp_extract_all(
          Extractor.normalizeCol(col("text")), lit(Gazetteer.pattern), lit(1))).as("mention"))
        .where(col("mention").isNotNull)
        .select(element_at(aliasIdMap, col("mention")).as("entity"))
        .groupBy("entity").agg(count(lit(1)).as("mentions"))
        .orderBy("entity")
    }),
    // entity-link scoring (north-star stage): ambiguous alias -> candidate
    // chosen by context-keyword overlap, ties to lexicographic-min id
    "kg_link_score" -> ((s, dir) => {
      val al = EntityLinker.aliases
      val kws = EntityLinker.allKeywords
      val turns = s.read.parquet(s"$dir/orders.parquet").select(concat(
        lit("i met "), get(typedlit(al), (col("o_orderkey") % al.size).cast("int")),
        lit(" near the "), get(typedlit(kws), ((col("o_orderkey") * 13 + 5) % kws.size).cast("int")),
        lit(" today")).as("text"))
      EntityLinker.link(turns)
        .groupBy("entity")
        .agg(count(lit(1)).as("links"), sum("score").cast("long").as("total_score"))
        .orderBy("entity")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "kg_extract_mentions" ->
      s"""WITH ${valuesCte("pal", pAliases)},
         |${valuesCte("oal", oAliases)},
         |${valuesCte("lal", lAliases)},
         |$aliasMapCte,
         |turns AS (
         |  SELECT 'Tell me about ' || p.alias || ' who works at ' || g.alias || ' in ' || l.alias || '.' AS text
         |  FROM orders o
         |  JOIN pal p ON p.i = o.o_orderkey % ${pAliases.size}
         |  JOIN oal g ON g.i = (o.o_orderkey * 31 + 7) % ${oAliases.size}
         |  JOIN lal l ON l.i = (o.o_orderkey * 17 + 3) % ${lAliases.size}
         |),
         |mentions AS (
         |  SELECT unnest(regexp_extract_all(
         |    trim(regexp_replace(translate(lower(text), 'üã', 'ua'), '[^a-z0-9]+', ' ', 'g')),
         |    '${Gazetteer.pattern}', 1)) AS mention
         |  FROM turns
         |)
         |SELECT a.entity, CAST(count(*) AS BIGINT) AS mentions
         |FROM mentions m JOIN amap a ON a.alias = m.mention
         |GROUP BY a.entity ORDER BY a.entity""".stripMargin,
    "kg_link_score" -> {
      val al = EntityLinker.aliases
      val kws = EntityLinker.allKeywords
      val alCte = al.zipWithIndex.map { case (a, i) => s"($i, '$a')" }
        .mkString("al(i, alias) AS (VALUES ", ", ", ")")
      val kwCte = kws.zipWithIndex.map { case (k, i) => s"($i, '$k')" }
        .mkString("kws(i, kw) AS (VALUES ", ", ", ")")
      val candCte = al.flatMap(a => EntityLinker.ambiguous(a).map(c => s"('$a', '${c.id}')"))
        .mkString("cand(alias, entity) AS (VALUES ", ", ", ")")
      val ckwCte = al.flatMap(a => EntityLinker.ambiguous(a)
        .flatMap(c => c.context.map(k => s"('${c.id}', '$k')")))
        .mkString("ckw(entity, kw) AS (VALUES ", ", ", ")")
      s"""WITH $alCte,
         |$kwCte,
         |$candCte,
         |$ckwCte,
         |turns AS (
         |  SELECT o.o_orderkey AS tid,
         |    'i met ' || a.alias || ' near the ' || k.kw || ' today' AS text
         |  FROM orders o
         |  JOIN al a ON a.i = o.o_orderkey % ${al.size}
         |  JOIN kws k ON k.i = (o.o_orderkey * 13 + 5) % ${kws.size}
         |),
         |tok AS (
         |  SELECT tid, str_split(trim(regexp_replace(
         |    translate(lower(text), 'üã', 'ua'), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
         |  FROM turns
         |),
         |ment AS (
         |  SELECT t.tid, c.alias, c.entity, t.toks
         |  FROM tok t JOIN cand c ON list_contains(t.toks, c.alias)
         |),
         |scores AS (
         |  SELECT m.tid, m.alias, m.entity,
         |         count(*) FILTER (WHERE list_contains(m.toks, w.kw)) AS score
         |  FROM ment m JOIN ckw w ON w.entity = m.entity
         |  GROUP BY m.tid, m.alias, m.entity
         |),
         |chosen AS (
         |  SELECT entity, score,
         |    row_number() OVER (PARTITION BY tid, alias ORDER BY score DESC, entity ASC) AS rn
         |  FROM scores)
         |SELECT entity, CAST(count(*) AS BIGINT) AS links,
         |       CAST(sum(score) AS BIGINT) AS total_score
         |FROM chosen WHERE rn = 1
         |GROUP BY entity ORDER BY entity""".stripMargin
    },
  )
}
