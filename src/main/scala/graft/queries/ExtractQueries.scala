package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{Extractor, Gazetteer}

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
      turns
        .select(explode(regexp_extract_all(
          Extractor.normalizeCol(col("text")), lit(Gazetteer.pattern), lit(1))).as("mention"))
        .select(element_at(aliasIdMap, col("mention")).as("entity"))
        .groupBy("entity").agg(count(lit(1)).as("mentions"))
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
  )
}
