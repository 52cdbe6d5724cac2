package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.ops.TextOps
import QueryUtil._

/** Driver-checked queries for the sparse text-retrieval operators: TF-IDF
  * cosine pairs (df-capped candidate generation, exact scoring) and
  * inverted-index construction (stop-term guard before any posting array
  * materializes). Oracles replay the identical tf/idf/posting conventions
  * in DuckDB over the same documents table.
  */
object SearchQueries {

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")

  /** Shared DuckDB tokenization twin of [[TextOps.tokens]] (runs of
    * spaces, empty tokens dropped).
    */
  private val tfCte: String =
    """toks AS (
      |  SELECT doc_id AS doc, t.term
      |  FROM documents, unnest(string_split_regex(text, ' +')) AS t(term)
      |  WHERE t.term <> ''),
      |tf AS (SELECT term, doc, count(*) AS tf FROM toks GROUP BY 1, 2)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_tfidf_sim" -> ((s, dir) => {
      // maxDf = 50 exercises the candidate-generation df cap (a tenth of
      // the 500-doc corpus); the cosine itself is exact over every term
      val pairs = Dedup.tfidfCosinePairs(docs(s, dir), "doc_id", "text",
        minCos = 0.0, maxDf = 50)
      roundDoubles(pairs.agg(
        count(lit(1)).cast("bigint").as("cand_pairs"),
        count(when(col("cosine") >= 0.3, 1)).cast("bigint").as("pairs_ge_03"),
        coalesce(round(max("cosine"), 6), lit(0.0)).as("max_cosine"),
        coalesce(sum(when(col("cosine") >= 0.3, col("a") * 31 + col("b"))), lit(0L))
          .cast("bigint").as("pair_checksum")))
    }),

    "doc_inverted_index" -> ((s, dir) => {
      // maxDf = 390 bites mid-vocabulary at sf0.01 (roughly half the hot
      // terms dropped by the guard, the survivors carry 300+-entry posting
      // lists) — both the stop-term path and a substantive posting render
      val idx = TextOps.invertedIndex(docs(s, dir), "doc_id", "text", maxDf = 390)
      idx.where(col("df") >= 3)
        .select(col("term"), col("df"), col("ttf"),
          concat_ws(",", transform(col("postings"),
            p => concat(p.getField("doc"), lit(":"), p.getField("tf"))))
            .as("postings"))
        .orderBy("term")
    }),

    "doc_keywords" -> ((s, dir) =>
      // top-3 TF-IDF keywords per document, full per-row parity
      roundDoubles(TextOps.tfidfKeywords(docs(s, dir), "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("rank"), col("term"),
          round(col("w"), 6).as("w"))
        .orderBy("doc_id", "rank"))),

    "doc_chunks" -> ((s, dir) => {
      // 128-token windows with 32-token overlap (stride 96) — the RAG /
      // pretraining long-doc split; checksum pins every chunk's exact text
      val c = TextOps.chunkByTokens(docs(s, dir), "doc_id", "text",
        chunkTokens = 128, overlapTokens = 32)
      c.agg(
        count(lit(1)).cast("bigint").as("n_chunks"),
        count_distinct(col("doc_id")).cast("bigint").as("docs_chunked"),
        max("chunk_idx").cast("bigint").as("max_chunk_idx"),
        sum("n_chunk_tokens").cast("bigint").as("token_sum"),
        sum(TextOps.portableHash64(col("chunk_text")) % 1000003L)
          .cast("bigint").as("chunk_checksum"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "doc_tfidf_sim" ->
      s"""WITH $tfCte,
         |n AS (SELECT CAST(count(DISTINCT doc) AS DOUBLE) AS n_docs FROM tf),
         |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |w AS (
         |  SELECT tf.doc AS id, tf.term, dfreq.df,
         |         tf.tf * ln((SELECT n_docs FROM n) / dfreq.df) AS w
         |  FROM tf JOIN dfreq USING (term)),
         |norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
         |blocked AS (SELECT id, term FROM w WHERE df <= 50),
         |cands AS (
         |  SELECT DISTINCT x.id AS a, y.id AS b
         |  FROM blocked x JOIN blocked y
         |    ON x.term = y.term AND x.id < y.id),
         |dot AS (
         |  SELECT c.a, c.b, sum(wa.w * wb.w) AS dot
         |  FROM cands c
         |  JOIN w wa ON wa.id = c.a
         |  JOIN w wb ON wb.id = c.b AND wb.term = wa.term
         |  GROUP BY 1, 2),
         |cos AS (
         |  SELECT d.a, d.b, d.dot / (na.nrm * nb.nrm) AS cosine
         |  FROM dot d JOIN norms na ON na.id = d.a JOIN norms nb ON nb.id = d.b)
         |SELECT CAST(count(*) AS BIGINT) AS cand_pairs,
         |       CAST(count(*) FILTER (WHERE cosine >= 0.3) AS BIGINT) AS pairs_ge_03,
         |       CAST(coalesce(round(max(cosine), 6), 0.0) AS DOUBLE) AS max_cosine,
         |       CAST(coalesce(sum(a * 31 + b) FILTER (WHERE cosine >= 0.3), 0) AS BIGINT)
         |         AS pair_checksum
         |FROM cos""".stripMargin,

    "doc_inverted_index" ->
      s"""WITH $tfCte,
         |stats AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS ttf
         |  FROM tf GROUP BY 1)
         |SELECT s.term, s.df, s.ttf,
         |       string_agg(tf.doc || ':' || tf.tf, ',' ORDER BY tf.doc) AS postings
         |FROM stats s JOIN tf USING (term)
         |WHERE s.df BETWEEN 3 AND 390
         |GROUP BY 1, 2, 3 ORDER BY term""".stripMargin,

    "doc_keywords" ->
      s"""WITH $tfCte,
         |n AS (SELECT CAST(count(DISTINCT doc) AS DOUBLE) AS n_docs FROM tf),
         |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |w AS (
         |  SELECT tf.doc AS doc_id, tf.term,
         |         tf.tf * ln((SELECT n_docs FROM n) / dfreq.df) AS w
         |  FROM tf JOIN dfreq USING (term)),
         |r AS (
         |  SELECT doc_id, term, w, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY w DESC, term ASC) AS rank
         |  FROM w)
         |SELECT doc_id, rank, term, CAST(round(w, 6) AS DOUBLE) AS w
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS l
        |  FROM documents),
        |c AS (
        |  SELECT t.doc_id, i.i AS chunk_idx,
        |         array_to_string(t.l[i.i*96+1 : i.i*96+128], ' ') AS chunk_text,
        |         len(t.l[i.i*96+1 : i.i*96+128]) AS n_chunk_tokens
        |  FROM t,
        |       LATERAL unnest(generate_series(0,
        |         greatest((len(t.l) - 1 - 32) // 96, 0))) AS i(i)
        |  WHERE len(t.l) > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_chunked,
        |       CAST(max(chunk_idx) AS BIGINT) AS max_chunk_idx,
        |       CAST(sum(n_chunk_tokens) AS BIGINT) AS token_sum,
        |       CAST(sum(('0x' || substr(md5(chunk_text), 1, 15))::BIGINT % 1000003)
        |         AS BIGINT) AS chunk_checksum
        |FROM c""".stripMargin,
  )
}
