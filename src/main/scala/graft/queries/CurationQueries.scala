package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, TextOps}
import QueryUtil.roundDoubles

/** Driver-checked queries for the corpus-curation operators (PII scrub,
  * Gopher-style repetition signals, benchmark contamination, stratified
  * sampling) over the documents table. Each has an exact DuckDB twin; the
  * PII query derives its input by injecting deterministic PII spans into
  * the (PII-free) synthetic corpus — the injection is part of the query on
  * BOTH sides, so the parity check exercises real matches, not just the
  * all-zero case.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")

  /** Per-source sampling rates for doc_stratified_sample — shared verbatim
    * with the SQL twin (rates chosen to exercise override + default).
    */
  val StratRates: Map[String, Double] =
    Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.1)
  val StratDefault: Double = 0.25

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_pii" -> ((s, dir) => {
      // deterministic PII injection (the corpus itself is synthetic and
      // PII-free): ~1/7 of docs get an email, ~1/11 an IPv4, ~1/13 a phone
      val injected = docs(s, dir).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".25 logged"))).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit(" call 555-867-5309 soon")).otherwise(lit("")))
        .as("text"))
      val p = Curation.piiSignals(injected, "doc_id", "text")
      p.agg(
        count(when(col("n_emails") + col("n_ips") + col("n_phones") > 0, 1))
          .cast("bigint").as("docs_with_pii"),
        sum("n_emails").cast("bigint").as("total_emails"),
        sum("n_ips").cast("bigint").as("total_ips"),
        sum("n_phones").cast("bigint").as("total_phones"),
        sum(TextOps.portableHash64(col("redacted")) % 1000003L)
          .cast("bigint").as("redacted_checksum"),
        sum(octet_length(col("redacted"))).cast("bigint").as("redacted_bytes"))
    }),

    "doc_quantiles" -> ((s, dir) => {
      // exact per-language length percentiles (the oracle-checkable end of
      // the exact/approx trade; production default is the approx sketch)
      roundDoubles(Curation.groupQuantiles(docs(s, dir), "n_chars", "lang",
        Seq(0.1, 0.25, 0.5, 0.75, 0.9), exact = true))
    }),

    "doc_repetition" -> ((s, dir) => {
      // map-only signal pass over a single-partition local file: spread it
      // (at production scale the input is already many-partitioned)
      val r = Curation.repetitionSignals(
        docs(s, dir).repartition(32), "doc_id", "text")
      roundDoubles(r.agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        count(when(col("gopher_pass"), 1)).cast("bigint").as("n_pass"),
        round(avg("frac_dup_ngrams"), 6).as("avg_dup_frac"),
        round(avg("mean_word_len"), 6).as("avg_word_len"),
        round(avg("frac_alpha_words"), 6).as("avg_alpha_frac"),
        max("top_ngram_count").cast("bigint").as("max_top_ngram"),
        sum("distinct_ngrams").cast("bigint").as("distinct_ngram_sum")))
    }),

    "doc_contamination" -> ((s, dir) => {
      // benchmark = every 20th doc (a stand-in eval suite); corpus = the
      // rest. 5-gram overlap fraction per corpus doc.
      val d = docs(s, dir)
      val bench = d.where(col("doc_id") % 20 === 0)
      val corpus = d.where(col("doc_id") % 20 =!= 0)
      val c = Curation.ngramContamination(
        corpus.repartition(32), bench, "doc_id", "text", n = 5)
      roundDoubles(c.agg(
        count(lit(1)).cast("bigint").as("n_corpus_docs"),
        count(when(col("contaminated_ngrams") > 0, 1))
          .cast("bigint").as("contaminated_docs"),
        count(when(col("contamination_frac") >= 0.5, 1))
          .cast("bigint").as("heavy_docs"),
        round(avg("contamination_frac"), 6).as("avg_contamination"),
        sum("contaminated_ngrams").cast("bigint").as("contaminated_sum")))
    }),

    "doc_bench_exposure" -> ((s, dir) => {
      // the decontamination report read the OTHER way: for every
      // benchmark item, what fraction of ITS 5-grams leaked into the
      // training corpus — the per-eval-item compromise list (reuses
      // ngramContamination with the roles swapped; corpus side becomes
      // the probe set, so broadcastBench=false keeps the big side
      // shuffled, not broadcast)
      val d = docs(s, dir)
      val bench = d.where(col("doc_id") % 20 === 0)
      val corpus = d.where(col("doc_id") % 20 =!= 0)
      Curation.ngramContamination(bench, corpus, "doc_id", "text",
          n = 5, broadcastBench = false)
        .select(col("doc_id"),
          col("total_ngrams"), col("contaminated_ngrams").as("exposed_ngrams"),
          round(col("contamination_frac"), 6).as("exposure_frac"))
        .orderBy("doc_id")
    }),

    "doc_contamination_bloom" -> ((s, dir) => {
      // Bloom-bitset contamination flagging (the map-only 100-TB probe):
      // same benchmark split as doc_contamination; the oracle replays the
      // bitset as a position-subset test, so even the false positives are
      // deterministic and parity-checked
      val d = docs(s, dir)
      val bench = d.where(col("doc_id") % 20 === 0)
      val corpus = d.where(col("doc_id") % 20 =!= 0)
      val c = Curation.bloomContamination(
        corpus.repartition(32), bench, "doc_id", "text", n = 5)
      roundDoubles(c.agg(
        count(lit(1)).cast("bigint").as("n_corpus_docs"),
        count(when(col("flagged_ngrams") > 0, 1))
          .cast("bigint").as("flagged_docs"),
        round(avg("flagged_frac"), 6).as("avg_flagged"),
        sum("flagged_ngrams").cast("bigint").as("flagged_sum")))
    }),

    "doc_pack" -> ((s, dir) => {
      // GPT-style concat-and-chunk packing of the whole corpus into
      // 512-token windows via the distributed two-pass prefix sum (the
      // scalable path — no single-partition window)
      val d = docs(s, dir)
        .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      val p = Curation.packChunksGlobal(d, "doc_id", "n_tokens", "doc_id",
        windowTokens = 512)
      p.agg(
        max("end_token").cast("bigint").as("total_tokens"),
        count(when(col("spans_boundary"), 1)).cast("bigint").as("spanning_docs"),
        max("last_chunk").cast("bigint").as("max_chunk"),
        sum(col("first_chunk") * 31 + col("last_chunk"))
          .cast("bigint").as("chunk_checksum"),
        sum("start_token").cast("bigint").as("offset_checksum"))
    }),

    "doc_stratified_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = Curation.stratifiedSample(
        d, "doc_id", "source", StratRates, StratDefault)
        .groupBy("source")
        .agg(count(lit(1)).as("k"), sum("doc_id").as("kc"))
      d.groupBy("source").agg(count(lit(1)).as("total"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("total").cast("bigint").as("total"),
          coalesce(col("k"), lit(0L)).cast("bigint").as("kept"),
          coalesce(col("kc"), lit(0L)).cast("bigint").as("kept_checksum"))
        .orderBy("source")
    }),

    "doc_temperature_sample" -> ((s, dir) => {
      // temperature mixing over the SKEWED lang column (en dominates):
      // alpha = 0.5 (IEEE-exact sqrt weights), target 100 of 500 docs —
      // small languages get visibly higher keep rates than en
      val d = docs(s, dir)
      val kept = Curation.temperatureSample(d, "doc_id", "lang",
        alpha = 0.5, targetCount = 100L)
        .groupBy("lang")
        .agg(count(lit(1)).as("k"), sum("doc_id").as("kc"),
          max("keep_rate").as("rate"))
      QueryUtil.roundDoubles(
        d.groupBy("lang").agg(count(lit(1)).as("total"))
          .join(kept, Seq("lang"), "left")
          .select(col("lang"), col("total").cast("bigint").as("total"),
            coalesce(col("k"), lit(0L)).cast("bigint").as("kept"),
            coalesce(col("kc"), lit(0L)).cast("bigint").as("kept_checksum"),
            round(coalesce(col("rate"), lit(0.0)), 6).as("keep_rate"))
          .orderBy("lang"))
    }),

    "doc_profile" -> ((s, dir) =>
      // exact distinct counts pinned: the cross-engine oracle checks the
      // exact form; the HLL++ sketch is the (unpinnable) production default
      graft.ops.Profile.summarize(docs(s, dir), approxDistinct = false)
        .orderBy("column_name", "metric")),

    "doc_weighted_sample" -> ((s, dir) => {
      // length-weighted A-ES: 20 docs per language, longer docs favored
      val w = Curation.weightedSample(docs(s, dir), "doc_id", "lang",
        "n_chars", k = 20)
      w.groupBy("lang").agg(
        count(lit(1)).cast("bigint").as("n_kept"),
        sum("doc_id").cast("bigint").as("id_checksum"),
        sum("n_chars").cast("bigint").as("char_sum"))
        .orderBy("lang")
    }),

    "doc_winsorize" -> ((s, dir) => {
      // clip n_chars to each language's [p10, p90]; the per-row checksum
      // scales to integer micro-units so the aggregate is engine-exact
      val w = Curation.winsorize(docs(s, dir), "n_chars", "lang",
        lo = 0.1, hi = 0.9, exact = true)
      w.groupBy("lang").agg(
        count(lit(1)).cast("bigint").as("n"),
        count(when(col("was_clipped"), 1)).cast("bigint").as("n_clipped"),
        sum(round(col("clipped") * 1000000, 0).cast("bigint"))
          .cast("bigint").as("clip_checksum"))
        .orderBy("lang")
    }),

    "doc_dedup_incremental" -> ((s, dir) => {
      // prior snapshot = docs with id < 250 (their exact-hash set); the new
      // batch = the rest; keep rows novel vs the snapshot AND first-in-batch
      val d = docs(s, dir)
      val seen = Dedup.exactGroups(d.where(col("doc_id") < 250), "doc_id", "text")
        .select("text_hash")
      val newDocs = Dedup.incrementalNew(
        d.where(col("doc_id") >= 250), seen, "doc_id", "text")
      newDocs.agg(
        count(lit(1)).cast("bigint").as("n_new"),
        count_distinct(col("text_hash")).cast("bigint").as("n_hashes"),
        sum("doc_id").cast("bigint").as("id_checksum"),
        sum(octet_length(col("text"))).cast("bigint").as("byte_checksum"))
    }))

  private val h64 = (e: String) => s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** DuckDB twin of Profile.summarize over the documents table (one UNION
    * ALL branch per (column, metric), mirroring the schema-driven metric
    * set: numeric cols get min/max/sum, string cols get byte lengths).
    */
  private val profileSql: String = {
    def m(c: String, metric: String, valueExpr: String) =
      s"SELECT '$c' AS column_name, '$metric' AS metric, CAST($valueExpr AS DOUBLE) AS value FROM documents"
    def base(c: String) = Seq(
      m(c, "n_nulls", s"count(*) FILTER (WHERE $c IS NULL)"),
      m(c, "n_distinct", s"count(DISTINCT $c)"))
    val numeric = Seq("doc_id", "n_chars").flatMap(c => base(c) ++ Seq(
      m(c, "min", s"min($c)"), m(c, "max", s"max($c)"), m(c, "sum", s"sum($c)")))
    val strings = Seq("text", "lang", "source").flatMap(c => base(c) ++ Seq(
      m(c, "min_len", s"min(octet_length(encode($c)))"),
      m(c, "max_len", s"max(octet_length(encode($c)))"),
      m(c, "sum_len", s"sum(octet_length(encode($c)))")))
    (numeric ++ strings).mkString("\nUNION ALL\n") +
      "\nORDER BY column_name, metric"
  }

  val oracleSql: Map[String, String] = Map(
    "doc_pii" ->
      s"""WITH injected AS (
         |  SELECT doc_id,
         |         text
         |         || CASE WHEN doc_id % 7 = 0
         |                 THEN ' contact user' || doc_id || '@example.com now'
         |                 ELSE '' END
         |         || CASE WHEN doc_id % 11 = 0
         |                 THEN ' from 10.0.' || (doc_id % 256) || '.25 logged'
         |                 ELSE '' END
         |         || CASE WHEN doc_id % 13 = 0
         |                 THEN ' call 555-867-5309 soon'
         |                 ELSE '' END AS text
         |  FROM documents),
         |s1 AS (
         |  SELECT doc_id,
         |         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
         |         regexp_replace(text,
         |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
         |  FROM injected),
         |s2 AS (
         |  SELECT doc_id, n_emails,
         |         len(regexp_extract_all(t1, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ips,
         |         regexp_replace(t1,
         |           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g') AS t2
         |  FROM s1),
         |pii AS (
         |  SELECT doc_id, n_emails, n_ips,
         |         len(regexp_extract_all(t2, '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b')) AS n_phones,
         |         regexp_replace(t2,
         |           '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '<PHONE>', 'g') AS redacted
         |  FROM s2)
         |SELECT CAST(count(*) FILTER (WHERE n_emails + n_ips + n_phones > 0) AS BIGINT) AS docs_with_pii,
         |       CAST(sum(n_emails) AS BIGINT) AS total_emails,
         |       CAST(sum(n_ips) AS BIGINT) AS total_ips,
         |       CAST(sum(n_phones) AS BIGINT) AS total_phones,
         |       CAST(sum(${h64("redacted")} % 1000003) AS BIGINT) AS redacted_checksum,
         |       CAST(sum(strlen(redacted)) AS BIGINT) AS redacted_bytes
         |FROM pii""".stripMargin,

    "doc_quantiles" ->
      """WITH a AS (
        |  SELECT lang,
        |         quantile_cont(n_chars, [0.1, 0.25, 0.5, 0.75, 0.9]) AS qs
        |  FROM documents GROUP BY lang),
        |u AS (
        |  SELECT lang,
        |         unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS prob,
        |         unnest(qs) AS value
        |  FROM a)
        |SELECT lang, CAST(round(prob, 6) AS DOUBLE) AS prob,
        |       CAST(round(value, 6) AS DOUBLE) AS value
        |FROM u""".stripMargin,

    "doc_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |base AS (
        |  SELECT doc_id, len(l) AS n_tokens,
        |         CAST(list_sum(list_transform(l, t -> length(t))) AS DOUBLE) / len(l) AS mwl,
        |         CAST(len(list_filter(l, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(l) AS fa
        |  FROM toks),
        |g2 AS (
        |  SELECT doc_id, array_to_string(l[i:i+1], ' ') AS gram
        |  FROM toks, LATERAL unnest(generate_series(1, greatest(len(l) - 1, 0))) g(i)),
        |gc AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
        |gs AS (SELECT doc_id, sum(c) AS total, count(*) AS dist, max(c) AS top
        |       FROM gc GROUP BY 1),
        |j AS (
        |  SELECT b.doc_id, b.n_tokens, b.mwl, b.fa,
        |         coalesce(gs.total, 0) AS total,
        |         coalesce(gs.dist, 0) AS dist,
        |         coalesce(gs.top, 0) AS top,
        |         CASE WHEN coalesce(gs.total, 0) > 0
        |              THEN 1.0 - CAST(gs.dist AS DOUBLE) / gs.total ELSE 0.0 END AS fdup
        |  FROM base b LEFT JOIN gs USING (doc_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(*) FILTER (WHERE n_tokens BETWEEN 50 AND 100000
        |                               AND mwl >= 3.0 AND mwl <= 10.0
        |                               AND fa >= 0.8 AND fdup <= 0.2) AS BIGINT) AS n_pass,
        |       CAST(round(avg(fdup), 6) AS DOUBLE) AS avg_dup_frac,
        |       CAST(round(avg(mwl), 6) AS DOUBLE) AS avg_word_len,
        |       CAST(round(avg(fa), 6) AS DOUBLE) AS avg_alpha_frac,
        |       CAST(max(top) AS BIGINT) AS max_top_ngram,
        |       CAST(sum(dist) AS BIGINT) AS distinct_ngram_sum
        |FROM j""".stripMargin,

    "doc_contamination" ->
      s"""WITH g5 AS (
         |  SELECT doc_id, ${h64("array_to_string(l[i:i+4], ' ')")} AS h
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t,
         |       LATERAL unnest(generate_series(1, greatest(len(l) - 4, 0))) g(i)),
         |gd AS (SELECT DISTINCT doc_id, h FROM g5),
         |bench AS (SELECT DISTINCT h FROM gd WHERE doc_id % 20 = 0),
         |corp AS (SELECT doc_id, h FROM gd WHERE doc_id % 20 <> 0),
         |tot AS (SELECT doc_id, count(*) AS total FROM corp GROUP BY 1),
         |cont AS (SELECT c.doc_id, count(*) AS cont
         |         FROM corp c JOIN bench b USING (h) GROUP BY 1),
         |j AS (
         |  SELECT d.doc_id,
         |         coalesce(tot.total, 0) AS total,
         |         coalesce(cont.cont, 0) AS cont,
         |         CASE WHEN coalesce(tot.total, 0) > 0
         |              THEN CAST(coalesce(cont.cont, 0) AS DOUBLE) / tot.total
         |              ELSE 0.0 END AS frac
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
         |  LEFT JOIN tot USING (doc_id) LEFT JOIN cont USING (doc_id))
         |SELECT CAST(count(*) AS BIGINT) AS n_corpus_docs,
         |       CAST(count(*) FILTER (WHERE cont > 0) AS BIGINT) AS contaminated_docs,
         |       CAST(count(*) FILTER (WHERE frac >= 0.5) AS BIGINT) AS heavy_docs,
         |       CAST(round(avg(frac), 6) AS DOUBLE) AS avg_contamination,
         |       CAST(sum(cont) AS BIGINT) AS contaminated_sum
         |FROM j""".stripMargin,

    "doc_bench_exposure" ->
      s"""WITH g5 AS (
         |  SELECT doc_id, ${h64("array_to_string(l[i:i+4], ' ')")} AS h
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t,
         |       LATERAL unnest(generate_series(1, greatest(len(l) - 4, 0))) g(i)),
         |gd AS (SELECT DISTINCT doc_id, h FROM g5),
         |corp AS (SELECT DISTINCT h FROM gd WHERE doc_id % 20 <> 0),
         |bn AS (SELECT doc_id, h FROM gd WHERE doc_id % 20 = 0),
         |tot AS (SELECT doc_id, count(*) AS total FROM bn GROUP BY 1),
         |exp_ AS (SELECT b.doc_id, count(*) AS expn
         |         FROM bn b JOIN corp c USING (h) GROUP BY 1)
         |SELECT d.doc_id,
         |       CAST(coalesce(tot.total, 0) AS BIGINT) AS total_ngrams,
         |       CAST(coalesce(exp_.expn, 0) AS BIGINT) AS exposed_ngrams,
         |       CAST(round(CASE WHEN coalesce(tot.total, 0) > 0
         |            THEN CAST(coalesce(exp_.expn, 0) AS DOUBLE) / tot.total
         |            ELSE 0.0 END, 6) AS DOUBLE) AS exposure_frac
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 = 0) d
         |LEFT JOIN tot USING (doc_id) LEFT JOIN exp_ USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // bitset membership == "all k probe positions were set by some
    // benchmark gram": the bloom semantics replay as a position-subset
    // test, so the oracle reproduces the engine's false positives exactly
    "doc_contamination_bloom" ->
      s"""WITH g5 AS (
         |  SELECT doc_id, array_to_string(l[i:i+4], ' ') AS gram
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t,
         |       LATERAL unnest(generate_series(1, greatest(len(l) - 4, 0))) g(i)),
         |gd AS (SELECT DISTINCT doc_id, gram FROM g5),
         |bpos AS (
         |  SELECT DISTINCT ${h64("gram || sfx")} % 1048576 AS p
         |  FROM gd, LATERAL unnest(['#0', '#1', '#2']) s(sfx)
         |  WHERE doc_id % 20 = 0),
         |fl AS (
         |  SELECT doc_id,
         |         ${h64("gram || '#0'")} % 1048576 IN (SELECT p FROM bpos)
         |     AND ${h64("gram || '#1'")} % 1048576 IN (SELECT p FROM bpos)
         |     AND ${h64("gram || '#2'")} % 1048576 IN (SELECT p FROM bpos) AS f
         |  FROM gd WHERE doc_id % 20 <> 0),
         |tot AS (SELECT doc_id, count(*) AS total,
         |               count(*) FILTER (WHERE f) AS flag
         |        FROM fl GROUP BY 1),
         |j AS (
         |  SELECT d.doc_id, coalesce(tot.total, 0) AS total,
         |         coalesce(tot.flag, 0) AS flag,
         |         CASE WHEN coalesce(tot.total, 0) > 0
         |              THEN CAST(coalesce(tot.flag, 0) AS DOUBLE) / tot.total
         |              ELSE 0.0 END AS frac
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
         |  LEFT JOIN tot USING (doc_id))
         |SELECT CAST(count(*) AS BIGINT) AS n_corpus_docs,
         |       CAST(count(*) FILTER (WHERE flag > 0) AS BIGINT) AS flagged_docs,
         |       CAST(round(avg(frac), 6) AS DOUBLE) AS avg_flagged,
         |       CAST(sum(flag) AS BIGINT) AS flagged_sum
         |FROM j""".stripMargin,

    "doc_pack" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |p AS (SELECT doc_id, n,
        |        sum(n) OVER (ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_token
        |      FROM t),
        |q AS (SELECT doc_id, n, end_token,
        |        end_token - n AS start_token,
        |        (end_token - n) // 512 AS first_chunk,
        |        CASE WHEN n > 0 THEN (end_token - 1) // 512
        |             ELSE (end_token - n) // 512 END AS last_chunk
        |      FROM p)
        |SELECT CAST(max(end_token) AS BIGINT) AS total_tokens,
        |       CAST(count(*) FILTER (WHERE last_chunk > first_chunk) AS BIGINT) AS spanning_docs,
        |       CAST(max(last_chunk) AS BIGINT) AS max_chunk,
        |       CAST(sum(first_chunk * 31 + last_chunk) AS BIGINT) AS chunk_checksum,
        |       CAST(sum(start_token) AS BIGINT) AS offset_checksum
        |FROM q""".stripMargin,

    "doc_stratified_sample" -> {
      val rateCase = StratRates.toSeq.sortBy(_._1).map { case (s, r) =>
        s"WHEN source = '$s' THEN ${(r * 1000000L).toLong}"
      }.mkString(" ")
      s"""WITH kept AS (
         |  SELECT source, doc_id FROM documents
         |  WHERE ((${h64("'strat:' || source || ':' || doc_id")} & 2147483647) % 1000000)
         |        < (CASE $rateCase ELSE ${(StratDefault * 1000000L).toLong} END)),
         |k AS (SELECT source, count(*) AS k, sum(doc_id) AS kc FROM kept GROUP BY 1)
         |SELECT d.source,
         |       CAST(count(*) AS BIGINT) AS total,
         |       CAST(coalesce(any_value(k.k), 0) AS BIGINT) AS kept,
         |       CAST(coalesce(any_value(k.kc), 0) AS BIGINT) AS kept_checksum
         |FROM documents d LEFT JOIN k ON k.source = d.source
         |GROUP BY d.source
         |ORDER BY d.source""".stripMargin
    },

    "doc_temperature_sample" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n_s FROM documents GROUP BY 1),
         |z AS (SELECT sum(sqrt(n_s)) AS z FROM c),
         |r AS (
         |  SELECT lang, least(1.0, 100 * sqrt(n_s) / (SELECT z FROM z) / n_s) AS keep_rate
         |  FROM c),
         |kept AS (
         |  SELECT d.lang, d.doc_id, r.keep_rate
         |  FROM documents d JOIN r USING (lang)
         |  WHERE ((${h64("'temp:' || lang || ':' || doc_id")} & 2147483647) % 1000000)
         |        < CAST(floor(r.keep_rate * 1000000) AS BIGINT)),
         |k AS (SELECT lang, count(*) AS k, sum(doc_id) AS kc, max(keep_rate) AS rate
         |      FROM kept GROUP BY 1)
         |SELECT d.lang,
         |       CAST(count(*) AS BIGINT) AS total,
         |       CAST(coalesce(any_value(k.k), 0) AS BIGINT) AS kept,
         |       CAST(coalesce(any_value(k.kc), 0) AS BIGINT) AS kept_checksum,
         |       CAST(round(coalesce(any_value(k.rate), 0.0), 6) AS DOUBLE) AS keep_rate
         |FROM documents d LEFT JOIN k ON k.lang = d.lang
         |GROUP BY d.lang
         |ORDER BY d.lang""".stripMargin,

    "doc_profile" -> profileSql,

    "doc_weighted_sample" ->
      s"""WITH w AS (
         |  SELECT doc_id, lang, n_chars,
         |         ln((((${h64("'wsamp:' || lang || ':' || doc_id")} & 2147483647)
         |              % 1000000) + 0.5) / 1000000.0) / n_chars AS samp_key
         |  FROM documents WHERE n_chars > 0),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY lang ORDER BY samp_key DESC, doc_id ASC) AS rk
         |  FROM w)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
         |       CAST(sum(n_chars) AS BIGINT) AS char_sum
         |FROM r WHERE rk <= 20 GROUP BY 1 ORDER BY 1""".stripMargin,

    "doc_winsorize" ->
      """WITH q AS (
        |  SELECT lang, quantile_cont(n_chars, 0.1) AS qlo,
        |         quantile_cont(n_chars, 0.9) AS qhi
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT d.lang, d.n_chars,
        |         least(greatest(CAST(d.n_chars AS DOUBLE), q.qlo), q.qhi) AS clipped
        |  FROM documents d JOIN q USING (lang))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (WHERE clipped <> n_chars) AS BIGINT) AS n_clipped,
        |       CAST(sum(CAST(round(clipped * 1000000, 0) AS BIGINT)) AS BIGINT)
        |         AS clip_checksum
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "doc_dedup_incremental" ->
      """WITH seen AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
        |batch AS (
        |  SELECT doc_id, text, md5(text) AS h FROM documents WHERE doc_id >= 250),
        |novel AS (
        |  SELECT b.* FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.h = b.h)),
        |firsts AS (SELECT h, min(doc_id) AS k FROM novel GROUP BY 1),
        |kept AS (
        |  SELECT n.* FROM novel n JOIN firsts f ON f.h = n.h AND n.doc_id = f.k)
        |SELECT CAST(count(*) AS BIGINT) AS n_new,
        |       CAST(count(DISTINCT h) AS BIGINT) AS n_hashes,
        |       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS byte_checksum
        |FROM kept""".stripMargin)
}
