package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: PII detection +
  * redaction, Gopher-style repetition/quality signals, benchmark
  * contamination (n-gram overlap), and deterministic stratified sampling.
  *
  * Scale shapes: PII and stratified sampling are map-only (pure column
  * expressions, no shuffle); repetition signals shuffle only on
  * (doc, n-gram) with map-side partial aggregation; contamination joins the
  * corpus n-gram table against a BROADCAST benchmark n-gram set — the
  * benchmark (an eval suite) is tiny next to a 100-TB corpus by
  * construction, and the one-sided broadcast keeps the corpus un-shuffled.
  */
object Curation {

  /** PII patterns, portable between Java regex and RE2 (DuckDB): no
    * lookaround, no backreferences — only character classes, bounded
    * repetition, and ASCII `\b`, which the two engines treat identically.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern: String = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Per-document PII signals: match counts per category plus the redacted
    * text (emails -> `<EMAIL>`, then IPv4 -> `<IP>`, then phones ->
    * `<PHONE>` — the order is part of the contract since redaction rewrites
    * the string the next pattern scans). Map-only.
    */
  def piiSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(pat: String) = size(regexp_extract_all(t, lit(pat), lit(0)))
    docs.select(
      col(idCol),
      n(EmailPattern).as("n_emails"),
      n(Ipv4Pattern).as("n_ips"),
      n(PhonePattern).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>").as("redacted"))
  }

  /** Gopher-style per-document repetition/quality signals over token
    * `n`-grams (default 2):
    *
    *   - `n_tokens`, `mean_word_len`, `frac_alpha_words` (fraction of
    *     tokens containing an ASCII letter) — map-only array expressions;
    *   - `total_ngrams`, `distinct_ngrams`, `top_ngram_count`,
    *     `frac_dup_ngrams` (= 1 - distinct/total) and `top_ngram_frac` —
    *     via an (doc, gram) count, i.e. one shuffle keyed by (doc, gram)
    *     with map-side combine; no per-doc quadratic array scan, so a
    *     10^6-token document costs O(len) rows, not O(len^2) comparisons;
    *   - `gopher_pass` — the conjunctive quality gate over the thresholds.
    *
    * Documents with fewer than `n` tokens have zero n-grams; their
    * repetition fractions are 0 and they fail the gate via `minTokens`.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 2,
                        minTokens: Long = 50, maxTokens: Long = 100000,
                        minWordLen: Double = 3.0, maxWordLen: Double = 10.0,
                        minAlphaFrac: Double = 0.8,
                        maxDupFrac: Double = 0.2): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("char_sum"),
        size(filter(col("toks"), t => t.rlike("[A-Za-z]"))).cast("long").as("n_alpha"))
      .select(col(idCol), col("n_tokens"),
        try_divide(col("char_sum").cast("double"), col("n_tokens")).as("mean_word_len"),
        try_divide(col("n_alpha").cast("double"), col("n_tokens")).as("frac_alpha_words"))
    val gramStats = TextOps.shingles(docs, idCol, textCol, n)
      .groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum("c").as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        max("c").as("top_ngram_count"))
    base.join(gramStats, Seq(idCol), "left")
      .withColumn("total_ngrams", coalesce(col("total_ngrams"), lit(0L)))
      .withColumn("distinct_ngrams", coalesce(col("distinct_ngrams"), lit(0L)))
      .withColumn("top_ngram_count", coalesce(col("top_ngram_count"), lit(0L)))
      .withColumn("frac_dup_ngrams", coalesce(
        lit(1.0) - try_divide(col("distinct_ngrams").cast("double"), col("total_ngrams")),
        lit(0.0)))
      .withColumn("top_ngram_frac", coalesce(
        try_divide(col("top_ngram_count").cast("double"), col("total_ngrams")),
        lit(0.0)))
      .withColumn("gopher_pass",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("mean_word_len") >= minWordLen && col("mean_word_len") <= maxWordLen &&
          col("frac_alpha_words") >= minAlphaFrac &&
          col("frac_dup_ngrams") <= maxDupFrac)
  }

  /** Benchmark-contamination check: for each corpus document, the number
    * and fraction of its DISTINCT token `n`-grams that also occur anywhere
    * in `benchmark` (the classic eval-leakage test, run at ingestion time).
    *
    * Returns one row per corpus document: (id, total_ngrams,
    * contaminated_ngrams, contamination_frac); documents shorter than `n`
    * tokens report (0, 0, 0.0).
    *
    * Shape: the corpus side is reduced to distinct (doc, gram-hash) rows —
    * one shuffle — and probed against the benchmark's distinct gram-hash
    * set with a BROADCAST left-semi join (`broadcastBench = true`, the
    * default: benchmarks are ~10^6 grams vs a 10^12-gram corpus, so the
    * corpus never reshuffles on gram). Set `broadcastBench = false` to fall
    * back to a shuffled semi-join when the "benchmark" is itself huge.
    */
  def ngramContamination(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, n: Int = 5,
                         broadcastBench: Boolean = true): DataFrame = {
    val cg = TextOps.shingles(corpus, idCol, textCol, n)
      .select(col(idCol), TextOps.portableHash64(col("shingle")).as("h"))
      .distinct()
    val bg0 = TextOps.shingles(benchmark, idCol, textCol, n)
      .select(TextOps.portableHash64(col("shingle")).as("h")).distinct()
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    val tot = cg.groupBy(col(idCol)).agg(count(lit(1)).as("total_ngrams"))
    val cont = cg.join(bg, Seq("h"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("contaminated_ngrams"))
    corpus.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(cont, Seq(idCol), "left")
      .withColumn("total_ngrams", coalesce(col("total_ngrams"), lit(0L)))
      .withColumn("contaminated_ngrams", coalesce(col("contaminated_ngrams"), lit(0L)))
      .withColumn("contamination_frac", coalesce(
        try_divide(col("contaminated_ngrams").cast("double"), col("total_ngrams")),
        lit(0.0)))
  }

  /** Deterministic per-stratum sampling (domain mixing): keep a row iff
    * portableHash31(salt:stratum:id) mod 10^6 < rate(stratum) * 10^6, with
    * `rates` overriding `defaultRate` per stratum value. Map-only — the
    * draw is a pure column expression, so the sample is reproducible
    * across runs, engines (the DuckDB twin replays the md5 draw), and
    * cluster sizes, and composable (raising a rate strictly grows the
    * kept set — nested samples, same property the edge-sample sweep uses).
    */
  def stratifiedSample(docs: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "strat"): DataFrame = {
    require(defaultRate >= 0.0 && defaultRate <= 1.0, "defaultRate in [0,1]")
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates in [0,1]")
    // try_element_at: ANSI-mode element_at THROWS on a missing map key
    val rate: Column =
      if (rates.isEmpty) lit(defaultRate)
      else coalesce(try_element_at(typedlit(rates), col(strataCol)), lit(defaultRate))
    val draw = TextOps.portableHash31(
      concat(lit(salt), lit(":"), col(strataCol), lit(":"), col(idCol).cast("string"))) % 1000000L
    docs.where(draw < (rate * 1000000L).cast("long"))
  }
}
