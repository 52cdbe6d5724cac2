package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

class CurationSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("piiSignals counts and redacts emails, IPv4s, phones") {
    val docs = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or x@y.io thanks"),
      (2L, "server 192.168.0.12 and 10.0.0.1 up"),
      (3L, "call 555-867-5309 or 555.123.4567"),
      (4L, "no pii here at all"),
      (5L, "mix u@v.com 1.2.3.4 999-111-2222 end")).toDF("doc_id", "text")
    val r = Curation.piiSignals(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getInt(1), x.getInt(2), x.getInt(3), x.getString(4))).toMap
    assert(r(1L)._1 == 2 && r(1L)._2 == 0 && r(1L)._3 == 0)
    assert(r(1L)._4 == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(r(2L)._2 == 2 && r(2L)._4 == "server <IP> and <IP> up")
    assert(r(3L)._3 == 2 && r(3L)._4 == "call <PHONE> or <PHONE>")
    assert(r(4L) == (0, 0, 0, "no pii here at all"))
    assert(r(5L) == (1, 1, 1, "mix <EMAIL> <IP> <PHONE> end"))
  }

  test("piiSignals: counts reconcile with placeholders when categories overlap") {
    // the email pattern consumes the phone-shaped local part, so the phone
    // count (taken on the email-redacted string) must be 0, matching the
    // absence of a <PHONE> placeholder in the output
    val docs = Seq((1L, "reach 555-867-5309@corp.com now")).toDF("doc_id", "text")
    val r = Curation.piiSignals(docs, "doc_id", "text").head()
    assert(r.getInt(1) == 1 && r.getInt(2) == 0 && r.getInt(3) == 0)
    assert(r.getString(4) == "reach <EMAIL> now")
  }

  test("repetitionSignals: hand-computed n-gram stats and gate") {
    val docs = Seq(
      (1L, "a b a b"), // 2-grams: "a b","b a","a b" -> total 3, dist 2, top 2
      (2L, "x"), // no 2-grams
      (3L, (1 to 60).map(i => s"tok$i").mkString(" ")) // 60 distinct tokens
    ).toDF("doc_id", "text")
    val r = Curation.repetitionSignals(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    val d1 = r(1L)
    assert(d1.getAs[Long]("total_ngrams") == 3 &&
      d1.getAs[Long]("distinct_ngrams") == 2 &&
      d1.getAs[Long]("top_ngram_count") == 2)
    assert(math.abs(d1.getAs[Double]("frac_dup_ngrams") - 1.0 / 3) < 1e-12)
    assert(math.abs(d1.getAs[Double]("top_ngram_frac") - 2.0 / 3) < 1e-12)
    assert(!d1.getAs[Boolean]("gopher_pass")) // 4 tokens < minTokens
    val d2 = r(2L)
    assert(d2.getAs[Long]("total_ngrams") == 0 &&
      d2.getAs[Double]("frac_dup_ngrams") == 0.0 &&
      !d2.getAs[Boolean]("gopher_pass"))
    val d3 = r(3L)
    assert(d3.getAs[Long]("n_tokens") == 60 &&
      d3.getAs[Double]("frac_dup_ngrams") == 0.0 &&
      d3.getAs[Double]("frac_alpha_words") == 1.0 &&
      d3.getAs[Boolean]("gopher_pass")) // mean len ~4.4, all-distinct grams
  }

  test("ngramContamination: identical doc fully contaminated, disjoint doc zero") {
    val corpus = Seq(
      (1L, "one two three four five six"), // == bench doc
      (2L, "alpha beta gamma delta epsilon zeta"), // disjoint
      (3L, "zero one two three four five six seven"), // partial overlap
      (4L, "tiny")).toDF("doc_id", "text") // < n tokens
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val r = Curation.ngramContamination(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("total_ngrams"), x.getAs[Long]("contaminated_ngrams"),
          x.getAs[Double]("contamination_frac"))).toMap
    assert(r(1L) == ((2L, 2L, 1.0)))
    assert(r(2L) == ((2L, 0L, 0.0)))
    // doc 3 grams: "zero one two three four","one two three four five",
    // "two three four five six","three four five six seven" -> 2 of 4 in bench
    assert(r(3L) == ((4L, 2L, 0.5)))
    assert(r(4L) == ((0L, 0L, 0.0)))
  }

  test("bloomContamination: flags are a superset of exact hits; FPR bounded on a disjoint corpus") {
    // true-positive side: contaminated grams MUST be flagged (a bloom has
    // no false negatives), checked per doc against the exact semi-join
    val corpus = Seq(
      (1L, "one two three four five six"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "zero one two three four five six seven"),
      (4L, "tiny")).toDF("doc_id", "text")
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val exact = Curation.ngramContamination(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) -> x.getAs[Long]("contaminated_ngrams")).toMap
    val bloom = Curation.bloomContamination(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("total_ngrams"), x.getAs[Long]("flagged_ngrams"))).toMap
    exact.foreach { case (id, c) =>
      assert(bloom(id)._2 >= c, s"doc $id: bloom dropped a true hit")
    }
    assert(bloom(1L) == ((2L, 2L))) // identical doc fully flagged
    assert(bloom(4L) == ((0L, 0L)))

    // false-positive side: a large corpus fully DISJOINT from the
    // benchmark must flag ~nothing (expected FPR ~1e-10 at 2^20 bits /
    // 15 bench grams; assert a generous 1% at n=2 over ~3k grams)
    val big = (0 until 600).map(i =>
      (i.toLong, (0 until 6).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val fp = Curation.bloomContamination(big, bench, "doc_id", "text", n = 2)
      .agg(sum("flagged_ngrams"), sum("total_ngrams")).head()
    assert(fp.getLong(0) <= fp.getLong(1) / 100,
      s"FPR too high: ${fp.getLong(0)}/${fp.getLong(1)}")
  }

  test("groupQuantiles: exact linear interpolation per group; approx returns data values") {
    val d = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L), ("b", 10L))
      .toDF("grp", "v")
    val exact = Curation.groupQuantiles(d, "v", "grp", Seq(0.1, 0.5), exact = true)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // type-7 interpolation at rank p*(n-1): 0.1*(5-1)=0.4 -> 1 + 0.4*(2-1)
    assert(exact(("a", 0.1)) == 1.4)
    assert(exact(("a", 0.5)) == 3.0)
    assert(exact(("b", 0.1)) == 10.0 && exact(("b", 0.5)) == 10.0)
    // the production sketch returns actual order statistics of the group
    val approx = Curation.groupQuantiles(d, "v", "grp", Seq(0.1, 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(Set(1.0, 2.0).contains(approx(("a", 0.1))))
    assert(approx(("a", 0.5)) == 3.0)
    assert(approx(("b", 0.5)) == 10.0)
  }

  test("packChunks: hand-computed placement, zero-token docs, strata independence") {
    val docs = Seq(
      (1L, 5L, "a"), (2L, 3L, "a"), (3L, 0L, "a"), (4L, 4L, "a"),
      (10L, 7L, "b")).toDF("doc_id", "n_tokens", "src")
    val p = Curation.packChunks(docs, "doc_id", "n_tokens", "doc_id", 6L, "src")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_token"), r.getAs[Long]("end_token"),
          r.getAs[Long]("first_chunk"), r.getAs[Long]("last_chunk"),
          r.getAs[Boolean]("spans_boundary"))).toMap
    assert(p(1L) == ((0L, 5L, 0L, 0L, false)))
    assert(p(2L) == ((5L, 8L, 0L, 1L, true))) // crosses the 6-token cut
    assert(p(3L) == ((8L, 8L, 1L, 1L, false))) // zero tokens: stays at offset
    assert(p(4L) == ((8L, 12L, 1L, 1L, false)))
    assert(p(10L) == ((0L, 7L, 0L, 1L, true))) // stratum b packs independently
  }

  test("packChunksGlobal == single-stratum packChunks across partitions") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, rnd.nextInt(40).toLong, "all"))
      .toDF("doc_id", "n_tokens", "src")
    val expected = Curation.packChunks(docs, "doc_id", "n_tokens", "doc_id", 64L, "src")
      .select("doc_id", "start_token", "end_token", "first_chunk", "last_chunk", "spans_boundary")
      .collect().map(r => r.toSeq).toSet
    val got = Curation.packChunksGlobal(docs, "doc_id", "n_tokens", "doc_id", 64L,
      numPartitions = 7)
      .select(col("id").as("doc_id"), col("start_token"), col("end_token"),
        col("first_chunk"), col("last_chunk"), col("spans_boundary"))
      .collect().map(r => r.toSeq).toSet
    assert(got == expected)
  }

  test("stratifiedSample: deterministic, monotone in rate, respects strata rates") {
    val docs = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "stratum")
    val rates = Map("s0" -> 0.9, "s1" -> 0.1)
    val kept = Curation.stratifiedSample(docs, "doc_id", "stratum", rates, 0.5)
    val again = Curation.stratifiedSample(docs, "doc_id", "stratum", rates, 0.5)
    val k1 = kept.collect().map(_.getLong(0)).toSet
    assert(k1 == again.collect().map(_.getLong(0)).toSet) // deterministic
    val bySt = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySt("s0") / 1000.0 - 0.9) < 0.06)
    assert(math.abs(bySt.getOrElse("s1", 0L) / 1000.0 - 0.1) < 0.06)
    assert(math.abs(bySt("s2") / 1000.0 - 0.5) < 0.06) // default rate
    // monotone: raising every rate keeps a superset (nested samples)
    val wider = Curation.stratifiedSample(
      docs, "doc_id", "stratum", rates.map { case (k, v) => k -> math.min(1.0, v + 0.05) }, 0.55)
      .collect().map(_.getLong(0)).toSet
    assert(k1.subsetOf(wider))
  }

  test("weightedSample: deterministic A-ES top-k, salt-phase invariant, weight pull") {
    val docs = (0L until 1000L).map(i =>
      (i, "s", if (i < 100) 10.0 else 0.1)).toDF("doc_id", "stratum", "w")
    val a = Curation.weightedSample(docs, "doc_id", "stratum", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    val b = Curation.weightedSample(docs, "doc_id", "stratum", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 100) // deterministic, exact size
    // two-phase pruning is lossless: 1 bucket == 64 buckets
    val single = Curation.weightedSample(docs, "doc_id", "stratum", "w",
      k = 100, saltBuckets = 1).collect().map(_.getLong(0)).toSet
    assert(a == single)
    // 100 heavy rows at 100x weight: nearly all must be sampled
    assert(a.count(_ < 100L) > 80, s"heavy rows in sample: ${a.count(_ < 100L)}")
    // non-positive weights never sampled
    val withZero = docs.withColumn("w",
      when(col("doc_id") === 0L, 0.0).otherwise(col("w")))
    assert(!Curation.weightedSample(withZero, "doc_id", "stratum", "w", k = 100)
      .collect().map(_.getLong(0)).contains(0L))
  }

  test("winsorize: type-7 quantile clip per group, other groups untouched") {
    // A = 1..10: p10 = 1.9, p90 = 9.1 (type-7 interpolation); B constant
    val d = ((1 to 10).map(i => (i.toLong, "A")) ++ Seq((100L, "B"), (100L, "B")))
      .toDF("v", "g")
    val got = Curation.winsorize(d, "v", "g", 0.1, 0.9, exact = true)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
        ((r.getAs[Double]("clipped"), r.getAs[Boolean]("was_clipped")))).toMap
    assert(got(("A", 1L)) == ((1.9, true)))
    assert(got(("A", 10L)) == ((9.1, true)))
    assert(got(("A", 5L)) == ((5.0, false)))
    assert(got(("B", 100L)) == ((100.0, false)))
  }

  test("winsorize: NULL value / NULL group rows survive with NULL clip, never fabricated") {
    // ADVICE r3: least/greatest skip NULLs, so a NULL value used to come
    // back "clipped" to the group's lo quantile, and NULL-group rows were
    // dropped by the inner join entirely
    val d = Seq((Some(1L), Some("A")), (Some(10L), Some("A")),
      (Option.empty[Long], Some("A")), (Some(7L), Option.empty[String]))
      .toDF("v", "g")
    val rows = Curation.winsorize(d, "v", "g", 0.1, 0.9, exact = true).collect()
    assert(rows.length == 4) // every input row survives the left join
    val nullVal = rows.find(r => r.isNullAt(r.fieldIndex("v"))).get
    assert(nullVal.isNullAt(nullVal.fieldIndex("clipped")))
    assert(nullVal.isNullAt(nullVal.fieldIndex("was_clipped")))
    val nullGrp = rows.find(r => r.isNullAt(r.fieldIndex("g"))).get
    assert(nullGrp.isNullAt(nullGrp.fieldIndex("clipped")))
    assert(nullGrp.isNullAt(nullGrp.fieldIndex("was_clipped")))
    // non-null rows in a real group still clip exactly as before
    val ones = rows.find(r => !r.isNullAt(r.fieldIndex("v")) &&
      r.getAs[Long]("v") == 1L).get
    assert(ones.getAs[Boolean]("was_clipped"))
  }

  test("temperatureSample: alpha=0.5 rates, small-source upsampling, cap at 1") {
    // A: 100 rows, B: 4 rows; sqrt weights 10 and 2, target 12
    // -> r_A = 12*(10/12)/100 = 0.1, r_B = 12*(2/12)/4 = 0.5
    val docs = ((0L until 100L).map(i => (i, "A")) ++
      (100L until 104L).map(i => (i, "B"))).toDF("doc_id", "stratum")
    val kept = Curation.temperatureSample(docs, "doc_id", "stratum",
      alpha = 0.5, targetCount = 12L)
    val rates = kept.select("stratum", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("A") - 0.1) < 1e-12)
    assert(math.abs(rates("B") - 0.5) < 1e-12)
    assert(rates("B") > rates("A")) // temperature flattens: small source upsampled
    // deterministic + monotone in targetCount (nested samples)
    val k1 = kept.collect().map(_.getAs[Long]("doc_id")).toSet
    val again = Curation.temperatureSample(docs, "doc_id", "stratum", 0.5, 12L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(k1 == again)
    val wider = Curation.temperatureSample(docs, "doc_id", "stratum", 0.5, 50L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(k1.subsetOf(wider))
    // huge target: every rate capped at 1.0, everything kept
    val all = Curation.temperatureSample(docs, "doc_id", "stratum", 0.5, 100000L)
    assert(all.count() == 104L)
    assert(all.select("keep_rate").distinct().collect().map(_.getDouble(0)).toSet == Set(1.0))
  }

  test("paragraphDedup: corpus-wide first occurrence wins, empties kept, order preserved") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha"), // alpha repeats WITHIN the doc
      (2L, "beta\ngamma"),        // beta's first occurrence is doc 1
      (3L, "\ngamma\ndelta"))     // leading empty paragraph is structural
      .toDF("doc_id", "text")
    val out = Curation.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "alpha\nbeta")))   // second alpha dropped
    assert(out(2L) == ((1L, 1L, "gamma")))          // beta dropped (doc 1 first)
    assert(out(3L) == ((2L, 1L, "\ndelta")))        // empty kept, gamma dropped
    // unlike removeBoilerplate, exactly ONE copy of each paragraph survives
    val survivors = out.values.flatMap(_._3.split("\n")).filter(_.nonEmpty).toSeq
    assert(survivors.sorted == Seq("alpha", "beta", "delta", "gamma"))
  }
}
