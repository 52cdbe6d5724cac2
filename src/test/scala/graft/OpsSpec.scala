package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, Skew, TextOps}

class OpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny")).toDF("doc_id", "text")

  test("shingles: size-k+1 per doc, empty for short docs") {
    val sh = TextOps.shingles(docs, "doc_id", "text", 3)
    val counts = sh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 7) // 9 tokens -> 7 shingles
    assert(!counts.contains(5L)) // 1 token -> none
    assert(sh.where($"doc_id" === 1).orderBy("pos").limit(1).head().getString(2)
      == "the quick brown")
  }

  test("exact dedup groups") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dupGroup = g.filter(_.getLong(2) > 1)
    assert(dupGroup.length == 1 && dupGroup.head.getLong(1) == 1L
      && dupGroup.head.getLong(2) == 2L) // keeps min id 1, size 2
  }

  test("ngram jaccard finds the near-dup pair and the exact pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup -> jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near-dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH candidates include exact dup, exclude unrelated") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3)
    val cands = Dedup.minhashLshCandidates(sigs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 4L)))
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs identical hash; near-dups close") {
    val sh = TextOps.simhash16(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 6)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // hamming 0
  }

  test("winnowing fingerprints: exact dups share all fingerprints") {
    val fp = TextOps.fingerprints(docs, "doc_id", "text", 3, 4)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(byDoc(1L) == byDoc(4L))
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
  }

  test("brute-force knn: exact dup embedding ranks first with sim 1") {
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceTopK(embs, "vec_id", "embedding", $"vec_id" === 0, 3)
      .orderBy("rank").collect()
    assert(knn(0).getLong(2) == 1L && knn(0).getDouble(3) == 1.0)
    assert(knn(1).getLong(2) == 3L)
    assert(knn(2).getLong(2) == 2L && knn(2).getDouble(3) == 0.0)
  }

  test("lsh bucket ANN returns same top neighbor as brute force for dup") {
    val embs = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(-1.0f))).toDF("vec_id", "embedding")
    val r = Similarity.lshTopK(embs, "vec_id", "embedding", $"vec_id" === 0, 4, 1).collect()
    assert(r.length == 1 && r.head.getLong(2) == 1L)
  }

  test("salted count == plain count; salted distinct == plain distinct") {
    val df = Seq.tabulate(1000)(i => ("k" + (i % 3), i % 50)).toDF("k", "v")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, col("k"), 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
    val plainD = df.groupBy("k").agg(count_distinct(col("v"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedD = Skew.saltedCountDistinct(df, col("k"), col("v"), 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plainD == saltedD)
  }

  test("language id: marker scoring with deterministic tie-break") {
    val d = Seq((1L, "the cat sat"), (2L, "der hund"), (3L, "xyz qqq"))
      .toDF("doc_id", "text")
    val out = TextOps.languageId(d, "doc_id", "text",
      Map("en" -> Seq("the"), "de" -> Seq("der"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }
}
