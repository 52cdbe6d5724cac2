package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BpeTrain

class BpeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def rules(docs: Seq[String], rounds: Int): Seq[(Int, String, String, Long, String)] =
    BpeTrain.learnMerges(docs.zipWithIndex.map(_.swap).toDF("doc_id", "text"),
        "text", rounds)
      .orderBy("round")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSeq

  test("hand-traced Sennrich example: low/lower/lowest learns lo, low, lowe") {
    // vocab: low x2, lower x1, lowest x1
    // round 1 pair scores: (l,o)=4, (o,w)=4, (w,e)=2, (e,r)=1, (e,s)=1,
    // (s,t)=1 -> tie (l,o) vs (o,w) broken lexicographically -> (l,o)
    // round 2: (lo,w)=4 wins; round 3: (low,e)=2 wins
    val r = rules(Seq("low lower", "lowest low"), 3)
    assert(r == Seq(
      (1, "l", "o", 4L, "lo"),
      (2, "lo", "w", 4L, "low"),
      (3, "low", "e", 2L, "lowe")))
  }

  test("same-symbol runs merge greedily left-to-right (overlap counted, non-overlap applied)") {
    // "aaaa": round-1 pairs (a,a) = 3 (overlapping count, the reference
    // trainer convention); the merge applies at run matches 1 and 3 only,
    // leaving symbols [aa, aa] -> round 2 must see exactly one (aa,aa)
    val r4 = rules(Seq("aaaa"), 2)
    assert(r4 == Seq(
      (1, "a", "a", 3L, "aa"),
      (2, "aa", "aa", 1L, "aaaa")))
    // "aaa" (odd run): merge at match 1 only -> [aa, a] -> round 2 (aa,a)
    val r3 = rules(Seq("aaa"), 2)
    assert(r3 == Seq(
      (1, "a", "a", 2L, "aa"),
      (2, "aa", "a", 1L, "aaa")))
  }

  test("frequency weighting: a frequent short word beats a long rare one") {
    // "xy" appears 5 times -> (x,y)=5; "qrst" once contributes (q,r)=(r,s)
    // =(s,t)=1 each
    val r = rules(Seq("xy xy xy", "xy xy qrst"), 1)
    assert(r == Seq((1, "x", "y", 5L, "xy")))
  }

  test("corpus with no adjacent pairs learns nothing") {
    val r = rules(Seq("a b c", "d e"), 2) // every word is one symbol
    assert(r.isEmpty)
  }
}
