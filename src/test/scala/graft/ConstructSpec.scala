package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Coref
import graft.graph.{Fusion, LinkPredict}
import graft.ops.Dsir

class ConstructSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- Coref

  test("coref: pronoun resolves to most recent PRIOR mention, per conversation") {
    val turns = Seq(
      (1, 1, "Tell me about Ada Lovelace."),
      (1, 2, "What did they do"),
      (1, 3, "ok"),
      (1, 4, "Now about Alan Turing."),
      (1, 5, "did she meet anyone"),
      (2, 1, "what did he build"),
      (2, 2, "Grace Hopper wrote it. She championed it."))
      .toDF("conv", "idx", "text")
    val r = Coref.resolve(turns, "conv", "idx", "text")
      .select("conv", "idx", "is_pronoun", "antecedent").collect()
      .map(x => (x.getInt(0), x.getInt(1)) ->
        (x.getBoolean(2), Option(x.getString(3)))).toMap
    assert(r((1, 2)) == (true, Some("person:ada_lovelace")))
    assert(r((1, 3)) == (false, None)) // not a pronoun turn
    assert(r((1, 5)) == (true, Some("person:alan_turing"))) // most recent wins
    assert(r((2, 1)) == (true, None)) // no prior mention -> unresolved
    // a same-turn mention is NOT its own antecedent (prior turns only)
    assert(r((2, 2)) == (true, None))
  }

  test("coref: conversations do not leak into each other") {
    val turns = Seq(
      (1, 1, "Grace Hopper joined."),
      (2, 1, "what did they say"))
      .toDF("conv", "idx", "text")
    val r = Coref.resolve(turns, "conv", "idx", "text")
      .where($"conv" === 2).head()
    assert(r.getAs[String]("antecedent") == null)
  }

  // ---------------------------------------------------------- LinkPredict

  // a-w, b-w, a-x, b-x, c-x (undirected closure is built by the op)
  private val lpEdges = Seq(
    ("a", "w"), ("b", "w"), ("a", "x"), ("b", "x"), ("c", "x"))
    .toDF("src", "dst")

  test("link prediction: exact CN / Adamic-Adar / Jaccard on a hand graph") {
    val got = LinkPredict.scores(lpEdges, maxHubDeg = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val ln2 = math.log(2.0); val ln3 = math.log(3.0)
    val (cnAB, aaAB, jAB) = got(("a", "b"))
    assert(cnAB == 2L && math.abs(aaAB - (1 / ln2 + 1 / ln3)) < 1e-12
      && math.abs(jAB - 1.0) < 1e-12) // nbrs(a)=nbrs(b)={w,x}
    val (cnAC, aaAC, jAC) = got(("a", "c"))
    assert(cnAC == 1L && math.abs(aaAC - 1 / ln3) < 1e-12
      && math.abs(jAC - 0.5) < 1e-12)
    val (cnWX, aaWX, jWX) = got(("w", "x"))
    assert(cnWX == 2L && math.abs(aaWX - 2 / ln2) < 1e-12
      && math.abs(jWX - 2.0 / 3) < 1e-12)
    assert(got.size == 4) // (a,b) (a,c) (b,c) (w,x) and nothing else
  }

  test("link prediction: the hub guard removes high-degree centers") {
    // deg(x)=3 > 2, so only w/a/b can be centers: (a,b) drops to cn=1
    val got = LinkPredict.scores(lpEdges, maxHubDeg = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "b")) == 1L)
    assert(!got.contains(("a", "c"))) // their only shared neighbor was the hub
    assert(got(("w", "x")) == 2L) // centers a and b survive
  }

  // --------------------------------------------------------------- Fusion

  test("triple fusion: noisy-or confidence matches the closed form") {
    val t = Seq(
      ("v1", "p1", "v2", "s1", 0.5), ("v1", "p1", "v2", "s1", 0.5),
      ("v1", "p1", "v2", "s2", 0.2),
      ("v3", "p1", "v4", "s1", 0.3))
      .toDF("src", "label", "dst", "source", "w")
    val got = Fusion.tripleFusion(t, "source", "w").collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val (ns, na, conf) = got(("v1", "v2"))
    assert(ns == 2L && na == 3L)
    assert(math.abs(conf - (1 - 0.5 * 0.5 * 0.8)) < 1e-12)
    assert(math.abs(got(("v3", "v4"))._3 - 0.3) < 1e-12)
  }

  test("schema stats: class-level assertion and distinct-pair counts") {
    val e = Seq(
      ("a1", "b1", "p"), ("a2", "b1", "p"), ("a1", "b1", "p"),
      ("a1", "a2", "q"))
      .toDF("src", "dst", "label")
    val got = Fusion.schemaStats(e, v => substring(v, 1, 1)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("a", "p", "b")) == (3L, 2L))
    assert(got(("a", "q", "a")) == (1L, 1L))
  }

  // ----------------------------------------------------------------- Dsir

  test("dsir: importance weights match the smoothed log-likelihood ratio") {
    // tokens x,y land in distinct buckets mod 16 (md5: 3 vs 0)
    val d = Seq(
      (1L, "x x x", "en"), (2L, "y y", "de"), (3L, "x y", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Dsir.importanceWeights(d, "doc_id", "text",
      col("lang") === "en", buckets = 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lrX = math.log(4.0 / 19) - math.log(5.0 / 23) // t=3,r=4,T=3,R=7,B=16
    val lrY = math.log(1.0 / 19) - math.log(4.0 / 23)
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - 3 * lrX) < 1e-12)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - 2 * lrY) < 1e-12)
    assert(math.abs(got(3L)._2 - (lrX + lrY)) < 1e-12)
    // target-heavy doc outranks off-target doc
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  // -------------------------------------------------------- removeBoilerplate

  test("boilerplate removal: high-DF lines drop everywhere, order is preserved") {
    val d = Seq(
      (1L, "footer\nalpha one\nbeta two\nfooter"),
      (2L, "footer\ngamma three"),
      (3L, "delta four\nfooter"))
      .toDF("doc_id", "text")
    val got = graft.ops.Curation.removeBoilerplate(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == (2L, 2L, "alpha one\nbeta two")) // both copies removed
    assert(got(2L) == (1L, 1L, "gamma three"))
    assert(got(3L) == (1L, 1L, "delta four"))
  }

  test("boilerplate removal: below-threshold duplicates survive; all-removed doc yields empty text") {
    val d = Seq(
      (1L, "shared\nunique a"), (2L, "shared\nunique b"), (3L, "shared"))
      .toDF("doc_id", "text")
    // minDocs=4 > DF(shared)=3: nothing removed
    val keep = graft.ops.Curation.removeBoilerplate(d, "doc_id", "text", minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keep.values.forall(_ == 0L))
    // minDocs=3: doc 3 loses its only line -> empty clean text, still present
    val got = graft.ops.Curation.removeBoilerplate(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(got(3L) == (0L, ""))
    assert(got(1L) == (1L, "unique a"))
  }

  // ------------------------------------------------------------ snapshot diff

  test("degreeDelta and edgeChurn: exact closed form on a hand diff") {
    val before = Seq(("a", "p", "b"), ("a", "p", "c"), ("a", "p", "c"))
      .toDF("src", "label", "dst")
    val after = Seq(("a", "p", "c"), ("b", "p", "c"), ("d", "q", "a"))
      .toDF("src", "label", "dst")
    val dd = graft.graph.Fusion.degreeDelta(before, after).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(dd("a") == (3L, 2L, -1L)) // a,p,c dup counts twice before
    assert(dd("b") == (1L, 1L, 0L))
    assert(dd("c") == (2L, 2L, 0L))
    assert(dd("d") == (0L, 1L, 1L)) // appears only after
    val ch = graft.graph.Fusion.edgeChurn(before, after).head()
    assert(ch.getLong(0) == 2L && ch.getLong(1) == 3L) // distinct edges
    assert(ch.getLong(2) == 2L && ch.getLong(3) == 1L) // added b-c,d-a; removed a-b
  }
}
