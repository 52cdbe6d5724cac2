package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.canon.Canonicalizer
import graft.extract.Gazetteer

class CanonSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("canonicalization merges case/punctuation alias variants, keeps entities apart") {
    val surfaces = Gazetteer.entities.flatMap(_.aliases).toDF("surface")
    val mapping = Canonicalizer.canonicalize(surfaces).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    // exact-normalization merges must always hold
    assert(mapping("Ada Lovelace") == mapping("ada lovelace"))
    assert(mapping("Ada Lovelace") == mapping("Ada-Lovelace"))
    assert(mapping("Zurich") == mapping("Zürich"))
    assert(mapping("NEW YORK") == mapping("New York"))
    assert(mapping("web_search") == mapping("web-search"))

    // distinct entities must not merge
    def ent(alias: String): String =
      Gazetteer.aliasToId(graft.extract.TextNorm.normalize(alias))
    val byCanonical = mapping.toSeq.groupBy(_._2).values
    byCanonical.foreach { group =>
      val entities = group.map { case (surface, _) => ent(surface) }.distinct
      assert(entities.size == 1,
        s"cluster mixes entities: ${group.map(_._1).mkString(", ")}")
    }
  }

  test("near-dup minhash edges merge initial-style variants of long names") {
    val surfaces = Seq("Margaret Hamilton", "margaret hamilton", "MARGARET HAMILTON",
      "Margaret  Hamilton", "Tyrell Corp", "Tyrell Corporation").toDF("surface")
    val mapping = Canonicalizer.canonicalize(surfaces, minJ = 0.4).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mapping("Margaret Hamilton") == mapping("MARGARET HAMILTON"))
    assert(mapping("Margaret Hamilton") == mapping("Margaret  Hamilton"))
    assert(mapping("Tyrell Corp") == mapping("Tyrell Corporation"))
    assert(mapping("Margaret Hamilton") != mapping("Tyrell Corp"))
  }

  test("MLlib MinHashLSH variant: no cross-entity merges, exact-norm merges kept") {
    val surfaces = Gazetteer.entities.flatMap(_.aliases).toDF("surface")
    val b = Canonicalizer.canonicalizeML(surfaces).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // precision: a cluster never mixes two entities (LSH is approximate in
    // RECALL — it may split, it must not wrongly merge after verification)
    def ent(alias: String): String =
      Gazetteer.aliasToId(graft.extract.TextNorm.normalize(alias))
    b.toSeq.groupBy(_._2).values.foreach { group =>
      assert(group.map { case (s, _) => ent(s) }.distinct.size == 1,
        s"ML cluster mixes entities: ${group.map(_._1).mkString(", ")}")
    }
    // exact-normalization merges are deterministic and must always hold
    assert(b("Ada Lovelace") == b("ada lovelace"))
    assert(b("Zurich") == b("Zürich"))
    assert(b("NEW YORK") == b("New York"))
  }

  test("exact-norm edges are a star: g-1 edges for a 10^4-surface norm group") {
    import org.apache.spark.sql.functions.col
    // a web-scale hot normalized form (OCR noise / boilerplate): an all-pairs
    // self-join would materialize ~5*10^7 pairs here; the star must emit g-1
    val g = 10000
    val withNorm = (0 until g).map(i => (f"s$i%05d", "same"))
      .toDF("surface", "norm")
    val edges = Canonicalizer.exactNormEdges(withNorm).cache()
    assert(edges.count() == g - 1)
    // all edges radiate from the hub (min surface), so CC canonical = hub
    assert(edges.select("src").distinct().collect().map(_.getString(0)).toSeq == Seq("s00000"))
    // and a group of 1 emits no edge
    val single = Canonicalizer.exactNormEdges(
      Seq(("only", "n1")).toDF("surface", "norm"))
    assert(single.count() == 0)
    edges.unpersist()
    // end-to-end: canonicalize on case variants still merges via the star
    val mapping = Canonicalizer.canonicalize(
      Seq("AAA BBB", "aaa bbb", "Aaa Bbb").toDF("surface")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mapping.values.toSet.size == 1)
  }

  test("signature-identical surfaces with distinct norms: collapse keeps canonicalize O(g)") {
    // surfaces "abab...", k repeats of "ab": every one has the SAME char
    // 3-shingle set {aba, bab} and therefore the same MinHash signature,
    // but DISTINCT normalized forms — exactNormEdges cannot collapse them,
    // so before the r3 representative collapse the banded self-join put
    // g^2/2 candidate pairs (~125k here, 10^10+ at web scale) on one key.
    // All pairs verify at Jaccard 1.0 (identical sets), so the cluster must
    // still merge to ONE canonical form.
    val g = 500
    val surfaces = (2 to g + 1).map(k => "ab" * k).toDF("surface")
    val mapping = Canonicalizer.canonicalize(surfaces).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mapping.size == g)
    assert(mapping.values.toSet.size == 1) // one cluster
    assert(mapping.values.head == "ab" * 2) // canonical = lexicographic min (shortest)
  }

  test("incremental: norm-equal new surfaces inherit the prior anchor; fresh clusters mint their min") {
    val prior = Seq(
      ("beta inc", "beta inc"), ("beta, inc", "beta inc"),
      ("alpha corp", "alpha corp")).toDF("surface", "canonical")
    val nw = Seq("Beta Inc", "gamma llc", "gamma-llc", "beta inc").toDF("surface")
    val out = Canonicalizer.incrementalCanonicalize(prior, nw).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // "beta inc" is already a prior member: anti-joined out, never re-emitted
    assert(out.keySet == Set("Beta Inc", "gamma llc", "gamma-llc"))
    // norm("Beta Inc") == norm of the prior "beta inc" cluster -> the new
    // surface inherits the prior canonical id (stability: the anchor wins
    // even though "Beta Inc" < "beta inc" would win a batch re-cluster)
    assert(out("Beta Inc") == "beta inc")
    // an anchor-free norm group mints its min member, like the batch path
    assert(out("gamma llc") == "gamma llc")
    assert(out("gamma-llc") == "gamma llc")
  }

  test("incremental: a bridging near-dup takes the MIN anchor; prior clusters stay distinct; isolated mints itself") {
    // A and B are near-dups of each other (J = 0.71) but both PRIOR — the
    // incremental pass never generates prior x prior candidates, so their
    // ids stay distinct (stability beats global re-optimality). N is a
    // verified near-dup of BOTH (J = 0.76 / 0.71, band-collides with both
    // under the fixed portable family) -> bridge rule: min anchor.
    val a = "alpha omega shared context block"
    val b = "bravo omega shared context block"
    val prior = Seq((a, a), (b, b)).toDF("surface", "canonical")
    val nw = Seq("delta omega shared context block", "zzz unrelated thing")
      .toDF("surface")
    val out = Canonicalizer.incrementalCanonicalize(prior, nw).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("delta omega shared context block") == a) // min(a, b) = a
    assert(out("zzz unrelated thing") == "zzz unrelated thing") // edge-free
  }

  test("applyTo rewrites triples through the canonical map") {
    val triples = Seq(
      ("c1", 0, "Ada Lovelace", "p", "Zürich"),
      ("c1", 1, "ada lovelace", "p", "Zurich"))
      .toDF("conv_id", "turn_idx", "subj", "pred", "obj")
    val mapping = Canonicalizer.canonicalize(
      Seq("Ada Lovelace", "ada lovelace", "Zürich", "Zurich").toDF("surface"))
    val out = Canonicalizer.applyTo(triples, mapping).collect()
    assert(out.map(_.getString(2)).distinct.length == 1)
    assert(out.map(_.getString(4)).distinct.length == 1)
  }
}
