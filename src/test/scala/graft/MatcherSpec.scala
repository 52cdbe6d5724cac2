package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.matcher.BgpMatcher
import graft.matcher.BgpMatcher.PatternEdge
import graft.measures.{CoreMeasures, Degrees, DistributionMeasures}

class MatcherSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val edges = Seq(
    ("a", "b", "knows"), ("b", "c", "knows"), ("a", "c", "likes"),
    ("c", "d", "knows"), ("d", "a", "likes")).toDF("src", "dst", "label")

  test("BGP: single labeled edge") {
    val m = BgpMatcher.find(edges, Seq(PatternEdge("x", "y", Some("likes"))))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m == Set(("a", "c"), ("d", "a")))
  }

  test("BGP: 2-hop chain with vertex disjointness") {
    val m = BgpMatcher.find(edges, Seq(
      PatternEdge("x", "y", Some("knows")), PatternEdge("y", "z", Some("knows"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(m == Set(("a", "b", "c"), ("b", "c", "d")))
  }

  test("BGP: closed triangle pattern") {
    // x -knows-> y -knows-> z and x -likes-> z
    val m = BgpMatcher.find(edges, Seq(
      PatternEdge("x", "y", Some("knows")),
      PatternEdge("y", "z", Some("knows")),
      PatternEdge("x", "z", Some("likes"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(m == Set(("a", "b", "c")))
  }

  test("BGP maxN limits embeddings (lodcc max_n=3 analog)") {
    assert(BgpMatcher.find(edges, Seq(PatternEdge("x", "y", None)), maxN = 2).count() == 2)
  }

  test("template render (SF5)") {
    assert(BgpMatcher.render("SELECT {{x}} WHERE {{ y }}", Map("x" -> "?s", "y" -> "?s ?p ?o"))
      == "SELECT ?s WHERE ?s ?p ?o")
  }

  test("uri prefix/localname slicing (SF4)") {
    val r = Seq("<http://ex.org/a/b#name>", "<http://ex.org/path/leaf>")
      .toDF("uri")
      .select(BgpMatcher.uriPrefixLocal(org.apache.spark.sql.functions.col("uri")).as("p"))
      .select("p.prefix", "p.localname").collect()
    assert(r(0).getString(0) == "http://ex.org/a/b#" && r(0).getString(1) == "name")
    assert(r(1).getString(0) == "http://ex.org/path/" && r(1).getString(1) == "leaf")
  }

  test("query templates: embeddings instantiate SPARQL strings (lodcc 4th entry point)") {
    import graft.matcher.QueryTemplates
    val qs = QueryTemplates.instantiate(edges, QueryTemplates.l1, maxN = 2)
    assert(qs.nonEmpty && qs.size <= 2)
    qs.foreach { q =>
      assert(q.contains("SELECT ?b ?c WHERE"))
      assert(!q.contains("{{"), s"unbound template var in: $q") // all vars bound
    }
    // star template on a graph with a 2-out-degree hub only matches if some
    // vertex has >= 3 distinct neighbors; our 5-edge fixture has none
    assert(QueryTemplates.instantiate(edges, QueryTemplates.s1).isEmpty)
  }

  test("pseudo-diameter with largest-component semantics on fixture") {
    val fixtureEdges = Seq(
      ("/John", "john@example.org", "m"), ("/John", "john@doe.org", "m"),
      ("/John", "/Researcher", "t"), ("/John", "/Rome", "b"),
      ("/Giacomo", "/Rome", "a"), ("/Piero", "/Rome", "a"),
      ("/Rome", "\"Roma\"@it", "n"),
      // second tiny component, must be ignored (LC wins)
      ("x1", "x2", "z")).toDF("src", "dst", "label")
    val row = CoreMeasures.pseudoDiameter(fixtureEdges).head()
    // LC = the 8-vertex John/Rome component; source = max out-degree = /John
    // BFS from /John: Rome=1, Roma=2 -> far=Roma d=2; Roma is a sink
    assert(row.getLong(0) == 2)
    assert(row.getString(1) == "/John")
    assert(row.getString(2) == "\"Roma\"@it")
  }

  test("powerlaw fit: DataFrame algorithm == in-memory reference implementation") {
    val histData: Seq[(Double, Long)] =
      (1 to 40).map(x => (x.toDouble, math.max(1L, math.round(2e5 * math.pow(x, -2.4)))))
    // independent in-memory implementation of the same CSN spec
    def refFit(h: Seq[(Double, Long)]): (Double, Double) = {
      val pos = h.filter(_._1 > 0).sortBy(_._1)
      val cands = pos.map(_._1)
      val scored = cands.flatMap { xmin =>
        val tail = pos.filter(_._1 >= xmin)
        val nt = tail.map(_._2).sum
        val sumlog = tail.map { case (x, c) => c * math.log(x / xmin) }.sum
        if (sumlog <= 0 || tail.size < 2) None
        else {
          val alpha = 1.0 + nt / sumlog
          var cum = 0L
          val ks = tail.map { case (x, c) =>
            cum += c
            math.abs(cum.toDouble / nt - (1.0 - math.pow(x / xmin, 1.0 - alpha)))
          }.max
          Some((xmin, alpha, ks))
        }
      }
      val best = scored.minBy { case (xmin, _, ks) =>
        (math.round(ks * 1e9), xmin)
      }
      (best._2, best._1)
    }
    val (refAlpha, refXmin) = refFit(histData)
    val r = DistributionMeasures.powerlawFit(histData.toDF("x", "cnt")).head()
    assert(r.getDouble(1) == refXmin, s"xmin ${r.getDouble(1)} != $refXmin")
    assert(math.abs(r.getDouble(0) - refAlpha) < 1e-9)
    assert(refAlpha > 1.0)
  }

  test("powerlaw fit: alpha formula exact on a two-point tail") {
    // xmin candidates {1,2}; verify MLE alpha = 1 + n/sum(cnt*ln(x/xmin))
    val hist = Seq((1.0, 80L), (2.0, 20L)).toDF("x", "cnt")
    val r = DistributionMeasures.powerlawFit(hist).head()
    val bestAlpha = 1.0 + 100.0 / (20.0 * math.log(2.0)) // xmin=1 candidate
    assert(r.getDouble(1) == 1.0)
    assert(math.abs(r.getDouble(0) - bestAlpha) < 1e-9)
  }
}
