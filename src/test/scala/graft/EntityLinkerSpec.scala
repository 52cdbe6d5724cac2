package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.EntityLinker

class EntityLinkerSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def linksOf(texts: String*): Seq[(String, String, Int)] =
    EntityLinker.link(texts.toDF("text"))
      .select("mention", "entity", "score")
      .as[(String, String, Int)].collect().toSeq

  test("context keywords pick the right candidate") {
    assert(linksOf("We watched Jordan play basketball for the Bulls") ===
      Seq(("jordan", "person:michael_jordan", 2)))
    assert(linksOf("a visa to cross the Jordan river") ===
      Seq(("jordan", "place:jordan", 2)))
    assert(linksOf("Mercury filed an insurance claim on the policy") ===
      Seq(("mercury", "org:mercury_labs", 3)))
    assert(linksOf("Amazon delivery via Prime") ===
      Seq(("amazon", "org:amazon", 2)))
  }

  test("zero-context tie breaks to lexicographically smallest id") {
    assert(linksOf("jordan is here") === Seq(("jordan", "person:michael_jordan", 0)))
    assert(linksOf("mercury!") === Seq(("mercury", "org:mercury_labs", 0)))
  }

  test("one row per ambiguous mention; none when absent") {
    val multi = linksOf("Jordan met Mercury near the Amazon rainforest")
    assert(multi.map(_._1).sorted === Seq("amazon", "jordan", "mercury"))
    assert(multi.find(_._1 == "amazon").get._2 === "place:amazon_river")
    assert(linksOf("no ambiguous surface forms at all").isEmpty)
  }

  test("whole-token matching only (no substring hits)") {
    assert(linksOf("jordanian customs, amazonia").isEmpty)
  }

  test("determinism: same result regardless of partitioning") {
    val texts = (0 until 200).map(i =>
      s"turn $i " + EntityLinker.aliases(i % 3) + " " +
        EntityLinker.allKeywords((i * 13 + 5) % EntityLinker.allKeywords.size))
    val one = EntityLinker.link(texts.toDF("text").repartition(1))
      .groupBy("entity").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = EntityLinker.link(texts.toDF("text").repartition(7))
      .groupBy("entity").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === many)
    assert(one.values.sum === 200L)
  }
}
