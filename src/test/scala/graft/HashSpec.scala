package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{gfunctions, XxHash64Hex}

class HashSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // Goldens minted from an independent pure-Python XXH64 implementation of
  // the public spec; the first is also the constant embedded in the
  // reference at typed_subjects_objects.py:11.
  val goldens = Seq(
    "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>" -> "ae98476863dc6ec5",
    "/John" -> "c5f2c8fdc091b835",
    "rdf:type" -> "6013f35c6ebf0373",
    "" -> "ef46db3751d8e999",
    "Zürich" -> "85f1debcbb1a8279",
    "conv:conv-00000001" -> "1a0e855ace6ab646",
    ("a" * 100) -> "375041e8b1decfb3")

  test("xxh64_hex matches reference xxhash.xxh64 hexdigests (eval + codegen)") {
    val df = goldens.map(_._1).toDF("s")
      .select(gfunctions.xxh64_hex($"s").as("h"))
    assert(df.collect().map(_.getString(0)).toSeq == goldens.map(_._2))
  }

  test("scala-side hexOf helper agrees") {
    goldens.foreach { case (s, h) => assert(XxHash64Hex.hexOf(s) == h) }
  }

  test("rdf:type token constant") {
    assert(XxHash64Hex.hexOf(gfunctions.RdfTypeToken) == gfunctions.RdfTypeHash)
  }
}
