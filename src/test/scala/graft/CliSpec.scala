package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** lodcc CLI arg-parity surface (`core_measures.py:145-168` analog). */
class CliSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("parse: argparse semantics — mutex group, defaults, skip-features, cap") {
    val a = Cli.parse(Seq("--from-file", "dsA", "dsB", "--threads", "50",
      "--skip-features", "pagerank", "powerlaw", "--print-stats"))
    assert(a.fromFile == Seq("dsA", "dsB") && a.printStats)
    assert(a.threads == 20) // reference caps Semaphore(min(threads, 20))
    // empty --features -> reference default list minus --skip-features
    assert(Cli.effectiveFeatures(a) == Pipeline.DefaultFeatures -- Set("pagerank", "powerlaw"))
    val b = Cli.parse(Seq("--from-db", "dsA", "--features", "degree", "diameter"))
    assert(Cli.effectiveFeatures(b) == Set("degree", "diameter"))
    intercept[IllegalArgumentException](Cli.parse(Seq("--print-stats"))) // mutex: none given
    intercept[IllegalArgumentException](
      Cli.parse(Seq("--from-file", "x", "--from-db", "y"))) // mutex: both given
    intercept[IllegalArgumentException](Cli.parse(Seq("--from-file", "x", "--bogus")))
    // reference-parity no-op flags are accepted
    assert(Cli.parse(Seq("--from-file", "x", "--openmp-disabled")).fromFile == Seq("x"))
  }

  test("end-to-end: edgelist CSV -> measures CSV + binary dump + plots; db mode upserts wide stats") {
    val dumps = java.nio.file.Files.createTempDirectory("graft_cli").toString
    // lodcc dumps layout: <dumps>/<name>/data.edgelist.csv, "src dst label"
    val dsDir = new java.io.File(s"$dumps/unit/"); dsDir.mkdirs()
    val edgelist = Seq("a b p1", "a c p1", "b c p2", "c d p2", "d a p3")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dumps/unit/data.edgelist.csv"),
      edgelist.mkString("\n").getBytes("UTF-8"))

    val cwd = System.getProperty("user.dir")
    val plots = s"$dumps/plots"
    val a = Cli.parse(Seq("--from-file", "unit", "--dumps", dumps,
      "--features", "basic", "degree", "plots", "--dump-graph",
      "--plots-dir", plots))
    val stats = Cli.run(spark, a)
    val rows = stats.collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(rows("n") == 4.0 && rows("m") == 5.0)

    // file sink: measures.<name>.csv (reference --from-file contract)
    val csv = spark.read.option("header", "true").csv(s"$cwd/measures.unit.csv")
    assert(csv.count() == stats.count())
    // binary dump committed; a reload now prefers the snapshot over the CSV
    val io = new graft.io.TableIO(spark, s"$dumps/_tables")
    assert(io.latest("edges_unit").isDefined)
    assert(Cli.loadEdges(spark, io, dumps, "unit").count() == 5)
    // plots feature + --plots-dir: one SVG per degree kind
    assert(new java.io.File(plots).list().count(_.endsWith(".svg")) == 3)

    // --from-db: wide one-row-per-dataset upsert (SqliteHelper analog)
    Cli.run(spark, Cli.parse(Seq("--from-db", "unit", "--dumps", dumps,
      "--features", "basic")))
    val wide = io.read("stats")
    assert(wide.count() == 1)
    assert(wide.columns.contains("dataset") && wide.columns.contains("m"))
    assert(wide.head().getAs[Double]("m") == 5.0)

    // cleanup the cwd artifact the reference-shaped file sink writes
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$cwd/measures.unit.csv"))
  }
}
