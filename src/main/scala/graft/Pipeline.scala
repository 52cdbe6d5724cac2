package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.Extractor
import graft.graph.GraphTables
import graft.measures.{CoreMeasures, Degrees, DistributionMeasures, RdfMeasures}

/** The flagship KG-construction pipeline (north rule): transcripts ->
  * per-turn triples -> hashed edge/vertex tables -> lodcc topology measures,
  * end to end on DataFrames.
  *
  * `measures` returns the long-format (measure, value) table; `main` runs it
  * on freshly synthesized transcripts so the whole flow is drivable by
  * `sbt "runMain graft.Pipeline [nConvs]"` / spark-submit.
  */
object Pipeline {

  /** transcripts -> (triples, edges) with stable per-turn emission order. */
  def build(turns: DataFrame, partitions: Int = 32): (DataFrame, DataFrame) = {
    val triples = Extractor.triples(turns, repartitionBy = Some(partitions))
    val edges = GraphTables.edges(triples)
    (triples, edges)
  }

  /** Core + RDF structural measures over an edge table, long format. */
  def measures(edges: DataFrame): DataFrame = {
    val degrees = Degrees.degrees(edges).cache()
    val degHist = Degrees.histogram(degrees, "deg")
    val inHist = Degrees.histogram(degrees, "in_deg")

    def longf(df: DataFrame): DataFrame = {
      val cols = df.columns
      df.select(explode(map(
        cols.flatMap(c => Seq(lit(c), col(c).cast("double"))): _*)).as(Seq("measure", "value")))
    }

    val parts = Seq(
      CoreMeasures.basic(edges),
      CoreMeasures.degreeStats(degrees),
      CoreMeasures.reciprocity(edges),
      CoreMeasures.centralizationDegree(edges),
      DistributionMeasures.gini(degHist).withColumnRenamed("gini", "gini_coefficient"),
      DistributionMeasures.gini(inHist).withColumnRenamed("gini", "gini_coefficient_in_degree"),
      DistributionMeasures.gini(Degrees.histogram(degrees, "out_deg"))
        .withColumnRenamed("gini", "gini_coefficient_out_degree"),
      DistributionMeasures.hIndex(degHist).withColumnRenamed("h_index", "h_index_u"),
      DistributionMeasures.hIndex(inHist).withColumnRenamed("h_index", "h_index_d"),
      RdfMeasures.outDegree(edges),
      RdfMeasures.partialOutDegree(edges),
      RdfMeasures.labelledOutDegree(edges),
      RdfMeasures.directOutDegree(edges),
      RdfMeasures.inDegree(edges),
      RdfMeasures.partialInDegree(edges),
      RdfMeasures.labelledInDegree(edges),
      RdfMeasures.directInDegree(edges),
      RdfMeasures.predicateDegree(edges),
      RdfMeasures.predicateInDegree(edges),
      RdfMeasures.predicateOutDegree(edges),
      RdfMeasures.subjectObjectRatio(edges),
      RdfMeasures.predicateLists(edges),
      RdfMeasures.typedMeasures(edges, graft.functions.XxHash64Hex.hexOf("rdf:type")))
    parts.map(longf).reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 500L
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = graft.io.Transcripts.generate(spark, nConvs).toDF().cache()
    val (triples, edges) = build(turns)
    val e = edges.cache()
    println(s"turns=${turns.count()} triples=${triples.count()} edges=${e.count()}")
    measures(e).orderBy("measure").show(60, truncate = false)
    spark.stop()
  }
}
