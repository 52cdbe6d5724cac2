// scratch decomposition main (not committed)
package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.extract.Extractor
import graft.ops.{Dedup, TextOps}
object TimeQ5 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("timeq5")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val surf = d.select(
      array_join(slice(split(col("text"), " "), 1, 4), " ").as("surface"))
      .distinct()
    val m = pmod(TextOps.portableHash64(col("surface")), lit(3L))
    val prior = surf.where(m < 2)
      .withColumn("norm", Extractor.normalizeCol(col("surface")))
      .withColumn("canonical", min("surface").over(Window.partitionBy("norm")))
      .select("surface", "canonical")
    val newSurfaces = surf.where(m === 2)

    // replicate incrementalCanonicalize stages
    val k = 3; val rowsPerBand = 2; val minJ = 0.6
    val pm = prior.select(col("surface"), col("canonical")).cache()
    t("pm")(pm.count())
    val ps = pm.select(col("surface"))
      .withColumn("norm", Extractor.normalizeCol(col("surface"))).cache()
    t("ps")(ps.count())
    val nw = newSurfaces.select(col("surface")).distinct()
      .join(pm.select(col("surface")), Seq("surface"), "left_anti")
      .withColumn("norm", Extractor.normalizeCol(col("surface")))
      .cache()
    t("nw")(nw.count())
    val tnorm = nw.select(col("norm")).distinct()
    val grp = nw.select(col("surface"), col("norm")).unionByName(
      ps.join(tnorm, Seq("norm"), "left_semi").select(col("surface"), col("norm")))
    val hubs = grp.groupBy("norm").agg(min("surface").as("h"))
    val normEdges = grp.join(hubs, "norm")
      .where(col("surface") =!= col("h"))
      .select(col("h").as("src"), col("surface").as("dst"))
    t("normEdges")(normEdges.count())
    def withHs(df: org.apache.spark.sql.DataFrame) = {
      val idx = when(length(col("norm")) >= k,
        sequence(lit(1), length(col("norm")) - (k - 1)))
        .otherwise(array(lit(1)))
      df.withColumn("hs", array_distinct(transform(idx,
        i => TextOps.portableHash31(col("norm").substr(i, lit(k))))))
    }
    def sigArrays(df: org.apache.spark.sql.DataFrame) =
      df.select(col("surface").as("id"),
        array(Dedup.MinhashCoeffs.map { case (a, b) =>
          array_min(transform(col("hs"),
            h => (lit(a) * h + lit(b)) % Dedup.MinhashPrime))
        }: _*).as("mhs"))
    val hsNew = withHs(nw).cache()
    t("hsNew")(hsNew.count())
    val hsPrior = withHs(ps)
    val bNew = Dedup.bandTable(sigArrays(hsNew), rowsPerBand)
    val bAll = bNew.unionByName(Dedup.bandTable(sigArrays(hsPrior), rowsPerBand))
    val cands = bNew.as("x").join(bAll.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"))
      .distinct().cache()
    t("cands")(cands.count())
    val sh = hsNew.select(col("surface").as("id"), col("hs"))
      .unionByName(hsPrior.select(col("surface").as("id"), col("hs")))
      .select(col("id"), explode(col("hs")).as("h"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val verified = cands
      .join(sh.select(col("id").as("a"), col("h")), "a")
      .join(sh.select(col("id").as("b"), col("h")), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("a"), col("sz").as("sa")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("sb")), "b")
      .where(col("inter").cast("double") / (col("sa") + col("sb") - col("inter")) >= minJ)
      .select(col("a").as("src"), col("b").as("dst")).cache()
    t("verified")(verified.count())
    val edges0 = normEdges.union(verified)
    def anchorMap(alias: String) =
      pm.select(col("surface").as(alias), col("canonical").as(s"${alias}_c"))
    val edges = edges0
      .join(anchorMap("__s"), col("src") === col("__s"), "left_outer")
      .join(anchorMap("__d"), col("dst") === col("__d"), "left_outer")
      .select(coalesce(col("__s_c"), col("src")).as("src"),
        coalesce(col("__d_c"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).cache()
    t("edges")(edges.count())
    val cc = graft.algo.ConnectedComponents.run(edges).cache()
    t("cc")(cc.count())
    val anchors = pm.select(col("canonical").as("vertex")).distinct()
    val compAnchor = cc.join(anchors, "vertex")
      .groupBy("component").agg(min("vertex").as("anchor"))
    val out = nw.select(col("surface"))
      .join(cc.withColumnRenamed("vertex", "surface"), Seq("surface"), "left_outer")
      .join(compAnchor, Seq("component"), "left_outer")
      .select(col("surface"),
        coalesce(col("anchor"), col("component"), col("surface")).as("canonical"))
    t("final")(out.count())
    spark.stop()
  }
}
