// scratch 10x probe for the incremental canonicalization chain (not committed)
package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.extract.Extractor
import graft.ops.TextOps
object TimeQ6 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("timeq6")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def surfacesX(copies: Int) = {
      val base = d.select(
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("s0"))
      (0 until copies).map(c =>
          base.select(concat(lit(s"cpy$c "), col("s0")).as("surface")))
        .reduce(_ unionByName _)
        .distinct()
    }
    def run(copies: Int): Double = {
      val surf = surfacesX(copies)
      val m = pmod(TextOps.portableHash64(col("surface")), lit(3L))
      val prior = surf.where(m < 2)
        .withColumn("norm", Extractor.normalizeCol(col("surface")))
        .withColumn("canonical", min("surface").over(Window.partitionBy("norm")))
        .select("surface", "canonical")
      val t0 = System.nanoTime()
      val out = graft.canon.Canonicalizer.incrementalCanonicalize(
        prior, surf.where(m === 2), minJ = 0.6)
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"copies=$copies n_new=$n wall=$sec%.2f s")
      sec
    }
    (1 to 2).foreach { p => println(s"--- pass $p"); run(1); run(10) }
    spark.stop()
  }
}
