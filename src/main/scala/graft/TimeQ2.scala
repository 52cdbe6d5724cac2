// scratch decomposition main (not committed)
package graft
import org.apache.spark.sql.functions._
object TimeQ2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("timeq2")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)")
    }
    val sigs = graft.ops.Dedup.minhashSignatureArrays(docs, "doc_id", "text", shingleK = 3)
    t("signatures")(sigs.count())
    t("signatures2")(sigs.count())
    val cands = graft.ops.Dedup.minhashLshCandidatesArrays(sigs, rowsPerBand = 2)
    t("lsh_cands")(cands.count())
    t("lsh_cands2")(cands.count())
    val nocol = graft.ops.Dedup.minhashLshCandidatesArrays(sigs, rowsPerBand = 2, collapse = false)
    t("lsh_nocollapse")(nocol.count())
    spark.stop()
  }
}
