// scratch plan dump (not committed)
package graft
import org.apache.spark.sql.functions._
object TimeQ3 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("timeq3")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").repartition(4)
    val sigs = graft.ops.Dedup.minhashSignatureArrays(docs, "doc_id", "text", shingleK = 3)
    val cands = graft.ops.Dedup.minhashLshCandidatesArrays(sigs, rowsPerBand = 2)
    val plan = cands.queryExecution.executedPlan.toString
    println("OCCURRENCES md5=" + "md5".r.findAllIn(plan).size +
      " xxhash=" + "xxhash64".r.findAllIn(plan).size +
      " exchange=" + "Exchange".r.findAllIn(plan).size +
      " reused=" + "ReusedExchange".r.findAllIn(plan).size +
      " transform=" + "transform".r.findAllIn(plan).size)
    println(plan.take(6000))
  }
}
