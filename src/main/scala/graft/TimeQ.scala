// scratch timing main (not committed)
package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("timeq")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.drop(1).foreach { name =>
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        println(f"$name pass$p ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
