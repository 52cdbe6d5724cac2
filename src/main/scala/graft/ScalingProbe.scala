package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: time the extraction job at several parallelism levels, in
  * both orders, to separate real scaling from JVM/session artifacts.
  */
object ScalingProbe {
  def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val shuffleParts = sys.env.get("PROBE_SHUFFLE")
      .map(_.toInt).map(p => if (p < 0) 4 * cores else p).getOrElse(32)
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def job(spark: SparkSession, path: String): Long = {
    val turns = spark.read.parquet(path)
    val parts = sys.env.get("PROBE_PARTS").map(_.toInt)
      .map(p => if (p < 0) 4 * spark.sparkContext.defaultParallelism else p).getOrElse(32)
    val (_, edges) = Pipeline.build(turns, partitions = parts)
    edges.count()
  }

  def main(args: Array[String]): Unit = {
    val order = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq else Seq(8, 32)
    val nConvs = sys.env.getOrElse("PROBE_CONVS", "12000").toLong
    val path = s"/tmp/graft-bench-turns-$nConvs"
    locally {
      val s = session(8)
      if (!new java.io.File(path).exists()) {
        graft.io.Transcripts.generate(s, nConvs, 64).toDF()
          .write.mode("overwrite").parquet(path)
      }
      s.stop()
    }
    for (cores <- order) {
      val s = session(cores)
      println(s"cores=$cores defaultParallelism=${s.sparkContext.defaultParallelism}")
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = job(s, path)
        println(f"  run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (edges=$n)")
      }
      // breakdown: read-only, extract-no-shuffle
      for (i <- 1 to 2) {
        var t0 = System.nanoTime()
        s.read.parquet(path).count()
        val tRead = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val turns = s.read.parquet(path)
        graft.graph.GraphTables.edges(graft.extract.Extractor.triples(turns, None)).count()
        val tNoShuffle = (System.nanoTime() - t0) / 1e9
        println(f"  read-only: $tRead%.2f s, extract-no-shuffle: $tNoShuffle%.2f s")
      }
      s.stop()
    }
  }
}
