package graft.tools

import org.apache.spark.sql.SparkSession

/** Pre-materializes the bench inputs (same shapes [[graft.Bench]] builds on
  * startup) so probes can run without paying the generation inside a timed
  * session: the synthetic transcripts table at `turnsConvs` conversations
  * and the hashed edge table at `edgeConvs` conversations.
  *
  * Usage: runMain graft.tools.MakeBenchInputs [turnsConvs] [edgeConvs]
  */
object MakeBenchInputs {
  def main(args: Array[String]): Unit = {
    val turnsConvs = if (args.length > 0) args(0).toLong else 3000000L
    val edgeConvs = if (args.length > 1) args(1).toLong else 1000000L
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-make-bench-inputs")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val turnsPath = s"/tmp/graft-bench-turns-$turnsConvs"
    val edgesPath = s"/tmp/graft-bench-edges-$edgeConvs"
    if (turnsConvs > 0 && !new java.io.File(turnsPath).exists()) {
      graft.io.Transcripts.generate(s, turnsConvs, 64).toDF()
        .write.mode("overwrite").parquet(turnsPath)
      println(s"turns: $turnsPath rows=${s.read.parquet(turnsPath).count()}")
    }
    if (edgeConvs > 0 && !new java.io.File(edgesPath).exists()) {
      val turns = graft.io.Transcripts.generate(s, edgeConvs, 64).toDF()
      val (_, edges) = graft.Pipeline.build(turns, partitions = 64)
      edges.write.mode("overwrite").parquet(edgesPath)
      println(s"edges: $edgesPath rows=${s.read.parquet(edgesPath).count()}")
    }
    s.stop()
  }
}
