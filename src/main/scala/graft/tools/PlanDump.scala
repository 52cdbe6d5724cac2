package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: write `.explain("formatted")` for named gate queries to
  * `<outdir>/<query>_<tag>.txt` under the Bench session shape — the
  * before/after plan evidence for the optimization rounds.
  *
  * {{{ sbt "runMain graft.tools.PlanDump plans/r06 before kg_link_pred ..." }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outdir> <tag> <query>...")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$tag.txt"), formatted.getBytes("UTF-8"))
      println(s"[plandump] wrote ${outDir.resolve(s"${n}_$tag.txt")}")
    }
    spark.stop()
  }
}
