package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run named gate queries once each under the Bench session shape
  * and print per-stage wall/shuffle metrics — the local stand-in for the
  * Spark UI's stage table (guide §1.1/§7.1) when iterating on a query's
  * plan shape.
  *
  * {{{ sbt "runMain graft.tools.StageProbe kg_link_pred" }}}
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("kg_link_pred")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stage-probe")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
                  tasks: Int, srMB: Double, swMB: Double, srRec: Long,
                  swRec: Long, inRec: Long, spillMB: Double)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '('),
            wall, m.executorRunTime, si.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten,
            m.inputMetrics.recordsRead,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
        }
      }
    })

    names.foreach { n =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"==== $n: $wall%.2f s, ${stages.size} stages ====")
      val sorted = stages.synchronized(stages.sortBy(-_.wallMs).toVector)
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%5s " +
        f"${"sr_MB"}%8s ${"sw_MB"}%8s ${"sr_rec"}%10s ${"sw_rec"}%10s " +
        f"${"in_rec"}%10s ${"spill"}%6s  name")
      sorted.take(40).foreach { s =>
        println(f"${s.id}%6d ${s.wallMs}%8d ${s.taskMs}%8d ${s.tasks}%5d " +
          f"${s.srMB}%8.1f ${s.swMB}%8.1f ${s.srRec}%10d ${s.swRec}%10d " +
          f"${s.inRec}%10d ${s.spillMB}%6.1f  ${s.name}")
      }
      val totWall = sorted.map(_.wallMs).sum
      println(f"[sum stage wall: ${totWall / 1000.0}%.2f s over ${stages.size} stages]")
    }
    spark.stop()
  }
}
