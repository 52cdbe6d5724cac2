package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: time a named subset of the gate queries under the exact Bench
  * suite session (local[32], 128 shuffle partitions, AQE), min of 2 passes —
  * for targeted regression checks without the full Bench protocol.
  *
  * {{{ sbt "runMain graft.tools.QueryTimer doc_minhash_lsh doc_shingle_jaccard" }}}
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.sameElements(Array("ALL"))) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq("doc_minhash_lsh")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-query-timer")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-query watchdog (same contract as graft.Verify): one pathological
    // query must not hang a sweep — cancel its job group, record -1
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_S", "900").toLong
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val work = Future {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try SparkEntry.queries(name)(spark, sfDir).count()
        finally spark.sparkContext.clearJobGroup()
      }
      try { Await.result(work, timeoutSec.seconds); (System.nanoTime() - t0) / 1e9 }
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[qtimer] $name timed out after ${timeoutSec}s")
          -1.0
      }
    }
    names.foreach { n =>
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
        println(s"=== $n: ${"Exchange".r.findAllIn(plan).length} Exchange nodes " +
          s"(${"ReusedExchange".r.findAllIn(plan).length} reused)")
        println(plan.linesIterator
          .filter(l => l.contains("Exchange") || l.contains("Join") ||
            l.contains("HashAggregate")).mkString("\n"))
      }
      val (a, b) = (once(n), once(n))
      println(f"""{"query":"$n","pass1":$a%.2f,"pass2":$b%.2f,"min2":${math.min(a, b)}%.2f}""")
    }
    spark.stop()
  }
}
