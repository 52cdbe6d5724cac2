package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shuffle-leg diagnostics: times the bench CC fixpoint on the
  * pre-materialized edge table at a given core count (same per-leg config
  * rule as [[graft.Bench]]: shuffle partitions = 4x cores).
  *
  * Usage: runMain graft.tools.CcLegProbe <cores> <runs> [shape] [edgesPath]
  * shape: run (library call) | lazy | eager (instrumented inline loops,
  * per-round walls on stderr)
  */
object CcLegProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val runs = args(1).toInt
    val shape = if (args.length > 2) args(2) else "run"
    val edgesPath =
      if (args.length > 3) args(3) else "/tmp/graft-bench-edges-1000000"
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-cc-probe-$cores")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", (4 * cores).toString))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val edges = s.read.parquet(edgesPath)

    def instrumented(eager: Boolean): Long = {
      var pairs = edges.select(col("src").as("u"), col("dst").as("v"))
        .where(col("u") =!= col("v"))
        .union(edges.select(col("dst").as("u"), col("src").as("v"))
          .where(col("u") =!= col("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val p0 = System.nanoTime()
      val nPairs = pairs.count()
      System.err.println(f"pairs materialize: rows=$nPairs%9d " +
        f"wall=${(System.nanoTime() - p0) / 1e9}%6.2f s")
      var converged = false
      var iter = 0
      var prevSig: (Long, Long) = (-1L, -1L)
      val subSteps = sys.env.contains("SPARK_GRAFT_CC_SUBSTEPS")
      while (!converged && iter < 50) {
        val r0 = System.nanoTime()
        val ls0 = {
          val mins = pairs.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("mn"))
          pairs.join(mins, "u").where(col("v") > col("u"))
            .select(col("v").as("a"), col("mn").as("b"))
            .where(col("a") =!= col("b"))
        }
        val ls = if (!subSteps) ls0 else {
          val t = System.nanoTime()
          val m = ls0.localCheckpoint(true)
          System.err.println(f"  ls:   rows=${m.count()}%9d wall=${(System.nanoTime() - t) / 1e9}%6.2f s")
          m
        }
        val ss0 = {
          val smaller = ls.select(
            greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
          val mins = smaller.groupBy("u").agg(min(col("v")).as("mn"))
          smaller.join(mins, "u")
            .select(col("v").as("a"), col("mn").as("b"))
            .union(mins.select(col("u").as("a"), col("mn").as("b")))
            .where(col("a") =!= col("b"))
            .distinct()
        }
        val ss = if (!subSteps) ss0 else {
          val t = System.nanoTime()
          val m = ss0.localCheckpoint(true)
          System.err.println(f"  ss:   rows=${m.count()}%9d wall=${(System.nanoTime() - t) / 1e9}%6.2f s")
          m
        }
        val next = ss.select(col("a").as("u"), col("b").as("v"))
          .union(ss.select(col("b").as("u"), col("a").as("v")))
          .distinct()
          .localCheckpoint(eager)
        val sigRow = next.agg(
          count(lit(1)).as("c"),
          coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
        val sig = (sigRow.getLong(0), sigRow.getLong(1))
        pairs.unpersist(false)
        pairs = next
        converged = sig == prevSig
        prevSig = sig
        iter += 1
        System.err.println(f"round $iter%2d rows=${sig._1}%9d " +
          f"wall=${(System.nanoTime() - r0) / 1e9}%6.2f s")
      }
      val n = pairs.groupBy(col("u")).agg(min(col("v"))).count()
      pairs.unpersist(false)
      n
    }

    // GC accounting (run-18 hypothesis): ParallelGC threads are sized by
    // the HOST's hw threads regardless of local[N], so stop-the-world
    // collection wall is ~constant per byte allocated at every leg — a
    // serial term a real N-executor cluster (per-executor GC ∝ N) lacks.
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    (1 to runs).foreach { i =>
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val n = shape match {
        case "run" => graft.algo.ConnectedComponents.run(edges).count()
        case "lazy" => instrumented(eager = false)
        case "eager" => instrumented(eager = true)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val gcs = (gcMillis() - g0) / 1e3
      println(f"""{"cores":$cores,"run":$i,"shape":"$shape","secs":$wall%.2f,"gc_secs":$gcs%.2f,"rows":$n}""")
    }
    s.stop()
  }
}
