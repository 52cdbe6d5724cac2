package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-leg diagnostics: the SHAPE of the bench edge table as the CC
  * fixpoint sees it — symmetrized pair volume, hot-key (u-group) skew, and
  * component size distribution. Skew in the u-partitioned join/dedup is the
  * candidate explanation for the leg's uniform 2.2-3.0x (not 4x) per-phase
  * speedup (see BASELINE.md round-5 probe matrix); this probe measures it.
  *
  * Usage: runMain graft.tools.GraphShapeProbe [edgesPath]
  */
object GraphShapeProbe {
  def main(args: Array[String]): Unit = {
    val edgesPath =
      if (args.length > 0) args(0) else "/tmp/graft-bench-edges-4000000"
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-graph-shape-probe")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val edges = s.read.parquet(edgesPath)
      .select(xxhash64(col("src")).as("src"), xxhash64(col("dst")).as("dst"))
    val pairs = edges.where(col("src") =!= col("dst"))
      .select(explode_outer(array(
        struct(col("src").as("u"), col("dst").as("v")),
        struct(col("dst").as("u"), col("src").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .dropDuplicates("u", "v")
      .persist()
    println(s"sym_pairs=${pairs.count()}")

    val deg = pairs.groupBy("u").agg(count(lit(1)).as("d")).persist()
    println("top u-degrees (symmetrized input):")
    deg.orderBy(col("d").desc).limit(10).collect()
      .foreach(r => println(s"  d=${r.getLong(1)}"))
    val q = deg.stat.approxQuantile("d", Array(0.5, 0.99, 0.999), 0.001)
    println(s"u-degree p50=${q(0)} p99=${q(1)} p999=${q(2)} nU=${deg.count()}")

    val cc = graft.algo.ConnectedComponents.run(s.read.parquet(edgesPath))
    val sizes = cc.groupBy("component").agg(count(lit(1)).as("n"))
    println("top component sizes:")
    sizes.orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"  n=${r.getLong(1)}"))
    println(s"n_components=${sizes.count()}")
    s.stop()
  }
}
