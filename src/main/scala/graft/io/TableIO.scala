package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-committed table storage with per-partition lineage — Iceberg-
  * shaped semantics (snapshot ids, atomic manifest swap, resume from last
  * committed snapshot) over plain Parquet directories, because no Iceberg
  * runtime jar exists in this environment (SURVEY.md §7.0). The interface is
  * format-pluggable: a production binding replaces `commit`/`read` bodies
  * with `df.writeTo(table)` / `spark.read.format("iceberg")` and keeps every
  * caller unchanged.
  *
  * Layout: <root>/<table>/snap-<id>/data/  (parquet parts)
  *         <root>/<table>/snap-<id>/lineage/  (parquet parts)
  *         <root>/<table>/_manifest.json          (atomic rename commit)
  *
  * Crash safety: data and lineage are fully written BEFORE the manifest is
  * swapped; a killed job leaves an orphan snap dir and the previous manifest
  * intact, so the rerun recomputes only the uncommitted stage (lodcc analog:
  * `.gt.gz` reuse, builder.py:38-42; `do_respect_existing_file`,
  * to_ntriples.sh:38-53).
  */
class TableIO(spark: SparkSession, root: String) {

  private val fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  case class Snapshot(id: Long, stage: String, inputSnapshot: String,
                      rowCount: Long, wallMs: Long)

  private def manifestPath(table: String) = new Path(s"$root/$table/_manifest.json")

  private def parseManifest(s: String): Option[Snapshot] = {
    def field(k: String): Option[String] =
      s"""\"$k\"\\s*:\\s*(\"([^\"]*)\"|[0-9]+)""".r.findFirstMatchIn(s)
        .map(m => Option(m.group(2)).getOrElse(m.group(1)))
    for {
      id <- field("id"); st <- field("stage"); in <- field("input_snapshot")
      rc <- field("row_count"); wm <- field("wall_ms")
    } yield Snapshot(id.toLong, st, in, rc.toLong, wm.toLong)
  }

  def latest(table: String): Option[Snapshot] = {
    val p = manifestPath(table)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        parseManifest(new String(bytes, "UTF-8"))
      } finally in.close()
    }
  }

  def read(table: String): DataFrame = {
    val snap = latest(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for table '$table'"))
    spark.read.parquet(s"$root/$table/snap-${snap.id}/data")
  }

  def readLineage(table: String): DataFrame = {
    val snap = latest(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for table '$table'"))
    spark.read.parquet(s"$root/$table/snap-${snap.id}/lineage")
  }

  /** Write df as the next snapshot of `table` with per-partition lineage
    * rows (stage, partition id, input snapshot, row count, wall ms), then
    * atomically swap the manifest. Returns the committed snapshot.
    */
  def commit(table: String, df: DataFrame, stage: String,
             inputSnapshot: String): Snapshot = {
    val t0 = System.nanoTime()
    val id = latest(table).map(_.id + 1).getOrElse(0L)
    val dataDir = s"$root/$table/snap-$id/data"
    df.write.mode("overwrite").parquet(dataDir)

    // per-output-partition lineage from the written files. partition_id is
    // decoded from the writer's own part number in the file name — a pure
    // map (the earlier global row_number window funneled every file row
    // through one task; harmless at thousands of files, an anti-pattern at
    // millions). Gaps are legitimate: Spark skips writing empty partitions.
    val written = spark.read.parquet(dataDir)
    val wallMs = (System.nanoTime() - t0) / 1000000
    val lineage = written
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("row_count"))
      .select(
        lit(stage).as("stage"),
        regexp_extract(col("file"), "part-(\\d+)", 1).cast("int").as("partition_id"),
        lit(inputSnapshot).as("input_snapshot"),
        col("row_count"),
        lit(wallMs).as("wall_ms"))
      .cache()
    lineage.write.mode("overwrite").parquet(s"$root/$table/snap-$id/lineage")
    // table row count from the (tiny, cached) lineage — avoids a second
    // full scan of the data we just wrote
    val rowCount = lineage.agg(coalesce(sum("row_count"), lit(0L))).head().getLong(0)
    lineage.unpersist(false)

    val json =
      s"""{"table": "$table", "id": $id, "stage": "$stage", "input_snapshot": "$inputSnapshot",
         | "row_count": $rowCount, "wall_ms": $wallMs}""".stripMargin
    val tmp = new Path(s"$root/$table/_manifest.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8"))
    out.close()
    val dst = manifestPath(table)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"manifest swap failed for $table")
    Snapshot(id, stage, inputSnapshot, rowCount, wallMs)
  }

  /** Resume-or-compute: if `table` already has a committed snapshot produced
    * from `inputSnapshot`, read it (skip the stage); otherwise run `compute`
    * and commit the result. This is the per-stage checkpoint/resume contract
    * of the north rule.
    */
  def resumeOrCompute(table: String, stage: String, inputSnapshot: String)
                     (compute: => DataFrame): DataFrame =
    latest(table) match {
      case Some(snap) if snap.inputSnapshot == inputSnapshot && snap.stage == stage =>
        read(table)
      case _ =>
        commit(table, compute, stage, inputSnapshot)
        read(table)
    }

  /** [[commit]] with a TARGET OUTPUT-FILE SIZE: the write goes through
    * AQE's rebalance (the `REBALANCE` hint + advisory partition size), so
    * Spark splits oversized shuffle partitions and coalesces tiny ones to
    * `targetBytes` at runtime — no pre-scan, no hand-tuned partition
    * count. This is the 100-TB file-hygiene knob: a snapshot written from
    * a skewed upstream stage otherwise lands as a few multi-GB parts next
    * to thousands of KB-sized ones, both of which poison later scans.
    */
  def commitSized(table: String, df: DataFrame, stage: String,
                  inputSnapshot: String,
                  targetBytes: Long = 128L << 20): Snapshot = {
    require(targetBytes > 0, "targetBytes must be positive")
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, targetBytes.toString)
    try commit(table, df.hint("rebalance"), stage, inputSnapshot)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Bucketed snapshot: persist `df` hash-bucketed AND sorted on `keys`
    * through the session catalog (files live under this TableIO root, the
    * catalog entry carries the bucket spec). Joins and aggregations between
    * snapshots bucketed on the same keys with the same bucket count then
    * run with NO exchange and NO sort — the co-located-join contract that
    * turns the repeated self-joins of a daily KG rebuild (edges ⋈ degrees,
    * edges ⋈ dict, prior ⋈ increment) from two full shuffles per stage
    * into none. Bucket count is a layout contract: pick it for the TARGET
    * cluster (e.g. 4-16x executor count) and keep it stable across
    * snapshots — TableIOSpec pins the exchange-free plan.
    *
    * The catalog entry is SESSION-GLOBAL, so its name is namespaced by a
    * slug of this TableIO's root (`graft_<rootslug>_<table>`): two
    * TableIO instances with different roots in one SparkSession get
    * disjoint catalog entries instead of silently overwriting each
    * other's. Data overwrites in place (the bucket layout IS the
    * snapshot — callers needing time travel keep using [[commit]] and
    * re-bucket the head).
    */
  private val rootSlug: String =
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(root) & 0xffffffffL)

  private def bucketedName(table: String) = s"graft_${rootSlug}_$table"

  def commitBucketed(table: String, df: DataFrame,
                     keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "need at least one bucket key")
    require(buckets > 0, "buckets must be positive")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", s"$root/$table/bucketed")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(bucketedName(table))
  }

  /** Read a bucketed snapshot with its bucket spec intact (reading the
    * parquet path directly would discard the layout and reintroduce the
    * shuffle).
    */
  def readBucketed(table: String): DataFrame =
    spark.table(bucketedName(table))
}
