package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Pipeline

/** End-to-end streaming flagship path: a transcripts STREAM -> per-turn
  * triple extraction -> hashed edge table, appended per micro-batch with a
  * TableIO-style lineage row per batch (north rule: every stage checkpoints
  * with lineage and resumes exactly).
  *
  * The extraction expression is stateless per turn, so inside foreachBatch
  * the exact BATCH plan ([[Pipeline.build]], including the stable
  * (conv_id, turn_idx) emission-order repartition) runs unchanged on each
  * micro-batch — batch/stream parity is structural, not re-implemented
  * (StreamingSpec asserts edge-multiset equality on a two-batch input).
  *
  * Sink layout: <root>/edges/batch_id=<n>/ parquet (append-only,
  * partitioned by micro-batch) plus <root>/lineage/ rows mirroring
  * [[graft.io.Lineage]] (stage, partition_id = batch id,
  * input_snapshot = "batch-<id>", row_count, wall_ms). Recovery: the
  * stream's checkpoint replays an uncommitted batch, and dynamic partition
  * overwrite rewrites ONLY that batch's directory — idempotent at batch_id
  * granularity, the Iceberg-snapshot-per-batch analog under plain parquet
  * (same trade as [[graft.io.TableIO]], SURVEY.md §7.0).
  */
object StreamingExtraction {

  def run(turns: DataFrame, root: String, checkpoint: String,
          partitions: Int = 32): StreamingQuery = {
    turns.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val t0 = System.nanoTime()
        val (_, edges) = Pipeline.build(batch, partitions)
        // per-write option (not a session conf mutation, which would race
        // between concurrent streams sharing the session): overwrite ONLY
        // this batch's partition, so a checkpoint-replayed batch lands
        // idempotently
        edges.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(s"$root/edges")
        // PER-PARTITION lineage from the written files (north rule: partition
        // id, input snapshot, row count, wall time) — read ONLY this batch's
        // directory, not the table root: listing the root is O(total batches
        // ever written) per batch and grows without bound on a long-lived
        // stream. Keyed (and partitioned) by batch id with the same dynamic
        // overwrite: a replayed batch REPLACES its lineage rows instead of
        // appending duplicates — counts stay exact across recoveries.
        val batchPath = new org.apache.hadoop.fs.Path(s"$root/edges/batch_id=$batchId")
        val fs = batchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val wallMs = (System.nanoTime() - t0) / 1000000
        // a batch may extract ZERO edges (nothing written, no batch dir):
        // emit a single zero-count lineage row instead of dying on a
        // missing path — the stream must survive empty batches, and the
        // explicit row records that the batch committed empty
        val lineage =
          if (fs.exists(batchPath))
            spark.read.parquet(batchPath.toString)
              .groupBy(input_file_name().as("file"))
              .agg(count(lit(1)).as("row_count"))
              .select(
                lit("stream_extract").as("stage"),
                regexp_extract(col("file"), "part-(\\d+)", 1).cast("int").as("partition_id"),
                lit(s"batch-$batchId").as("input_snapshot"),
                col("row_count"),
                lit(wallMs).as("wall_ms"),
                lit(batchId).as("batch_id"))
          else
            spark.range(1).select(
              lit("stream_extract").as("stage"),
              lit(-1).as("partition_id"),
              lit(s"batch-$batchId").as("input_snapshot"),
              lit(0L).as("row_count"),
              lit(wallMs).as("wall_ms"),
              lit(batchId).as("batch_id"))
        lineage
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(s"$root/lineage")
        ()
      }
      .start()
  }
}
