package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.TableIO

/** End-to-end contract of the daily incremental KG rebuild: stable
  * dictionary ids across batches, append-only triple ingestion, churn
  * accounting, and empty-batch idempotence.
  */
class IncrementalBuildSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("two-batch rebuild: stable prior ids, append-only churn, empty batch is a no-op") {
    val root = Files.createTempDirectory("graft-incr").toString
    val io = new TableIO(spark, root)
    val turns = graft.io.Transcripts.generate(spark, 20, 2).toDF().cache()
    // conv ids are zero-padded strings ("conv-00000010") — lexicographic
    // split is the numeric split
    val batchA = turns.where(col("conv_id") < "conv-00000010")
    val batchB = turns.where(col("conv_id") >= "conv-00000010")

    // ---- batch A bootstraps the dictionary and the triple table --------
    val churnA = Pipeline.incrementalBuild(io, batchA, "A", partitions = 2).head()
    assert(churnA.getAs[Long]("n_edges_before") == 0)
    assert(churnA.getAs[Long]("n_removed") == 0)
    assert(churnA.getAs[Long]("n_edges_after") > 0)
    val dictA = io.read("dict").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dictA.nonEmpty)

    // ---- batch B: prior assignments survive VERBATIM --------------------
    val churnB = Pipeline.incrementalBuild(io, batchB, "B", partitions = 2).head()
    val dictB = io.read("dict").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    dictA.foreach { case (s, c) =>
      assert(dictB.get(s).contains(c), s"prior assignment renamed: $s")
    }
    // every surface of both batches is resolved
    val triplesAll = io.read("canon_triples")
    val batches = triplesAll.select("batch").distinct().collect()
      .map(_.getString(0)).toSet
    assert(batches == Set("A", "B"))
    // append-only: nothing removed, the edge set only grows
    assert(churnB.getAs[Long]("n_removed") == 0)
    assert(churnB.getAs[Long]("n_edges_after") >=
      churnB.getAs[Long]("n_edges_before"))
    // canonical endpoints: every subj/obj of the committed triples is a
    // canonical id of the dictionary (closed world after rewrite)
    val canonIds = dictB.values.toSet
    val endpoints = triplesAll.select(col("subj").as("v")).unionByName(
      triplesAll.select(col("obj").as("v"))).distinct().collect().map(_.getString(0))
    endpoints.foreach { e =>
      assert(canonIds.contains(e) || !dictB.contains(e),
        s"non-canonical endpoint survived the rewrite: $e")
    }

    // ---- empty batch: dictionary unchanged, zero churn ------------------
    val empty = turns.where(lit(false))
    val churnC = Pipeline.incrementalBuild(io, empty, "C", partitions = 2).head()
    assert(churnC.getAs[Long]("n_added") == 0)
    assert(churnC.getAs[Long]("n_removed") == 0)
    val dictC = io.read("dict").count()
    assert(dictC == dictB.size)
  }
}
