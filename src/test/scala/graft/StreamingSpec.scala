package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Transcripts, Triple, Turn}
import graft.streaming.Sessionize

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("flatMapGroupsWithState accumulates per-conversation state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = Sessionize.conversationSummaries(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("conv_sums").start()
    try {
      val convATurns = (0 until 3).map(i => Transcripts.turn(1, i))
      val convBTurns = (0 until 5).map(i => Transcripts.turn(2, i))
      input.addData(convATurns ++ convBTurns.take(2))
      q.processAllAvailable()
      input.addData(convBTurns.drop(2)) // second batch continues conv B
      q.processAllAvailable()
      val last = spark.table("conv_sums").as[Sessionize.ConvUpdate].collect()
        .groupBy(_.conv_id).map { case (k, v) => k -> v.maxBy(_.turns) }
      assert(last(Transcripts.convId(1)).turns == 3)
      assert(last(Transcripts.convId(2)).turns == 5) // state crossed the batch boundary
      assert(last(Transcripts.convId(2)).last_turn_idx == 4)
      val expectedTools = convBTurns.count(_.role == "tool")
      assert(last(Transcripts.convId(2)).tool_calls == expectedTools)
    } finally q.stop()
  }

  test("triple extraction runs unchanged on a streaming source (map-only)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val triples = graft.extract.Extractor.triples(input.toDS().toDF(), repartitionBy = None)
    val q = triples.writeStream.outputMode("append")
      .format("memory").queryName("stream_triples").start()
    try {
      val turns = (0 until 4).map(i => Transcripts.turn(3, i))
      input.addData(turns)
      q.processAllAvailable()
      val got = spark.table("stream_triples").as[Triple].collect().toSet
      val want = turns.flatMap(graft.extract.OracleExtractor.turnTriples).toSet
      assert(got == want)
    } finally q.stop()
  }
}
