package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Transcripts, Triple, Turn}
import graft.streaming.{Sessionize, StreamingSftPairs}

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

  test("stream-stream join: cross-batch matches == batch twin, trailing-window bounds") {
    import graft.streaming.StreamJoin
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)
    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val buys = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val clickRows = Seq(
      (ts(100), 1L, 10L), (ts(500), 1L, 11L), // u1: one in window, one not
      (ts(900), 2L, 12L), (ts(1000), 2L, 13L), // u2: both in window (== ts match)
      (ts(100), 3L, 14L)) // u3: never buys
    val buyRows = Seq((ts(1000), 1L, 20L), (ts(1000), 2L, 21L))
    val joined = StreamJoin.within(
      buys.toDS().toDF("ts", "user_id", "buy_id"),
      clicks.toDS().toDF("ts", "user_id", "click_id"),
      "user_id", "ts", lookbackSeconds = 600L, delay = "10 minutes")
    val q = joined.select("buy_id", "click_id_r")
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    try {
      // batch 1: clicks only — nothing can join yet
      clicks.addData(clickRows.take(3): _*)
      q.processAllAvailable()
      // batch 2: the rest of the clicks + the purchases
      clicks.addData(clickRows.drop(3): _*)
      buys.addData(buyRows: _*)
      q.processAllAvailable()
      val got = spark.table("ssj").collect()
        .map(r => (r.getAs[Long]("buy_id"), r.getAs[Long]("click_id_r"))).toSet
      // u1 buy@1000 matches click@500 (>= 400) but NOT click@100; u2 buy@1000
      // matches clicks @900 and @1000 (<= tie). CROSS-batch: u1's click@500
      // arrived a batch before its purchase.
      assert(got == Set((20L, 11L), (21L, 12L), (21L, 13L)))
      // the same operator on static frames is the batch twin — identical pairs
      val batch = StreamJoin.within(
        buyRows.toDF("ts", "user_id", "buy_id"),
        clickRows.toDF("ts", "user_id", "click_id"),
        "user_id", "ts", 600L, "10 minutes")
        .select("buy_id", "click_id_r").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("append-mode windows: one finalized emission per window, late data dropped") {
    import graft.streaming.EventWindows
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int, sec: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:$sec%02d")
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDS().toDF("ts", "event_type", "value")
    val q = EventWindows.tumblingCountsAppend(events, "ev_append")
    try {
      // two events in window [00:00, 00:05)
      input.addData((ts(0, 30), "a", 1.0), (ts(1), "a", 2.0))
      q.processAllAvailable()
      // watermark jumps to 00:20 - 10min = 00:10 >= window end -> finalize
      input.addData((ts(20), "a", 5.0))
      q.processAllAvailable()
      // LATE event for the already-finalized window: must be dropped, the
      // emitted row must not change or duplicate (bounded-state semantics)
      input.addData((ts(2), "a", 100.0), (ts(21), "a", 7.0))
      q.processAllAvailable()
      val win0 = spark.table("ev_append")
        .where($"win_start" === java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime / 1000)
        .collect()
      assert(win0.length == 1, s"window emitted ${win0.length} times")
      assert(win0.head.getAs[Long]("n") == 2) // the late 100.0 event is NOT counted
      assert(win0.head.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming funnel: state advances across batches, equals the batch funnel") {
    import graft.streaming.StreamingFunnel
    import graft.ops.EventOps
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)
    val b1 = Seq((ts(10), 1L, "A"), (ts(5), 2L, "A"), (ts(6), 2L, "B"))
    val b2 = Seq((ts(30), 1L, "B"), (ts(50), 1L, "C"), (ts(6), 2L, "C"), (ts(7), 2L, "C"))
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val ev = input.toDS().toDF("ts", "user_id", "event_type")
    val q = StreamingFunnel.progress(ev, Seq("A", "B", "C"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // latest update per user == the user's final funnel position
      val latest = spark.table("funnel_stream")
        .groupBy("user").agg(max(struct(col("step"), col("times"))).as("s"))
        .select(col("user"), col("s.step"), col("s.times")).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2)))).toMap
      // user 1: A@10, B@30, C@50 across batches; user 2: A@5, B@6, then C@6
      // is NOT > t_2=6 (strict), C@7 advances
      assert(latest(1L) == ((3, Seq(10000000L, 30000000L, 50000000L))))
      assert(latest(2L) == ((3, Seq(5000000L, 6000000L, 7000000L))))
      // equality with the batch operator on the unioned input
      val batch = EventOps.funnel((b1 ++ b2).toDF("ts", "user_id", "event_type"),
        "user_id", "ts", "event_type", Seq("A", "B", "C")).collect()
        .map(r => r.getAs[Long]("user") ->
          Seq(r.getAs[Any]("t_1"), r.getAs[Any]("t_2"), r.getAs[Any]("t_3"))
            .takeWhile(_ != null).map(_.asInstanceOf[Long])).toMap
      assert(batch.keySet == latest.keySet)
      batch.foreach { case (u, times) => assert(latest(u)._2 == times) }
    } finally q.stop()
  }


  test("streaming SFT pairs: prompt crosses the batch boundary, equals the batch op") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val q = StreamingSftPairs.pairs(input.toDS(), minChars = 3)
      .writeStream.outputMode("append").format("memory").queryName("sft_pairs").start()
    def turn(conv: String, idx: Int, role: String, text: String): Turn =
      Turn(conv, idx, role, text, "", new java.sql.Timestamp(1000L * idx))
    val all = Seq(
      turn("c1", 0, "assistant", "orphan greeting"),
      turn("c1", 1, "user", "first question"),
      turn("c1", 2, "assistant", "first answer"),
      turn("c1", 3, "tool", "tool output"),
      turn("c1", 4, "assistant", "post-tool answer"),
      turn("c1", 5, "user", "second question"),
      turn("c1", 6, "assistant", "ok"), // fails minChars
      turn("c2", 0, "user", "other conv"),
      turn("c2", 1, "assistant", "other answer"))
    try {
      // split mid-conversation: the c1 prompt from batch 1 must pair with
      // the assistant turns of batch 2 via state
      input.addData(all.take(2))
      q.processAllAvailable()
      input.addData(all.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("sft_pairs").as[StreamingSftPairs.SftPair]
        .collect().map(p => (p.conv_id, p.turn_idx) -> (p.prompt, p.response)).toMap
      val batch = graft.extract.Extractor
        .sftPairs(all.toDF(), minChars = 3).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> (r.getString(2), r.getString(3))).toMap
      assert(streamed == batch)
      assert(streamed(("c1", 4)) == (("first question", "post-tool answer")))
    } finally q.stop()
  }

  test("sessionize TTL: idle conversations evicted by event-time timeout, fresh restart after") {
    // VERDICT r3 next #8: without a timeout, state rows accumulate forever
    // on an unbounded conv keyspace. With idleTimeoutSeconds the watermark
    // evicts idle keys; a conversation that reappears AFTER eviction
    // restarts from zero (the documented watermark-bound trade).
    implicit val sqlCtx = spark.sqlContext
    def turn(conv: String, idx: Int, sec: Long): Turn =
      Turn(conv, idx, "user", s"t$idx", "", new java.sql.Timestamp(sec * 1000L))
    val input = MemoryStream[Turn]
    val q = Sessionize.conversationSummaries(input.toDS(), idleTimeoutSeconds = 60L)
      .writeStream.outputMode("update").format("memory").queryName("conv_ttl").start()
    try {
      input.addData(turn("A", 0, 100), turn("A", 1, 110))
      q.processAllAvailable()
      // push the watermark past A's last turn (110) + 60s horizon:
      // wm = 300 - 60 = 240 > 170 -> A's state times out and is removed
      input.addData(turn("B", 0, 300))
      q.processAllAvailable()
      input.addData(turn("B", 1, 310)) // one more batch so the timeout fires
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1L, s"A's state not evicted: $stateRows rows") // only B remains
      // A returns with a CURRENT timestamp: state restarted from zero
      input.addData(turn("A", 7, 320))
      q.processAllAvailable()
      val aRows = spark.table("conv_ttl").where(col("conv_id") === "A")
        .select("turns", "last_turn_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(aRows.contains((2L, 1)), aRows)  // pre-eviction summary
      assert(aRows.contains((1L, 7)), aRows)  // post-eviction restart, not turns=3
    } finally q.stop()
  }


  test("streaming SFT pairs TTL: idle prompt state evicted; orphaned response unpaired") {
    implicit val sqlCtx = spark.sqlContext
    def turn(conv: String, idx: Int, role: String, text: String, sec: Long): Turn =
      Turn(conv, idx, role, text, "", new java.sql.Timestamp(sec * 1000L))
    val input = MemoryStream[Turn]
    val q = StreamingSftPairs.pairs(input.toDS(), minChars = 1, idleTimeoutSeconds = 60L)
      .writeStream.outputMode("append").format("memory").queryName("sft_ttl").start()
    try {
      input.addData(turn("A", 0, "user", "prompt a", 100))
      q.processAllAvailable()
      // watermark sweeps past A's horizon before its assistant arrives
      input.addData(turn("B", 0, "user", "prompt b", 400))
      q.processAllAvailable()
      input.addData(turn("B", 1, "assistant", "answer b", 410))
      q.processAllAvailable()
      // A's held prompt was evicted -> this response finds no prompt
      input.addData(turn("A", 1, "assistant", "late answer a", 420))
      q.processAllAvailable()
      val pairs = spark.table("sft_ttl").as[StreamingSftPairs.SftPair].collect()
        .map(p => p.conv_id -> p.response).toSet
      assert(pairs == Set("B" -> "answer b"), pairs)
    } finally q.stop()
  }

  test("streaming funnel TTL: abandoned funnels evicted, unbounded default untouched") {
    import graft.streaming.StreamingFunnel
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val ev = input.toDS().toDF("ts", "user_id", "event_type")
    val q = StreamingFunnel.progress(ev, Seq("A", "B"), idleTimeoutSeconds = 60L)
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("update").start()
    try {
      input.addData((ts(100), 1L, "A")) // user 1 reaches step 1, then goes idle
      q.processAllAvailable()
      input.addData((ts(400), 2L, "A")) // wm -> 340 > 160: user 1 evictable
      q.processAllAvailable()
      input.addData((ts(410), 2L, "B")) // next batch fires the timeout
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 1L) // only user 2
      // user 1's B arrives after eviction with a current ts: the machine
      // restarted, so B alone cannot advance a funnel whose A was evicted
      input.addData((ts(420), 1L, "B"))
      q.processAllAvailable()
      val u1 = spark.table("funnel_ttl").where(col("user") === 1L)
        .select("step").collect().map(_.getInt(0)).toSet
      assert(u1 == Set(1), s"user 1 should never pass step 1 after eviction: $u1")
    } finally q.stop()
  }

  test("slidingCounts expression runs unchanged on a streaming source") {
    // the same EventOps.slidingCounts plan, fed from a stream in complete
    // mode across two batches, must equal the batch run on the union —
    // the operator is genuinely streaming-compatible, not batch-only
    import graft.ops.EventOps
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq((ts(0), 1L), (ts(400), 2L), (ts(650), 4L), (ts(700), 8L))
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val ev = input.toDS().toDF("ts", "v")
    val q = EventOps.slidingCounts(ev, "ts", 600L, 300L, "v")
      .writeStream.format("memory").queryName("ev_sliding_stream")
      .outputMode("complete").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("ev_sliding_stream")
        .select(col("window_start").cast("long"), col("cnt"), col("sum_v"))
        .collect().map(_.toSeq).toSet
      val batch = EventOps.slidingCounts(rows.toDF("ts", "v"), "ts", 600L, 300L, "v")
        .select(col("window_start").cast("long"), col("cnt"), col("sum_v"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
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

  test("end-to-end streaming extraction: two-batch stream == batch edges, lineage per batch") {
    import graft.streaming.StreamingExtraction
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val root = java.nio.file.Files.createTempDirectory("graft-stream-x").toString
    val q = StreamingExtraction.run(input.toDS().toDF(), root, s"$root/_ckpt",
      partitions = 4)
    try {
      val b1 = (0L until 4L).flatMap(c => (0 until 3).map(i => Transcripts.turn(c, i)))
      val b2 = (4L until 8L).flatMap(c => (0 until 3).map(i => Transcripts.turn(c, i)))
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()

      // edge MULTISET equality with the batch plan over the union
      val streamed = spark.read.parquet(s"$root/edges").drop("batch_id")
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val batch = graft.Pipeline.build((b1 ++ b2).toDF(), partitions = 4)._2
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(streamed == batch)

      // per-partition lineage rows per micro-batch: row counts reconcile
      // with the written data, every batch is covered
      val lin = spark.read.parquet(s"$root/lineage").collect()
      assert(lin.map(_.getAs[Int]("batch_id")).toSet == Set(0, 1))
      assert(lin.map(_.getAs[Long]("row_count")).sum == streamed.size)
      assert(lin.forall(_.getAs[String]("stage") == "stream_extract"))
      assert(lin.map(_.getAs[String]("input_snapshot")).toSet ==
        Set("batch-0", "batch-1"))
      val linCount = lin.length
      q.stop()

      // replay idempotency: a fresh checkpoint re-delivers the same batches
      // (the crash-recovery shape) — edges AND lineage must end up
      // identical, not duplicated
      val input2 = MemoryStream[Turn]
      val q2 = StreamingExtraction.run(input2.toDS().toDF(), root,
        s"$root/_ckpt2", partitions = 4)
      try {
        input2.addData(b1)
        q2.processAllAvailable()
        input2.addData(b2)
        q2.processAllAvailable()
        val replayed = spark.read.parquet(s"$root/edges").drop("batch_id")
          .collect().map(_.toSeq.mkString("|")).sorted.toSeq
        assert(replayed == batch)
        val lin2 = spark.read.parquet(s"$root/lineage").collect()
        assert(lin2.length == linCount) // replaced, not duplicated
        assert(lin2.map(_.getAs[Long]("row_count")).sum == streamed.size)
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming extraction survives an empty first batch (zero-row lineage, then recovers)") {
    import graft.streaming.StreamingExtraction
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val root = java.nio.file.Files.createTempDirectory("graft-stream-e").toString
    val q = StreamingExtraction.run(input.toDS().toDF(), root, s"$root/_ckpt",
      partitions = 4)
    try {
      // batch 0: turns whose text contains no gazetteer mention -> zero
      // edges, nothing written under edges/batch_id=0
      val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      input.addData(Seq(
        Turn("conv-e", 0, "user", "zzz qqq nothing here", "", ts),
        Turn("conv-e", 1, "assistant", "still nothing", "", ts)))
      q.processAllAvailable()
      assert(q.isActive, "stream died on the empty batch")
      val lin0 = spark.read.parquet(s"$root/lineage").collect()
      assert(lin0.length == 1 && lin0.head.getAs[Long]("row_count") == 0L
        && lin0.head.getAs[Int]("partition_id") == -1
        && lin0.head.getAs[String]("input_snapshot") == "batch-0")
      // batch 1: real turns -> edges appear and lineage reconciles
      input.addData((0 until 3).map(i => Transcripts.turn(1L, i)))
      q.processAllAvailable()
      val edges = spark.read.parquet(s"$root/edges")
      val lin = spark.read.parquet(s"$root/lineage").collect()
      assert(lin.map(_.getAs[Int]("batch_id")).toSet == Set(0, 1))
      assert(lin.map(_.getAs[Long]("row_count")).sum == edges.count())
    } finally q.stop()
  }

  test("streaming dedup: cross-batch duplicates dropped, state evicted past the watermark") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDS().toDF("ts", "doc_id", "text")
    val q = StreamingDedup.dedupByContent(docs, "ts", "text", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      // batch 1: "A" twice in-batch -> one survivor; "B" passes
      input.addData((ts(0), 1L, "A"), (ts(0), 2L, "B"), (ts(1), 3L, "A"))
      q.processAllAvailable()
      // batch 2: "A" again within the horizon -> dropped
      input.addData((ts(2), 4L, "A"))
      q.processAllAvailable()
      // batch 3: advance the watermark far past A's expiry (state evicted)
      input.addData((ts(40), 5L, "C"))
      q.processAllAvailable()
      // batch 4: "A" reappears after the horizon -> re-admitted by design
      input.addData((ts(41), 6L, "A"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.intersect(Set(1L, 3L)).size == 1) // exactly one batch-1 "A"
      assert(kept.contains(2L) && kept.contains(5L))
      assert(!kept.contains(4L)) // within-horizon duplicate dropped
      assert(kept.contains(6L)) // past-horizon re-admission
    } finally q.stop()
  }

  test("streaming simhash dedup key matches the batch kernel (signature-identical drop)") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDS().toDF("ts", "doc_id", "text")
    val q = StreamingDedup.dedupBySimHash(docs, "ts", "text", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("simdedup_out").start()
    try {
      // same token multiset in a different order -> identical simhash -> drop;
      // a different token -> different hash -> keep
      input.addData((ts(0), 1L, "alpha beta gamma"), (ts(1), 2L, "gamma beta alpha"),
        (ts(1), 3L, "alpha beta delta"))
      q.processAllAvailable()
      val kept = spark.table("simdedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.intersect(Set(1L, 2L)).size == 1)
      assert(kept.contains(3L))
      // sanity: the streaming key really is the batch kernel's value
      val batch = graft.ops.TextOps.simhash(
        Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
          .toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(_.getLong(1)).toSet
      assert(batch.size == 1)
    } finally q.stop()
  }

  test("RocksDB state store: cross-batch state + TTL eviction under the production provider") {
    // VERDICT r4 next #7: TTL bounds state per key age, but at a 10^12-turn
    // feed the LIVE keyspace alone overflows the on-heap default provider.
    // Re-run the sessionize cross-batch + TTL contract with state routed to
    // RocksDB (graft.streaming.StateStores) and assert the provider actually
    // took effect via its rocksdb* custom metrics.
    import graft.streaming.StateStores
    implicit val sqlCtx = spark.sqlContext
    def turn(conv: String, idx: Int, sec: Long): Turn =
      Turn(conv, idx, "user", s"t$idx", "", new java.sql.Timestamp(sec * 1000L))
    val input = MemoryStream[Turn]
    val priorProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass") // built-in default (HDFS-backed)
    StateStores.withRocksDb(spark) {
      val q = Sessionize.conversationSummaries(input.toDS(), idleTimeoutSeconds = 60L)
        .writeStream.outputMode("update").format("memory").queryName("conv_rocks").start()
      try {
        input.addData(turn("A", 0, 100), turn("A", 1, 110))
        q.processAllAvailable()
        input.addData(turn("A", 2, 120)) // state crosses the batch boundary
        q.processAllAvailable()
        val aTurns = spark.table("conv_rocks").where(col("conv_id") === "A")
          .agg(max("turns")).head().getLong(0)
        assert(aTurns == 3L, s"cross-batch state lost under RocksDB: $aTurns")
        // the provider really is RocksDB: its custom metrics are present
        val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
        assert(metrics.stream().anyMatch(_.startsWith("rocksdb")),
          s"no rocksdb metrics — provider not in effect: $metrics")
        // TTL eviction still works off-heap: wm = 300-60 = 240 > 170
        input.addData(turn("B", 0, 300))
        q.processAllAvailable()
        input.addData(turn("B", 1, 310))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.head.numRowsTotal == 1L)
      } finally q.stop()
    }
    // the helper restored the prior (default) provider for later tests
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass") == priorProvider)
    assert(!priorProvider.contains("RocksDB"))
  }
}
