package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

class EventOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("asofJoin: hand-computed matches, <= ties, id tie-break, unmatched nulls") {
    val left = Seq(
      (1L, ts(100), "p1"), // after r at 50 and 90 -> 90
      (1L, ts(90), "p2"), // equal ts -> the ts(90) right row matches
      (1L, ts(40), "p3"), // before every right row -> null
      (2L, ts(500), "p4") // key with no right rows -> null
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(50), 7L),
      (1L, ts(90), 8L),
      (1L, ts(90), 9L), // same (key, ts): greatest id must win
      (1L, ts(120), 10L)
    ).toDF("user_id", "ts", "click_id")
    val j = EventOps.asofJoin(left, right, "user_id", "ts", "click_id", Seq("click_id"))
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[Timestamp]("matched_ts")).map(_.getTime / 1000),
          Option(r.getAs[Any]("matched_click_id")).map(_.asInstanceOf[Long]))).toMap
    assert(j("p1") == ((Some(90L), Some(9L))))
    assert(j("p2") == ((Some(90L), Some(9L)))) // <= semantics + max-id tie-break
    assert(j("p3") == ((None, None)))
    assert(j("p4") == ((None, None)))
  }

  test("asofJoin == brute-force argmax on random data") {
    val rnd = new scala.util.Random(11)
    val left = (0 until 300).map(i => (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong), i.toLong))
    val right = (0 until 300).map(i => (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong), 1000L + i))
    val lDf = left.toDF("user_id", "ts", "lid")
    val rDf = right.toDF("user_id", "ts", "rid")
    val got = EventOps.asofJoin(lDf, rDf, "user_id", "ts", "rid", Seq("rid"))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[Any]("matched_rid")).map(_.asInstanceOf[Long])).toMap
    left.foreach { case (k, t, lid) =>
      val cands = right.filter(r => r._1 == k && !r._2.after(t))
      val expected =
        if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2.getTime, r._3))._3)
      assert(got(lid) == expected, s"lid=$lid key=$k ts=$t")
    }
  }

  test("gapSessions: sessions split at the gap, deterministic idx, singleton handling") {
    val ev = Seq(
      (1L, ts(0), 1L), (1L, ts(100), 2L), (1L, ts(1900), 3L), // gap 1800 exceeded at 100 -> 1900? 1800s gap: 1900-100=1800 NOT > 1800 -> same session
      (1L, ts(4000), 4L), // 4000-1900=2100 > 1800 -> new session
      (2L, ts(50), 5L) // separate key
    ).toDF("user_id", "ts", "event_id")
    val s = EventOps.gapSessions(ev, "user_id", "ts", "event_id", 1800L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("session_idx"), r.getAs[String]("session_id"))).toMap
    assert(s(1L)._1 == 0 && s(2L)._1 == 0 && s(3L)._1 == 0) // boundary: gap == limit stays
    assert(s(4L) == ((1L, "1#1")))
    assert(s(5L) == ((0L, "2#0")))
  }

  test("rangeJoin: half-open boundaries, multi-bin intervals, overlaps, empty intervals") {
    val pts = Seq(
      (1L, ts(100)), // == start of A -> in A
      (2L, ts(399)), // last second of A
      (3L, ts(400)), // == end of A -> excluded (half-open)
      (4L, ts(250)), // inside A and the overlapping B
      (5L, ts(9999)) // matches nothing
    ).toDF("pid", "ts")
    val ivs = Seq(
      (10L, ts(100), ts(400)), // A: spans many 60s bins
      (11L, ts(200), ts(300)), // B: overlaps A
      (12L, ts(500), ts(500)), // empty -> matches nothing
      (13L, ts(600), ts(550)) // inverted -> matches nothing
    ).toDF("ivl", "start_ts", "end_ts")
    val got = EventOps.rangeJoin(pts, "ts", ivs, "start_ts", "end_ts", binSeconds = 60L)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("ivl"))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (4L, 10L), (4L, 11L)))
  }

  test("rangeJoin == brute-force cross filter on random data, exactly-once pairs") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 400).map(i => (i.toLong, ts(rnd.nextInt(5000).toLong)))
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(5000).toLong
      (1000L + i, ts(s), ts(s + 1 + rnd.nextInt(600).toLong))
    }
    val pDf = pts.toDF("pid", "ts")
    val iDf = ivs.toDF("ivl", "start_ts", "end_ts")
    val got = EventOps.rangeJoin(pDf, "ts", iDf, "start_ts", "end_ts", binSeconds = 120L)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("ivl")))
    val expected = for {
      (pid, t) <- pts
      (ivl, s, e) <- ivs
      if !t.before(s) && t.before(e)
    } yield (pid, ivl)
    // multiset equality: every qualifying pair exactly once, none duplicated by binning
    assert(got.sorted.toSeq == expected.sorted)
  }

  test("rangeJoin: over-wide interval fails loudly instead of exploding") {
    val pts = Seq((1L, ts(0))).toDF("pid", "ts")
    val ivs = Seq((1L, ts(0), ts(1000000))).toDF("ivl", "start_ts", "end_ts")
    val ex = intercept[Exception] {
      EventOps.rangeJoin(pts, "ts", ivs, "start_ts", "end_ts",
        binSeconds = 1L, maxBinsPerInterval = 100).collect()
    }
    assert(ex.getMessage.contains("rangeJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("rangeJoin")))
  }

  test("retention: first-period cohorts, offset counts, period dedup") {
    // period = 10 s. user 1: periods 0,1,1,3 -> cohort 0, offsets 0,1,3;
    // user 2: periods 1,3 -> cohort 1, offsets 0,2; user 3: period 3 only
    val ev = Seq(
      (1L, ts(2)), (1L, ts(11)), (1L, ts(19)), (1L, ts(33)),
      (2L, ts(15)), (2L, ts(31)),
      (3L, ts(35))
    ).toDF("user_id", "ts")
    val got = EventOps.retention(ev, "user_id", "ts", periodSeconds = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L,
      (3L, 0L) -> 1L))
  }

  test("funnel: greedy earliest chain, strict ordering, drop-off nulls") {
    val ev = Seq(
      // user 1 completes A->B->C, out of order in the log
      (1L, ts(50), "C"), (1L, ts(10), "A"), (1L, ts(30), "B"), (1L, ts(5), "B"),
      // user 2: B at the SAME ts as A — strict > means no advance
      (2L, ts(10), "A"), (2L, ts(10), "B"),
      // user 3: A then B, no C
      (3L, ts(1), "A"), (3L, ts(2), "B"),
      // user 4: never does A
      (4L, ts(1), "B"), (4L, ts(2), "C")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.funnel(ev, "user_id", "ts", "event_type", Seq("A", "B", "C"))
      .collect().map(r => r.getAs[Long]("user") ->
        ((Option(r.getAs[Any]("t_1")), Option(r.getAs[Any]("t_2")),
          Option(r.getAs[Any]("t_3"))))).toMap
    def us(sec: Long) = Some(sec * 1000000L)
    assert(got(1L) == ((us(10), us(30), us(50)))) // the ts(5) B is before A: skipped
    assert(got(2L) == ((us(10), None, None)))
    assert(got(3L) == ((us(1), us(2), None)))
    assert(!got.contains(4L)) // never reached step 1 -> no row
  }

  test("slidingCounts: every event in size/slide epoch-aligned windows") {
    // size 600 slide 300: t=0 -> windows starting -300 and 0; t=400 -> 0
    // and 300; t=650 -> 300 and 600
    val ev = Seq((ts(0), 1L), (ts(400), 2L), (ts(650), 4L)).toDF("ts", "v")
    val byStart = EventOps.slidingCounts(ev, "ts", 600L, 300L, "v")
      .select((col("window_start").cast("long")).as("s"), col("cnt"), col("sum_v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getAs[Long]("sum_v")))).toMap
    assert(byStart == Map(-300L -> ((1L, 1L)), 0L -> ((2L, 3L)),
      300L -> ((2L, 6L)), 600L -> ((1L, 4L))))
  }

  test("rollingWindow: trailing range frame, inclusive bounds, per-key isolation") {
    val ev = Seq(
      (1L, ts(0), 1.0), // cnt 1, sum 1
      (1L, ts(30), 2.0), // [−30..30]: rows 0,30 -> cnt 2, sum 3
      (1L, ts(61), 4.0), // [1..61]: t=0 is 61s back, OUT; 30,60,61 in -> cnt 3, sum 14
      (1L, ts(60), 8.0), // [0..60]: all of 0,30,60 -> cnt 3, sum 11
      (2L, ts(30), 16.0) // other key: alone -> cnt 1
    ).toDF("user_id", "ts", "v")
    val got = EventOps.rollingWindow(ev, "user_id", "ts", 60L, "v")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("v")) ->
        (r.getAs[Long]("roll_cnt"), r.getAs[Double]("roll_sum"))).toMap
    assert(got((1L, 1.0)) == (1L, 1.0))
    assert(got((1L, 2.0)) == (2L, 3.0))
    assert(got((1L, 4.0)) == (3L, 14.0))
    assert(got((1L, 8.0)) == (3L, 11.0))
    assert(got((2L, 16.0)) == (1L, 16.0))
  }

  test("rollingWindow: exact-ts ties are peers — every tie sees the whole group") {
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(0), 2.0), (1L, ts(50), 4.0)
    ).toDF("user_id", "ts", "v")
    val got = EventOps.rollingWindow(ev, "user_id", "ts", 60L, "v")
      .collect().map(r => r.getAs[Double]("v") ->
        (r.getAs[Long]("roll_cnt"), r.getAs[Double]("roll_sum"))).toMap
    assert(got(1.0) == (2L, 3.0) && got(2.0) == (2L, 3.0))
    assert(got(4.0) == (3L, 7.0))
  }

  test("rollingZAnomalies: spike flagged, cold start never flagged, frame excludes current") {
    // user 1: ten 5s establish mean 5 / var 0, then a 6 — any nonzero
    // deviation on zero variance must flag; user 2: only 3 points (< minN),
    // an extreme value must NOT flag
    val rows = (1 to 10).map(i => (1L, ts(i * 10), i.toLong, 5L)) ++
      Seq((1L, ts(110), 11L, 6L)) ++
      (1 to 3).map(i => (2L, ts(i * 10), 100L + i, if (i == 3) 999L else 5L))
    val df = rows.toDF("user_id", "ts", "event_id", "v")
    val a = EventOps.rollingZAnomalies(df, "user_id", "ts", "event_id", "v",
      lookback = 20, minPoints = 10, zThresh = 3)
    val flagged = a.where(col("is_anomaly")).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(flagged == Set(11L))
    // the frame excludes the current row: row 11's stats cover the ten 5s
    val r11 = a.where(col("event_id") === 11L).head()
    assert(r11.getAs[Long]("roll_n") == 10L &&
      r11.getAs[Long]("roll_sum") == 50L &&
      r11.getAs[Long]("roll_sumsq") == 250L)
    // a genuine 3-sigma test on nonzero variance: alternating 4/6 history
    // (var 1), then 10 -> |10-5| = 5 > 3*1 flags; 7 -> 2 < 3 does not
    val rows2 = (1 to 10).map(i =>
      (3L, ts(i * 10), 200L + i, if (i % 2 == 0) 6L else 4L)) ++
      Seq((3L, ts(110), 211L, 10L), (3L, ts(120), 212L, 7L))
    val a2 = EventOps.rollingZAnomalies(rows2.toDF("user_id", "ts", "event_id", "v"),
      "user_id", "ts", "event_id", "v", lookback = 20, minPoints = 10, zThresh = 3)
    val f2 = a2.where(col("is_anomaly")).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(f2 == Set(211L))
  }
}
