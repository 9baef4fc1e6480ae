package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, SessionOut}
import graft.sources.Tables

/** Structured-Streaming twins driven through MemoryStream, plus the
  * batch/stream sessionization equivalence. */
class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed counts aggregate by event-time window under a watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.windowedCounts(input.toDF, watermark = "10 minutes", win = "1 hour")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 2.0),
        Event(3, ts(65), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("reservoir quantile aggregates in a streaming groupBy (state-store merge path)") {
    implicit val ctx = spark.sqlContext
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val input = MemoryStream[Event]
    input.toDF.createOrReplaceTempView("rq_stream")
    val q = spark.sql(graft.functions.ChSql.translate(
      "SELECT event_type, quantile(0.5)(value) AS med FROM rq_stream GROUP BY event_type"))
      .writeStream.format("memory").queryName("rqs").outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0), Event(2, ts(6), 1, "click", 5.0),
        Event(3, ts(7), 2, "click", 9.0), Event(4, ts(8), 2, "view", 4.0))
      q.processAllAvailable()
      // second batch exercises merging NEW rows into RESTORED buffers
      input.addData(Event(5, ts(9), 3, "click", 7.0))
      q.processAllAvailable()
      val rows = spark.table("rqs").as[(String, Double)].collect().toMap
      // click: sorted (1,5,7,9), interpolated median at index
      // 0.5·(4−1) = 1.5 → (5+7)/2 = 6.0 (the reference's
      // quantileInterpolated convention, r15); view: 4.0
      assert(rows == Map("click" -> 6.0, "view" -> 4.0), rows)
    } finally q.stop()
  }

  test("append-mode windowed counts finalize on watermark and drop later-than-late events") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.windowedCounts(input.toDF, watermark = "10 minutes", win = "1 hour")
      .writeStream.format("memory").queryName("wc_late").outputMode("append").start()
    try {
      input.addData(Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 1.0))
      q.processAllAvailable()
      // watermark still inside [0,60) — nothing finalized yet
      assert(spark.table("wc_late").count() == 0)
      // t=75 advances the watermark to 65 ≥ window end → [0,60) emits
      input.addData(Event(3, ts(75), 1, "click", 1.0))
      q.processAllAvailable()
      val n0 = spark.table("wc_late")
        .filter(col("win_start") === ts(0)).select("n").as[Long].collect().toSeq
      assert(n0 == Seq(2L), s"window [0,60) should emit n=2, got $n0")
      // an event later than the allowed lateness lands in a FINALIZED
      // window — dropped, the emitted count never changes
      input.addData(Event(4, ts(6), 1, "click", 1.0))
      q.processAllAvailable()
      val after = spark.table("wc_late")
        .filter(col("win_start") === ts(0)).select("n").as[Long].collect().toSeq
      assert(after == Seq(2L), s"late event resurrected a finalized window: $after")
    } finally q.stop()
  }

  test("streaming sessionization closes a session when the gap is exceeded") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.sessionizeStream(input.toDS(), gapSec = 600)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // two events 5 min apart (one session), then one 30 min later
      input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(35), 7, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[SessionOut].collect().toSeq
      assert(sessions.map(s => (s.user_id, s.n_events)) == Seq((7L, 2)),
        s"expected the first 2-event session closed, got $sessions")
    } finally q.stop()
  }

  test("streaming windowFunnel matches the batch DP after the quiet timeout") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val condTypes = Seq("signup", "click", "purchase")
    val q = EventsStream.funnelStream(input.toDS(), condTypes,
        windowSec = 3600, quietSec = 600)
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(10), 1, "click", 0.0), // out of order within the watermark
        Event(2, ts(0), 1, "signup", 0.0),
        Event(3, ts(5), 2, "signup", 0.0),
        Event(4, ts(6), 2, "click", 0.0),
        Event(5, ts(7), 3, "view", 0.0))   // no condition: never enters state
      q.processAllAvailable()
      input.addData(Event(6, ts(20), 1, "purchase", 0.0))
      q.processAllAvailable()
      // push the watermark far past every quiet horizon, then one more
      // tick so the event-time timeouts fire
      input.addData(Event(7, ts(600), 99, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(8, ts(700), 99, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("funnel").as[EventsStream.FunnelOut].collect()
        .map(f => f.user_id -> f.level).toMap
      val rows = Seq(
        (1L, ts(10), 1L, "click", 0.0), (2L, ts(0), 1L, "signup", 0.0),
        (3L, ts(5), 2L, "signup", 0.0), (4L, ts(6), 2L, "click", 0.0),
        (5L, ts(7), 3L, "view", 0.0), (6L, ts(20), 1L, "purchase", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val batch = graft.operators.Behavior.windowFunnel(rows, "user_id",
          col("ts"), 3600L * 1000000L,
          condTypes.map(c => col("event_type") === c))
        .collect().map(r => r.getAs[Long]("user_id") ->
          r.getAs[Number]("level").intValue()).toMap
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Map(1L -> 3, 2L -> 2))
    } finally q.stop()
  }

  test("non-condition chatter past the quiet horizon does not kill the query (stale-timeout regression)") {
    // Regression: a user whose LAST condition event is long past keeps
    // emitting non-condition events. The old state.exists arm re-armed
    // the timeout from the stale ts.max; once the watermark passed
    // ts.max + quietSec, setTimeoutTimestamp threw and killed the
    // query. Now the chatter is a no-op and the funnel still emits.
    implicit val ctx = spark.sqlContext
    for (mode <- Seq("funnel", "seqmatch")) {
      val input = MemoryStream[Event]
      val ds = input.toDS()
      val name = s"stale_$mode"
      val stream = mode match {
        case "funnel" =>
          EventsStream.funnelStream(ds, Seq("signup", "click"),
            windowSec = 3600, quietSec = 600).toDF
        case _ =>
          EventsStream.seqMatchStream(ds, Seq("signup", "click"),
            gapSec = None, quietSec = 600).toDF
      }
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(Event(1, ts(0), 1, "signup", 0.0))
        q.processAllAvailable()
        // watermark crawls past ts(0)+quiet while user 1 only chatters:
        // each batch invokes user 1's group with zero condition events
        input.addData(Event(2, ts(15), 1, "view", 0.0))
        q.processAllAvailable()
        input.addData(Event(3, ts(40), 1, "view", 0.0))
        q.processAllAvailable()   // watermark ts(5) > ts(0)+quiet? no: ts(15)-10=ts(5); next:
        input.addData(Event(4, ts(80), 1, "view", 0.0))
        q.processAllAvailable()   // watermark ts(30) > ts(10) — old code threw here
        input.addData(Event(5, ts(600), 99, "view", 0.0))
        q.processAllAvailable()
        input.addData(Event(6, ts(700), 99, "view", 0.0))
        q.processAllAvailable()
        assert(q.exception.isEmpty, s"query died: ${q.exception}")
        val got = spark.table(name).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        // funnel: signup alone = level 1; seqmatch: incomplete chain = 0
        val want = if (mode == "funnel") Map(1L -> 1) else Map(1L -> 0)
        assert(got == want, s"$mode got $got")
      } finally q.stop()
    }
  }

  test("streaming sequenceMatch (both gap modes) matches the batch DP after the quiet timeout") {
    implicit val ctx = spark.sqlContext
    val condTypes = Seq("signup", "click", "purchase")
    // out-of-order within the watermark, split across batches; user 1
    // completes the chain, user 2 stalls at level 2, user 3 completes
    // only without the gap constraint (signup→click gap 30 min > 10),
    // user 4 has a same-timestamp signup+click tie (packed-order case)
    // batch 1 caps at ts(10) so the watermark (quiet 600s) stays at
    // minute 0 and batch 2's out-of-order arrivals are all in-contract
    val batch1 = Seq(
      Event(1, ts(10), 1, "click", 0.0), Event(2, ts(0), 1, "signup", 0.0),
      Event(3, ts(5), 2, "signup", 0.0), Event(4, ts(6), 2, "click", 0.0),
      Event(5, ts(0), 3, "signup", 0.0),
      Event(8, ts(2), 4, "click", 0.0), Event(9, ts(2), 4, "signup", 0.0),
      Event(10, ts(3), 4, "click", 0.0), Event(13, ts(4), 4, "purchase", 0.0),
      Event(14, ts(7), 5, "view", 0.0)) // no condition: never enters state
    val batch2 = Seq(
      Event(12, ts(20), 1, "purchase", 0.0),
      Event(6, ts(30), 3, "click", 0.0),
      Event(7, ts(35), 3, "purchase", 0.0))
    val rows = (batch1 ++ batch2).map(e =>
        (e.event_id, e.ts, e.user_id, e.event_type, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val conds = condTypes.map(c => col("event_type") === c)
    for (gapSec <- Seq(None, Some(600L))) {
      val name = s"seqmatch_${gapSec.getOrElse(0L)}"
      val input = MemoryStream[Event]
      val q = EventsStream.seqMatchStream(input.toDS(), condTypes,
          gapSec, quietSec = 600)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(batch1: _*)
        q.processAllAvailable()
        input.addData(batch2: _*)
        q.processAllAvailable()
        input.addData(Event(90, ts(600), 99, "view", 0.0))
        q.processAllAvailable()
        input.addData(Event(91, ts(700), 99, "view", 0.0))
        q.processAllAvailable()
        val got = spark.table(name).as[EventsStream.SeqMatchOut].collect()
          .map(o => o.user_id -> o.matched).toMap
        val batch = graft.operators.Behavior.sequenceMatch(rows, "user_id",
            col("ts"), conds, gapSec.map(_ * 1000000L))
          .collect().map(r => r.getAs[Long]("user_id") ->
            r.getAs[Number]("matched").intValue()).toMap
        assert(got == batch, s"gap=$gapSec stream $got vs batch $batch")
        val expect3 = if (gapSec.isEmpty) 1 else 0
        assert(got == Map(1L -> 1, 2L -> 0, 3L -> expect3, 4L -> 1),
          s"gap=$gapSec got $got")
      } finally q.stop()
    }
  }

  test("streaming sequenceCount matches the batch greedy DFA after the quiet timeout") {
    implicit val ctx = spark.sqlContext
    val condTypes = Seq("click", "purchase")
    // user 1: two complete chains + a dangling click; user 2: hits
    // arrive out of order across batches, one chain; user 3: purchase
    // before any click, zero chains
    val batch1 = Seq(
      Event(1, ts(0), 1, "click", 0.0), Event(2, ts(5), 1, "purchase", 0.0),
      Event(3, ts(10), 1, "click", 0.0),
      Event(4, ts(8), 2, "purchase", 0.0),
      Event(5, ts(3), 3, "purchase", 0.0))
    val batch2 = Seq(
      Event(6, ts(15), 1, "purchase", 0.0), Event(7, ts(20), 1, "click", 0.0),
      Event(8, ts(2), 2, "click", 0.0), // earlier than user 2's purchase
      Event(9, ts(6), 3, "view", 0.0))
    val input = MemoryStream[Event]
    val q = EventsStream.seqCountStream(input.toDS(), condTypes, quietSec = 600)
      .writeStream.format("memory").queryName("seqcount")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      input.addData(Event(90, ts(600), 99, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(91, ts(700), 99, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("seqcount").as[EventsStream.SeqCountOut].collect()
        .map(o => o.user_id -> o.n_chains).toMap
      val rows = (batch1 ++ batch2).map(e =>
          (e.event_id, e.ts, e.user_id, e.event_type, e.value))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val batch = graft.operators.Behavior.sequenceCount(rows, "user_id",
          col("ts"), condTypes.map(c => col("event_type") === c))
        .collect().map(r => r.getAs[Long]("user_id") ->
          r.getAs[Number]("n_chains").intValue()).toMap
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Map(1L -> 2, 2L -> 1, 3L -> 0), s"got $got")
    } finally q.stop()
  }

  test("batch sessionizer agrees with a hand-computed session split") {
    val events = Seq(
      (1L, ts(0), 7L, "click", 1.0), (2L, ts(5), 7L, "click", 2.0),
      (3L, ts(120), 7L, "click", 3.0), (4L, ts(1), 8L, "view", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventsStream.sessionizeBatch(events, gapSec = 3600)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.streamingDedup(input.toDF, Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0),  // dup id, same batch
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(2, ts(3), 1, "view", 2.0)) // dup id, later batch
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L), s"got $ids")
    } finally q.stop()
  }

  test("streaming near-dedup drops fingerprint-equal docs across batches") {
    implicit val ctx = spark.sqlContext
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventsStream.streamingNearDedup(
        input.toDF.toDF("doc_id", "ts", "text"), "ts", "text")
      .writeStream.format("memory").queryName("neardedup").outputMode("append").start()
    try {
      val base = (1 to 50).map(i => s"tok$i").mkString(" ")
      input.addData((1L, ts(0), base), (2L, ts(1), "completely different words"))
      q.processAllAvailable()
      // same token multiset, different order → same simhash → dropped
      val shuffled = (1 to 50).map(i => s"tok$i").reverse.mkString(" ")
      input.addData((3L, ts(2), shuffled))
      q.processAllAvailable()
      val ids = spark.table("neardedup").select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L), s"got $ids")
    } finally q.stop()
  }

  test("streaming quality gate: t10's scorer is stateless and batch-equivalent on a stream") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    def gated(df: org.apache.spark.sql.DataFrame) = {
      val (score, keep) = graft.operators.Text.qualityModel(col("text"))
      df.select(col("doc_id"), score.as("score"), keep.as("keep"))
    }
    val q = gated(input.toDF.toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("qgate").outputMode("append").start()
    try {
      val docs = Seq((1L, ts(0), "the quick brown fox jumps over the lazy dog"),
        (2L, ts(1), "lorem ipsum dolor sit amet consectetur"))
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("qgate")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq.sorted
      // per-row arithmetic has no state: the stream answer IS the
      // batch answer, row for row
      val batch = gated(docs.toDF("doc_id", "ts", "text"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq.sorted
      assert(streamed == batch && streamed.size == 2)
    } finally q.stop()
  }

  test("streaming minhash pairs a token-shuffled near-dup across batches; state expires with the watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val pairs = EventsStream.streamingMinHashPairs(
      input.toDF.toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
      shingleSize = 1, minEstJaccard = 0.5, watermarkSec = 3600)
    val q = pairs.writeStream.format("memory").queryName("mhpairs")
      .outputMode("append").start()
    try {
      val toks = (1 to 40).map(i => s"tok$i")
      input.addData((1L, ts(0), toks.mkString(" ")))
      q.processAllAvailable()
      // token-SHUFFLED (reversed) with 2 of 40 tokens edited: the
      // SimHash fingerprint differs (streamingNearDedup would PASS
      // it), but token-set Jaccard ≈ 38/42 → MinHash bands collide
      val shuffled = (toks.reverse.take(38) ++ Seq("edited1", "edited2")).mkString(" ")
      input.addData(
        (2L, ts(5), shuffled),
        (3L, ts(6), (1 to 40).map(i => s"other$i").mkString(" ")))
      q.processAllAvailable()
      val got = spark.table("mhpairs").as[EventsStream.NearDupPair].collect()
      val keys = got.map(p => (p.id1, p.id2)).toSet
      assert(keys.contains((1L, 2L)), s"near-dup pair missing: $keys")
      assert(!keys.exists(k => k._1 == 3L || k._2 == 3L), s"junk pair: $keys")
      assert(got.filter(p => (p.id1, p.id2) == ((1L, 2L)))
        .forall(_.est_jaccard >= 0.5))
      // advance the watermark 4h past doc 1, then a no-data-for-those-
      // buckets trigger fires their event-time timeout (state expiry)
      input.addData((4L, ts(300), (1 to 40).map(i => s"late$i").mkString(" ")))
      q.processAllAvailable()
      input.addData((6L, ts(302), (1 to 40).map(i => s"later$i").mkString(" ")))
      q.processAllAvailable()
      // doc 1's exact text again — its buckets were expired, no pair
      input.addData((5L, ts(303), toks.mkString(" ")))
      q.processAllAvailable()
      val after = spark.table("mhpairs").as[EventsStream.NearDupPair].collect()
        .map(p => (p.id1, p.id2)).toSet
      assert(!after.contains((1L, 5L)), s"expired state still paired: $after")
    } finally q.stop()
  }

  test("stream-stream interval join attributes follows to in-window leads only") {
    implicit val ctx = spark.sqlContext
    val leads = MemoryStream[Event]
    val follows = MemoryStream[Event]
    val q = EventsStream.streamIntervalJoin(
        leads.toDF, follows.toDF, windowSec = 600)
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      // user 1: lead@0 — follow@5 inside the 10-min window, follow@20
      // outside it; user 2's follow@5 must not match user 1's lead
      leads.addData(Event(10, ts(0), 1, "impression", 0.0))
      follows.addData(
        Event(20, ts(5), 1, "click", 0.0),
        Event(21, ts(20), 1, "click", 0.0),
        Event(22, ts(5), 2, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("ij")
        .select("user_id", "lead_id", "follow_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 10L, 20L)), s"got $got")
      // a second lead joins follows that arrive in a LATER batch
      leads.addData(Event(11, ts(30), 2, "impression", 0.0))
      follows.addData(Event(23, ts(33), 2, "click", 0.0))
      q.processAllAvailable()
      val got2 = spark.table("ij")
        .select("user_id", "lead_id", "follow_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got2 == Set((1L, 10L, 20L), (2L, 11L, 23L)), s"got $got2")
    } finally q.stop()
  }

  test("batch and stream sessionization agree on real events (sf0.001)") {
    val events = Tables(spark, sfDir).events
    val batch = EventsStream.sessionizeBatch(events, gapSec = 3600)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.sessionizeStream(input.toDS(), gapSec = 3600)
      .writeStream.format("memory").queryName("sess_real").outputMode("append").start()
    try {
      val evs = events.select("event_id", "ts", "user_id", "event_type", "value")
        .as[Event].collect().sortBy(e => e.ts.getTime)
      input.addData(evs)
      q.processAllAvailable()
      // push the watermark far past the last event so every open
      // session times out and is emitted
      input.addData(Event(Long.MaxValue, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "x", 0.0))
      q.processAllAvailable()
      val stream = spark.table("sess_real").as[SessionOut]
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.start_us, s.end_us, s.n_events.toLong))
        .collect().toSet
      assert(stream == batch,
        s"stream-only: ${stream.diff(batch).take(3)}; batch-only: ${batch.diff(stream).take(3)}")
    } finally q.stop()
  }
}
