package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream processing (SURVEY §2 s01 + EventsStreamSpec;
  * reference: src/Parsers/ASTWatchQuery.h — ClickHouse WATCH/live
  * views, whose Spark twin is Structured Streaming).
  *
  * The BATCH sessionizer and the STREAMING sessionizer implement the
  * same gap semantics; s01 oracle-verifies the batch plan in DuckDB,
  * EventsStreamSpec drives the streaming twins through MemoryStream.
  */
object EventsStream {

  /** Gap-based sessionization, batch form: a session breaks when the
    * per-user gap exceeds `gapSec`. lag+cumsum over per-USER windows —
    * partitioned by the natural key, so it scales with users (never a
    * global window). */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("__tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__tus", unix_micros(col("ts")))
      .withColumn("__prev", lag("__tus", 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__tus") - col("__prev") > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("__new").over(cum))
      .groupBy("user_id", "session_id")
      .agg(
        min("__tus").as("session_start_us"),
        max("__tus").as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
  }

  /** Streaming windowed aggregation: watermarked event-time tumbling
    * windows per event type — the live-view analog of a continuously
    * maintained GROUP BY. */
  def windowedCounts(
      events: DataFrame, watermark: String = "10 minutes",
      win: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact-dedup — the ingest guard of the training-data
    * pipeline: drop records whose id was already seen, with state
    * bounded by the watermark (duplicates arriving later than the
    * allowed lateness are out of contract). Spark's
    * dropDuplicatesWithinWatermark keeps one state row per id and
    * expires it when the watermark passes — state stays proportional
    * to the dedup horizon, not the stream's history. */
  def streamingDedup(
      events: DataFrame, idCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming NEAR-dup dedup: drop documents whose 64-bit SimHash
    * fingerprint was already seen within the watermark. SimHash
    * equality is the degenerate (band = whole hash) LSH bucket — near
    * duplicates of low Hamming distance collide on the full
    * fingerprint with high probability on token-frequency-similar
    * docs, and state is one row per distinct fingerprint, expired by
    * the watermark. The batch funnel (d02/d03) does candidate-pair
    * verification; the stream side is the cheap ingest guard. */
  def streamingNearDedup(
      docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs
      .withColumn("__fp", call_function("simhash64",
        split(col(textCol), " ", -1)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  final case class BandRow(
    doc_id: Long, ts: java.sql.Timestamp, sig: Array[Long], band: Int, key: Long)
  final case class BucketDoc(docId: Long, sig: Array[Long])
  final case class BucketState(docs: List[BucketDoc])
  final case class NearDupPair(id1: Long, id2: Long, est_jaccard: Double)

  /** The FULL streaming twin of batch MinHash LSH dedup (d02): not the
    * fingerprint-equality guard above, but band-bucketed candidate
    * PAIRS with the signature-agreement Jaccard estimate — a
    * token-shuffled or lightly-edited near-dup whose SimHash differs
    * still lands in a shared MinHash band and is paired.
    *
    * State lives per (band, bucket-key) group in
    * flatMapGroupsWithState: the signatures of the bucket's docs,
    * size-capped exactly like the batch bucketPairs (a degenerate
    * boilerplate bucket stops absorbing, never goes quadratic) and
    * EXPIRED by event-time timeout one watermark past the bucket's
    * last arrival — state is proportional to the dedup horizon ×
    * bucket cap, never the stream's history. A pair that collides in
    * several bands is emitted once per band (the batch form dedups
    * with `distinct`; downstream sinks dedup on (id1, id2) if they
    * need exactly-once pairs).
    */
  def streamingMinHashPairs(
      docs: DataFrame, idCol: String, tsCol: String, textCol: String,
      numHashes: Int = 64, bandRows: Int = 2, shingleSize: Int = 3,
      minEstJaccard: Double = 0.5, maxBucket: Int = 50,
      watermarkSec: Long = 3600): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val numBands = numHashes / bandRows
    val entries = docs
      .withColumn("__gs", graft.operators.Dedup.wordNGrams(col(textCol), shingleSize))
      .filter(size(col("__gs")) > 0) // same min-length contract as batch
      .withColumn("__mh", call_function("minhash64", col("__gs"), lit(numHashes)))
      .select(col(idCol).as("doc_id"), col(tsCol).as("ts"), col("__mh").as("sig"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)), b =>
          xxhash64(slice(col("__mh"), b * bandRows + 1, lit(bandRows)))))
          .as(Seq("band", "key")))
      .withWatermark("ts", s"$watermarkSec seconds")
      .as[BandRow]

    def agreement(a: Array[Long], b: Array[Long]): Double = {
      var n = 0
      var i = 0
      while (i < a.length) { if (a(i) == b(i)) n += 1; i += 1 }
      n.toDouble / a.length
    }

    def update(key: (Int, Long), rows: Iterator[BandRow],
        state: GroupState[BucketState]): Iterator[NearDupPair] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var held = state.getOption.map(_.docs).getOrElse(Nil)
        val out = List.newBuilder[NearDupPair]
        var maxTsMs = Long.MinValue
        rows.toSeq.sortBy(r => (micros(r.ts), r.doc_id)).foreach { r =>
          maxTsMs = math.max(maxTsMs, r.ts.getTime)
          held.foreach { d =>
            if (d.docId != r.doc_id) {
              val est = agreement(d.sig, r.sig)
              if (est >= minEstJaccard)
                out += NearDupPair(
                  math.min(d.docId, r.doc_id), math.max(d.docId, r.doc_id), est)
            }
          }
          if (held.size < maxBucket && !held.exists(_.docId == r.doc_id))
            held = BucketDoc(r.doc_id, r.sig) :: held
        }
        state.update(BucketState(held))
        if (maxTsMs != Long.MinValue)
          state.setTimeoutTimestamp(maxTsMs + watermarkSec * 1000L)
        out.result().iterator
      }
    }

    entries.groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class Event(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  final case class SessionState(startUs: Long, endUs: Long, n: Int)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Streaming sessionization with custom state: one SessionState per
    * user, extended while events arrive within the gap, emitted when a
    * later event breaks the gap or the event-time timeout fires after
    * the watermark passes (the streaming twin of sessionizeBatch). */
  def sessionizeStream(events: Dataset[Event], gapSec: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L

    def update(user: Long, evs: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption
          .map(s => SessionOut(user, s.startUs, s.endUs, s.n)).iterator
        state.remove()
        out
      } else {
        var cur = state.getOption
        val closed = List.newBuilder[SessionOut]
        evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
          val t = micros(e.ts)
          cur = cur match {
            case Some(s) if t - s.endUs <= gapUs =>
              Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1))
            case Some(s) =>
              closed += SessionOut(user, s.startUs, s.endUs, s.n)
              Some(SessionState(t, t, 1))
            case None => Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close the open session once the watermark passes its gap
          state.setTimeoutTimestamp(s.endUs / 1000L + gapSec * 1000L)
        }
        closed.result().iterator
      }
    }

    events.withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-stream event-time interval join — the attribution shape
    * (each follow-event joined to the lead-events of the same user at
    * most `windowSec` before it). Both sides carry watermarks and the
    * join condition bounds f.ts to [l.ts, l.ts + window], so Spark's
    * stream-stream join can size and EXPIRE its state from the
    * condition: each side buffers only the watermark+window horizon,
    * never the stream's history — the stateful-join contract that
    * holds at any throughput. Inner join: a follow event with no lead
    * in the window drops (left-outer emits nulls only after the
    * watermark passes; same plan shape, flip joinType if needed). */
  def streamIntervalJoin(lead: DataFrame, follow: DataFrame,
      windowSec: Long, watermark: String = "1 hour"): DataFrame = {
    val l = lead.withWatermark("ts", watermark).select(
      col("user_id"), col("ts").as("lead_ts"),
      col("event_type").as("lead_type"), col("event_id").as("lead_id"))
    val f = follow.withWatermark("ts", watermark).select(
      col("user_id").as("__fu"), col("ts").as("follow_ts"),
      col("event_type").as("follow_type"), col("event_id").as("follow_id"))
    l.join(f,
      col("user_id") === col("__fu") &&
        col("follow_ts") >= col("lead_ts") &&
        col("follow_ts") <= col("lead_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select("user_id", "lead_id", "lead_type", "lead_ts",
        "follow_id", "follow_type", "follow_ts")
  }

  final case class FunnelState(ts: List[Long], masks: List[Int])
  final case class FunnelOut(user_id: Long, level: Int)

  /** Streaming windowFunnel — the streaming twin of
    * Behavior.windowFunnel's no-mode DP: per-user CONDITION events
    * buffer under the watermark (the c27 pre-filter discipline —
    * events hitting no condition never enter state), and when the
    * user goes quiet for `quietSec` of event time the buffered events
    * replay through the SAME latest-start fold and the final level
    * emits. Buffer-then-fold (not incremental fold) because the DP is
    * order-sensitive and events may arrive out of order within the
    * watermark; per-user state is O(condition events), identical to
    * the batch aggregate's collect state. */
  /** packed()'s (t, ord) sort key for a bitmask event list: ord is
    * the inverted-flag array compared lexicographically — bit 0 most
    * significant, hits-first — realized as descending on the
    * bit-reversed mask. Shared by every streaming behavioral twin so
    * the replay order is EXACTLY the batch fold's. */
  private def packedOrder(n: Int)(e: (Long, Int)): (Long, Int) =
    (e._1, -(Integer.reverse(e._2) >>> (32 - n)))

  def funnelStream(events: Dataset[Event], condTypes: Seq[String],
      windowSec: Long, quietSec: Long): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val n = condTypes.size
    val wUs = windowSec * 1000000L

    def levelOf(evs: Seq[(Long, Int)]): Int = {
      // sort = packedAgg's (t, ord) order (packedOrder above)
      val sorted = evs.sortBy(packedOrder(n))
      val acc = Array.fill[Option[Long]](n)(None)
      sorted.foreach { case (t, m) =>
        val old = acc.clone()
        for (k <- 0 until n) {
          val hit = (m & (1 << k)) != 0
          if (k == 0) {
            if (hit) acc(0) = Some(math.max(old(0).getOrElse(Long.MinValue), t))
          } else if (hit && old(k - 1).isDefined && t <= old(k - 1).get + wUs) {
            acc(k) = Some(math.max(old(k).getOrElse(Long.MinValue), old(k - 1).get))
          }
        }
      }
      acc.count(_.isDefined)
    }

    def update(user: Long, evs: Iterator[Event],
        state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(s =>
          FunnelOut(user, levelOf(s.ts.zip(s.masks)))).iterator
        state.remove()
        out
      } else {
        val fresh = evs.flatMap { e =>
          val m = condTypes.zipWithIndex
            .collect { case (c, i) if e.event_type == c => 1 << i }.sum
          if (m == 0) None else Some((micros(e.ts), m))
        }.toList
        if (fresh.nonEmpty || state.exists) {
          val s0 = state.getOption.getOrElse(FunnelState(Nil, Nil))
          val s = FunnelState(s0.ts ++ fresh.map(_._1), s0.masks ++ fresh.map(_._2))
          if (fresh.nonEmpty) state.update(s)
          // Spark clears the timeout on EVERY data invocation, so we
          // must re-arm even when only non-condition chatter arrived —
          // but clamped to watermark+1: the raw ts.max + quietSec can
          // be below the watermark once the user chatters past ~2x
          // quietSec, and an unclamped setTimeoutTimestamp then throws
          // and kills the whole query (r15 advice, medium).
          state.setTimeoutTimestamp(math.max(
            s.ts.max / 1000L + quietSec * 1000L,
            state.getCurrentWatermarkMs() + 1L))
        }
        Iterator.empty
      }
    }

    events.withWatermark("ts", s"$quietSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class SeqState(ts: List[Long], masks: List[Int])
  final case class SeqMatchOut(user_id: Long, matched: Int)
  final case class SeqCountOut(user_id: Long, n_chains: Int)

  /** Buffer-then-replay scaffold shared by the sequenceMatch and
    * sequenceCount streaming twins (the funnelStream shape): per-user
    * CONDITION events buffer under the watermark — events matching no
    * condition never enter state, packed()'s pre-filter — and when
    * the user goes quiet for `quietSec` of event time the buffer
    * replays through the batch DP in packed order. Buffer-then-fold
    * (not incremental) because the DPs are order-sensitive and events
    * arrive out of order within the watermark; per-user state is
    * O(condition events), the batch aggregate's own collect state. */
  private def bufferedReplay[O](events: Dataset[Event],
      condTypes: Seq[String], quietSec: Long)(
      replay: (Long, Seq[(Long, Int)]) => O)(
      implicit enc: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    import events.sparkSession.implicits._

    def update(user: Long, evs: Iterator[Event],
        state: GroupState[SeqState]): Iterator[O] = {
      if (state.hasTimedOut) {
        val out = state.getOption
          .map(s => replay(user, s.ts.zip(s.masks))).iterator
        state.remove()
        out
      } else {
        val fresh = evs.flatMap { e =>
          val m = condTypes.zipWithIndex
            .collect { case (c, i) if e.event_type == c => 1 << i }.sum
          if (m == 0) None else Some((micros(e.ts), m))
        }.toList
        if (fresh.nonEmpty || state.exists) {
          val s0 = state.getOption.getOrElse(SeqState(Nil, Nil))
          val s = SeqState(s0.ts ++ fresh.map(_._1), s0.masks ++ fresh.map(_._2))
          if (fresh.nonEmpty) state.update(s)
          // re-arm on every invocation (Spark clears the timeout),
          // clamped to watermark+1 — see funnelStream's comment.
          state.setTimeoutTimestamp(math.max(
            s.ts.max / 1000L + quietSec * 1000L,
            state.getCurrentWatermarkMs() + 1L))
        }
        Iterator.empty
      }
    }

    events.withWatermark("ts", s"$quietSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming sequenceMatch — the streaming twin of
    * Behavior.sequenceMatch, closing the behavioral family (funnel,
    * sessions, dedup all have stream forms; this was the last
    * batch-only member). `gapSec = None` replays the earliest-
    * completion fold (strict `t > prev` ordered-subsequence match);
    * `Some(g)` replays the (l1, l2) pair DP through the SAME compiled
    * kernel the batch plan calls (SeqMatchImpl.matchGap) — batch ≡
    * stream is pinned at the kernel, not re-derived. */
  def seqMatchStream(events: Dataset[Event], condTypes: Seq[String],
      gapSec: Option[Long], quietSec: Long): Dataset[SeqMatchOut] = {
    import events.sparkSession.implicits._
    val n = condTypes.size

    def matchedNoGap(evs: Seq[(Long, Int)]): Boolean = {
      // Behavior.sequenceMatch's None branch: acc(k) = EARLIEST
      // completion time of a level-(k+1) prefix; every level reads
      // the PRE-event snapshot (the transform's fold semantics)
      val acc = Array.fill[Option[Long]](n)(None)
      evs.sortBy(packedOrder(n)).foreach { case (t, m) =>
        val old = acc.clone()
        for (k <- 0 until n) {
          val hit = (m & (1 << k)) != 0
          if (k == 0) {
            if (hit) acc(0) = Some(math.min(old(0).getOrElse(Long.MaxValue), t))
          } else if (hit && old(k - 1).isDefined && t > old(k - 1).get)
            acc(k) = Some(math.min(old(k).getOrElse(Long.MaxValue), t))
        }
      }
      acc.forall(_.isDefined)
    }

    def matchedGap(g: Long, evs: Seq[(Long, Int)]): Boolean = {
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val rows = evs.sortBy(packedOrder(n)).map { case (t, m) =>
        val ms = new GenericArrayData(
          (0 until n).map(k => ((m & (1 << k)) != 0): Any).toArray)
        new GenericInternalRow(Array[Any](t, null, ms)): Any
      }.toArray
      graft.functions.SeqMatchImpl.matchGap(
        new GenericArrayData(rows), n, g * 1000000L)
    }

    bufferedReplay(events, condTypes, quietSec) { (user, evs) =>
      val ok = gapSec match {
        case None => matchedNoGap(evs)
        case Some(g) => matchedGap(g, evs)
      }
      SeqMatchOut(user, if (ok) 1 else 0)
    }
  }

  /** Streaming sequenceCount — the twin of Behavior.sequenceCount's
    * greedy non-overlapping DFA: scan in packed order with
    * (count, level, last-time) state; an event advances at most one
    * level (steps after the first strictly later in time), a
    * completed chain restarts the DFA. */
  def seqCountStream(events: Dataset[Event], condTypes: Seq[String],
      quietSec: Long): Dataset[SeqCountOut] = {
    import events.sparkSession.implicits._
    val n = condTypes.size
    bufferedReplay(events, condTypes, quietSec) { (user, evs) =>
      var cnt = 0
      var lvl = 0
      var lt = Long.MinValue
      evs.sortBy(packedOrder(n)).foreach { case (t, m) =>
        val hit = (m & (1 << lvl)) != 0
        if (hit && (lvl == 0 || t > lt)) {
          lvl += 1
          lt = t
          if (lvl == n) { cnt += 1; lvl = 0 }
        }
      }
      SeqCountOut(user, cnt)
    }
  }
}
