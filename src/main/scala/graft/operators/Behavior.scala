package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse's behavioral-analytics aggregates (retention,
  * windowFunnel, sequenceMatch — the parametric event-sequence family
  * its AggregateFunction library is known for), realized Spark-first:
  *
  *  - per-user event sequences are gathered with ONE hash aggregate
  *    (collect_list of condition-events only — non-matching events
  *    never enter the state, exactly the reference's contract where
  *    pattern-irrelevant events are ignored);
  *  - the sequence scan is a deterministic `aggregate` fold over the
  *    time-sorted array — pure Catalyst lambdas, no UDF;
  *  - state per user is O(conditions), data per user is bounded by
  *    that user's condition-event count — the same memory contract
  *    the reference's implementation has, and the groupBy(user)
  *    shuffle is the only shuffle.
  */
object Behavior {

  /** retention(cond1, …, condN): per user, r[0] = cond1 ever held;
    * r[i] = cond1 AND cond_{i+1} both held (pairwise, unordered —
    * the reference's retention contract). */
  def retention(events: DataFrame, userCol: String,
      conds: Seq[Column]): DataFrame = {
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(c.cast("int")).as(s"__c$i")
    }
    events.groupBy(col(userCol))
      .agg(flags.head, flags.tail: _*)
      .select(col(userCol),
        array(col("__c0") +:
          (1 until conds.size).map(i => col("__c0") * col(s"__c$i")): _*)
          .as("r"))
  }

  /** Condition-events of one user as a time-sorted array of
    * (t: epoch-µs, ms: per-condition flags). Ties on t are ordered so
    * LOWER-indexed conditions process first (the `ord` field inverts
    * the flags: a cond1 hit [true,…] becomes [false,…], which sorts
    * ahead) — otherwise a same-timestamp progression (view and click
    * at one t) would fold click-before-view and miss the chain the
    * non-strict `t₂ ≥ t₁` contract counts. */
  private def packed(events: DataFrame, userCol: String, tsCol: Column,
      conds: Seq[Column], keepAll: Boolean = false): DataFrame = {
    val base = events
      .select(col(userCol).as("user"), unix_micros(tsCol).as("__t"),
        array(conds.map(_.cast("boolean")): _*).as("__ms"))
    // strict_order funnels must SEE condition-less events — they
    // interrupt the chain — so only they skip the state-bounding
    // pre-filter
    val kept = if (keepAll) base else base.filter(exists(col("__ms"), m => m))
    kept.groupBy("user")
      .agg(sort_array(collect_list(struct(col("__t").as("t"),
        transform(col("__ms"), m => not(m)).as("ord"),
        col("__ms").as("ms")))).as("__evs"))
  }

  private def nullLongs(n: Int): Column =
    array_repeat(lit(null).cast("long"), n)

  /** Reached levels in `acc` (prefix property: acc(k) set ⇒ acc(k-1)
    * set). */
  private def level(acc: Column): Column =
    size(filter(acc, x => x.isNotNull))

  /** windowFunnel(window)(ts, cond1, …, condN): max chain depth such
    * that cond1 … condK happened in (non-strict) time order, all
    * within `windowMicros` of the chain's FIRST event. Greedy fold:
    * acc(k) = latest viable chain START that has reached level k+1 —
    * keeping the latest start is optimal because the only constraint
    * (t ≤ start + window) is monotone in the start. */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: Column,
      windowMicros: Long, conds: Seq[Column]): DataFrame = {
    val n = conds.size
    val folded = packed(events, userCol, tsCol, conds)
      .select(col("user").as(userCol), aggregate(col("__evs"), nullLongs(n),
        (acc, e) => transform(sequence(lit(0), lit(n - 1)), k => {
          val t = e.getField("t")
          val hit = element_at(e.getField("ms"), k + 1)
          val prev = element_at(acc, k) // chain start at level k (1-based k)
          val cur = element_at(acc, k + 1)
          when(k === 0, when(hit, greatest(cur, t)).otherwise(cur))
            .otherwise(when(hit && prev.isNotNull &&
                t <= prev + lit(windowMicros),
              greatest(cur, prev)).otherwise(cur))
        })).as("__acc"))
    folded.select(col(userCol), level(col("__acc")).as("level"))
  }

  val funnelModes: Set[String] =
    Set("strict_order", "strict_deduplication", "strict_increase")

  /** windowFunnel with ClickHouse's documented strictness modes:
    *  - `strict_order`: once a chain has started, an event matching NO
    *    condition — or a condition whose previous level is unreached —
    *    interrupts further processing (levels already reached stand);
    *  - `strict_deduplication`: an event repeating a condition the
    *    chain already matched (beyond cond1, whose repeat is the
    *    normal chain restart) interrupts further processing;
    *  - `strict_increase`: chain steps must have strictly increasing
    *    timestamps. Per level the DP keeps (sA, lA, sB): the
    *    max-start chain's (start, last-step time) plus the best
    *    runner-up start among chains whose last step is strictly
    *    before lA — so at time t the best chain with last < t is A
    *    when lA < t and the runner-up when lA == t (the sequenceMatch
    *    pair-DP argument, lifted to (start, last) chains).
    * The default (no modes) path keeps its leaner latest-start fold. */
  def windowFunnelModes(events: DataFrame, userCol: String, tsCol: Column,
      windowMicros: Long, conds: Seq[Column],
      modes: Set[String]): DataFrame = {
    val bad = modes.diff(funnelModes)
    require(bad.isEmpty, s"unsupported windowFunnel mode(s): " +
      s"${bad.mkString(", ")} — supported: ${funnelModes.mkString(", ")}")
    if (modes.isEmpty)
      return windowFunnel(events, userCol, tsCol, windowMicros, conds)
    val n = conds.size
    val strictOrder = modes("strict_order")
    val strictDedup = modes("strict_deduplication")
    val strictInc = modes("strict_increase")
    val nullL = lit(null).cast("long")
    val initLv = array_repeat(
      struct(nullL.as("sA"), nullL.as("lA"), nullL.as("sB")), n)
    val init = struct(initLv.as("lv"), lit(false).as("dead"))
    val folded = packed(events, userCol, tsCol, conds, keepAll = strictOrder)
      .select(col("user").as(userCol), aggregate(col("__evs"), init,
        (acc, e) => {
          val t = e.getField("t")
          val ms = e.getField("ms")
          val lv = acc.getField("lv")
          val started = element_at(lv, 1).getField("sA").isNotNull
          val anyHit = exists(ms, m => m)
          def overUpper(body: Column => Column): Column =
            if (n == 1) lit(false)
            else exists(sequence(lit(1), lit(n - 1)), body)
          val outOfOrder = overUpper(k => element_at(ms, k + 1) &&
            element_at(lv, k).getField("sA").isNull)
          val dup = overUpper(k => element_at(ms, k + 1) &&
            element_at(lv, k + 1).getField("sA").isNotNull)
          // coalesce: a null condition value must read as "no signal",
          // not poison the dead flag through three-valued Or
          val deadNow = coalesce(acc.getField("dead") ||
            (if (strictOrder) (!anyHit && started) || outOfOrder
             else lit(false)) ||
            (if (strictDedup) dup else lit(false)), lit(false))
          val newLv = when(deadNow, lv)
            .otherwise(transform(sequence(lit(0), lit(n - 1)), k => {
              val hit = element_at(ms, k + 1)
              val curP = element_at(lv, k + 1)
              val sA = curP.getField("sA")
              val lA = curP.getField("lA")
              val prevP = element_at(lv, k)
              val candUp =
                if (strictInc)
                  when(prevP.getField("lA") < t, prevP.getField("sA"))
                    .otherwise(prevP.getField("sB"))
                else prevP.getField("sA")
              val cand = when(k === 0, t).otherwise(candUp)
              val ext = when(k === 0, hit).otherwise(hit &&
                cand.isNotNull && t <= cand + lit(windowMicros))
              val better = ext && (sA.isNull || cand > sA)
              when(better, struct(cand.as("sA"), t.as("lA"),
                when(lA < t, sA).otherwise(curP.getField("sB")).as("sB")))
                .otherwise(curP)
            }))
          struct(newLv.as("lv"), deadNow.as("dead"))
        }).as("__acc"))
    folded.select(col(userCol),
      size(filter(col("__acc").getField("lv"),
        p => p.getField("sA").isNotNull)).as("level"))
  }

  /** sequenceMatch('(?1).*(?2).*…')(ts, cond1, …, condN) for the
    * ordered-subsequence pattern family: does some strictly
    * time-increasing subsequence match cond1 … condN? DP fold:
    * acc(k) = EARLIEST completion time of a level-(k+1) prefix —
    * earliest is optimal for strict `<` extension.
    *
    * `gapMicros` adds the reference's time-conditioned pattern
    * `(?1)(?t<=N)(?2)`: each ADJACENT step must follow within N µs.
    * Under a gap constraint "earliest" is no longer optimal (a LATER
    * level-k completion can enable a level-k+1 step the earliest one
    * can't reach). "Latest" alone is ALSO not enough: with duplicate
    * timestamps the latest completion can sit AT the current event's
    * own time t, where strict `<` forbids extending from it, hiding a
    * strictly-earlier viable completion it overwrote. The constrained
    * DP therefore keeps a PAIR per level — (l1, l2) = latest
    * completion time and latest completion time strictly before l1.
    * Scanning time-ascending every stored completion is ≤ t, so "the
    * latest completion strictly before t" is l1 when l1 < t and l2
    * when l1 == t — and if ANY completion lies in [t-N, t), that
    * latest-before-t one does too. */
  def sequenceMatch(events: DataFrame, userCol: String, tsCol: Column,
      conds: Seq[Column], gapMicros: Option[Long] = None): DataFrame = {
    val n = conds.size
    val packedDf = packed(events, userCol, tsCol, conds)
    gapMicros match {
      case None =>
        val folded = packedDf
          .select(col("user").as(userCol), aggregate(col("__evs"), nullLongs(n),
            (acc, e) => transform(sequence(lit(0), lit(n - 1)), k => {
              val t = e.getField("t")
              val hit = element_at(e.getField("ms"), k + 1)
              val prev = element_at(acc, k)
              val cur = element_at(acc, k + 1)
              when(k === 0, when(hit, least(cur, t)).otherwise(cur))
                .otherwise(when(hit && prev.isNotNull && t > prev,
                  least(cur, t)).otherwise(cur))
            })).as("__acc"))
        folded.select(col(userCol),
          (level(col("__acc")) === n).cast("int").as("matched"))
      case Some(g) =>
        // compiled DP kernel (functions.SeqMatchGapExpr): one JVM
        // loop over the packed list — the interpreted per-event HOF
        // fold allocated an n-struct array per event (the a18 cost
        // mode, dev/a18_adjudicate_r14.txt); BehaviorSpec pins kernel
        // ≡ composed fold on fixtures and real events
        graft.functions.GraftFunctions.ensureRegistered(events.sparkSession)
        packedDf.select(col("user").as(userCol),
          call_function("seq_match_gap", col("__evs"), lit(n), lit(g))
            .cast("int").as("matched"))
    }
  }

  /** The pre-r14 composed Column fold of the gap variant — kept as
    * the parity oracle for the compiled kernel (BehaviorSpec). */
  private[graft] def sequenceMatchGapComposed(events: DataFrame,
      userCol: String, tsCol: Column, conds: Seq[Column],
      g: Long): DataFrame = {
    val n = conds.size
    val packedDf = packed(events, userCol, tsCol, conds)
    val nullL = lit(null).cast("long")
    val init = array_repeat(struct(nullL.as("l1"), nullL.as("l2")), n)
    val folded = packedDf
      .select(col("user").as(userCol), aggregate(col("__evs"), init,
        (acc, e) => transform(sequence(lit(0), lit(n - 1)), k => {
          val t = e.getField("t")
          val hit = element_at(e.getField("ms"), k + 1)
          val prevP = element_at(acc, k)
          val curP = element_at(acc, k + 1)
          val cl1 = curP.getField("l1")
          // latest level-k completion strictly before t (l2 < l1 ≤ t)
          val usable = when(prevP.getField("l1") < t,
            prevP.getField("l1")).otherwise(prevP.getField("l2"))
          val extend = when(k === 0, hit)
            .otherwise(hit && usable.isNotNull && t - usable <= lit(g))
          when(extend, struct(
            greatest(cl1, t).as("l1"),
            when(cl1.isNotNull && t > cl1, cl1)
              .otherwise(curP.getField("l2")).as("l2")))
            .otherwise(curP)
        })).as("__acc"))
    folded.select(col(userCol),
      (size(filter(col("__acc"), p => p.getField("l1").isNotNull)) === n)
        .cast("int").as("matched"))
  }

  /** sequenceCount('(?1).*(?2).*…')(ts, cond1, …, condN): how many
    * NON-OVERLAPPING chains match, scanning events in time order with
    * a single DFA — greedy first-match, restart after completion (an
    * event advances at most one level, never re-anchors an open
    * chain). Steps after the first must be strictly later in time.
    * The fold state is (count, current level, last matched time);
    * everything stays inside the per-user aggregate fold — one
    * shuffle, the sequenceMatch schedule. */
  def sequenceCount(events: DataFrame, userCol: String, tsCol: Column,
      conds: Seq[Column]): DataFrame = {
    val n = conds.size
    val init = struct(lit(0).as("cnt"), lit(0).as("lvl"),
      lit(Long.MinValue).as("lt"))
    packed(events, userCol, tsCol, conds)
      .select(col("user").as(userCol), aggregate(col("__evs"), init,
        (acc, e) => {
          val t = e.getField("t")
          val lvl = acc.getField("lvl")
          val hit = element_at(e.getField("ms"), lvl + 1)
          val advance = hit && (lvl === 0 || t > acc.getField("lt"))
          val newLvl = when(advance, lvl + 1).otherwise(lvl)
          val newLt = when(advance, t).otherwise(acc.getField("lt"))
          val complete = newLvl === n
          struct(
            (acc.getField("cnt") + when(complete, 1).otherwise(0)).as("cnt"),
            when(complete, 0).otherwise(newLvl).as("lvl"),
            newLt.as("lt"))
        }).getField("cnt").as("n_chains"))
  }
}
