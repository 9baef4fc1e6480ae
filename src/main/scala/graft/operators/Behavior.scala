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
      conds: Seq[Column]): DataFrame =
    events
      .select(col(userCol).as("user"), unix_micros(tsCol).as("__t"),
        array(conds.map(_.cast("boolean")): _*).as("__ms"))
      .filter(exists(col("__ms"), m => m))
      .groupBy("user")
      .agg(sort_array(collect_list(struct(col("__t").as("t"),
        transform(col("__ms"), m => not(m)).as("ord"),
        col("__ms").as("ms")))).as("__evs"))

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
