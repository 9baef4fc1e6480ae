package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** Planted-fixture semantics for the behavioral aggregates — the
  * window boundary, chain ordering, and latest-viable-start greediness
  * that the EXISTS-style DuckDB oracle (a15–a17) can't isolate. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))

  private val conds =
    Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")

  test("windowFunnel: window measured from the chain START, not the last step") {
    // A@0, B@8, C@12 with window 10: B is in-window, C is not (12 > 0+10)
    val df = ev((1L, 0L, "A"), (1L, 8L, "B"), (1L, 12L, "C"))
    val lvl = Behavior.windowFunnel(df, "user_id", col("ts"), 10L, conds)
      .select("level").as[Int].head()
    assert(lvl == 2)
  }

  test("windowFunnel: a LATER chain start rescues the full chain") {
    // chains: A@0 (B@8 in window, C@12 out) and A@5 (B@8, C@12 both in)
    val df = ev((1L, 0L, "A"), (1L, 5L, "A"), (1L, 8L, "B"), (1L, 12L, "C"))
    val lvl = Behavior.windowFunnel(df, "user_id", col("ts"), 10L, conds)
      .select("level").as[Int].head()
    assert(lvl == 3)
  }

  test("windowFunnel: steps must be in time order") {
    // B happens BEFORE any A → level stops at 1
    val df = ev((1L, 5L, "A"), (1L, 0L, "B"))
    val lvl = Behavior.windowFunnel(df, "user_id", col("ts"), 100L, conds)
      .select("level").as[Int].head()
    assert(lvl == 1)
  }

  test("windowFunnel: same-timestamp events chain in condition order (non-strict t₂ ≥ t₁)") {
    // A and B at the SAME microsecond: the non-strict contract counts
    // the progression; the fold must process A before B at the tie
    val df = ev((1L, 5L, "A"), (1L, 5L, "B"), (1L, 7L, "C"))
    val lvl = Behavior.windowFunnel(df, "user_id", col("ts"), 100L, conds)
      .select("level").as[Int].head()
    assert(lvl == 3, s"tied A/B must reach level 3, got $lvl")
    // all three tied: full chain still counted, in one pass
    val df3 = ev((2L, 9L, "A"), (2L, 9L, "B"), (2L, 9L, "C"))
    val lvl3 = Behavior.windowFunnel(df3, "user_id", col("ts"), 100L, conds)
      .select("level").as[Int].head()
    assert(lvl3 == 3, s"tied A/B/C must reach level 3, got $lvl3")
    // but strictness still holds for sequenceMatch: ties do NOT chain
    val m = Behavior.sequenceMatch(ev((3L, 5L, "A"), (3L, 5L, "B"), (3L, 5L, "C")),
      "user_id", col("ts"), conds).select("matched").as[Int].head()
    assert(m == 0)
  }

  test("sequenceMatch: strictly increasing three-step subsequence") {
    val yes = ev((1L, 0L, "A"), (1L, 1L, "X"), (1L, 2L, "B"), (1L, 3L, "C"))
    val tie = ev((2L, 0L, "A"), (2L, 0L, "B"), (2L, 3L, "C"))   // A,B same ts
    val out = ev((3L, 0L, "B"), (3L, 1L, "A"), (3L, 2L, "C"))   // B before A
    val got = Behavior.sequenceMatch(yes.union(tie).union(out),
        "user_id", col("ts"), conds)
      .orderBy("user_id").select("matched").as[Int].collect().toSeq
    assert(got == Seq(1, 0, 0))
  }

  test("gap-constrained sequenceMatch: compiled kernel ≡ composed fold") {
    // planted edges: in-gap chain, out-of-gap middle step, tie
    // timestamps, completion-after-t shadowing (l2 fallback), and a
    // level hit with no prior completion
    val fx = ev(
      (1L, 0L, "A"), (1L, 5L, "B"), (1L, 9L, "C"),    // all gaps ≤ 4? B-A=5 > 4 → no at g=4; yes at g=10
      (2L, 0L, "A"), (2L, 1L, "B"), (2L, 100L, "C"),  // C too late at g=10
      (3L, 0L, "A"), (3L, 0L, "B"), (3L, 1L, "C"),    // A,B tie: B needs A STRICTLY before
      (4L, 0L, "B"), (4L, 1L, "C"),                   // no A at all
      (5L, 0L, "A"), (5L, 2L, "A"), (5L, 3L, "B"),    // two As: l2 fallback
      (5L, 4L, "C"),
      (6L, 0L, "A"), (6L, 1L, "B"), (6L, 1L, "C"))    // B,C tie: C needs B strictly before
    for (g <- Seq(4L, 10L)) {
      val kern = Behavior.sequenceMatch(fx, "user_id", col("ts"), conds,
          gapMicros = Some(g))
        .orderBy("user_id").select("matched").as[Int].collect().toSeq
      val comp = Behavior.sequenceMatchGapComposed(fx, "user_id", col("ts"),
          conds, g)
        .orderBy("user_id").select("matched").as[Int].collect().toSeq
      assert(kern == comp, s"g=$g kernel $kern vs composed $comp")
    }
    // and on real data: the a18 shape over sf events
    val events = graft.sources.Tables(spark, sfDir).events
      .filter(col("event_type").isin("signup", "click", "purchase"))
    val cs = Seq(col("event_type") === "signup",
      col("event_type") === "click", col("event_type") === "purchase")
    val kern = Behavior.sequenceMatch(events, "user_id", col("ts"), cs,
        gapMicros = Some(86400000000L))
      .orderBy("user_id").select("user_id", "matched")
      .as[(Long, Int)].collect().toSeq
    val comp = Behavior.sequenceMatchGapComposed(events, "user_id",
        col("ts"), cs, 86400000000L)
      .orderBy("user_id").select("user_id", "matched")
      .as[(Long, Int)].collect().toSeq
    assert(kern == comp)
    assert(kern.nonEmpty && kern.exists(_._2 == 1) && kern.exists(_._2 == 0))
  }

  test("windowFunnel strict modes: order, deduplication, increase") {
    def lvl(rows: Seq[(Long, Long, String)], modes: Set[String],
        w: Long = 100L): Int =
      Behavior.windowFunnelModes(ev(rows: _*), "user_id", col("ts"), w,
        conds, modes).select("level").as[Int].head()
    val so = Set("strict_order")
    // A B D C: the D (no condition) interrupts — level stops at 2
    assert(lvl(Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "D"), (1L, 3L, "C")), so) == 2)
    // junk BEFORE the chain starts does not interrupt
    assert(lvl(Seq((1L, 0L, "D"), (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C")), so) == 3)
    // a junk event right after the first A kills later chains too
    assert(lvl(Seq((1L, 0L, "A"), (1L, 1L, "D"), (1L, 2L, "A"), (1L, 3L, "B")), so) == 1)
    // an out-of-order condition (C with level 2 unreached) interrupts
    assert(lvl(Seq((1L, 0L, "A"), (1L, 1L, "C"), (1L, 2L, "B"), (1L, 3L, "C")), so) == 1)
    // no modes behaves like the default fold on the same data
    assert(lvl(Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "D"), (1L, 3L, "C")),
      Set.empty) == 3)
    val sd = Set("strict_deduplication")
    // A B B C: the repeated B interrupts — level stops at 2
    assert(lvl(Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "B"), (1L, 3L, "C")), sd) == 2)
    // a repeated A is the normal chain restart, not an interrupt
    assert(lvl(Seq((1L, 0L, "A"), (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C")), sd) == 3)
    val si = Set("strict_increase")
    // tied A/B chain under the default, refused under strict_increase
    assert(lvl(Seq((1L, 5L, "A"), (1L, 5L, "B")), Set.empty) == 2)
    assert(lvl(Seq((1L, 5L, "A"), (1L, 5L, "B")), si) == 1)
    // a same-t repeat with the SAME chain start keeps the earlier
    // last-step time, so C@5 still extends
    assert(lvl(Seq((1L, 0L, "A"), (1L, 2L, "B"), (1L, 5L, "B"), (1L, 5L, "C")), si) == 3)
    // runner-up case: the A@3 chain's B lands AT t=5, overwriting the
    // max-start entry; C@5 must fall back to the A@0 chain whose B@2
    // is strictly earlier (kept as the runner-up)
    assert(lvl(Seq((1L, 0L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 5L, "B"),
      (1L, 5L, "C")), si) == 3)
    // strictly increasing chain passes untouched
    assert(lvl(Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "C")), si) == 3)
  }

  test("retention is pairwise and unordered") {
    // user 1: C before A — still counts (retention has no ordering)
    val df = ev((1L, 0L, "C"), (1L, 5L, "A"), (2L, 0L, "B"))
    val got = Behavior.retention(df, "user_id", conds)
      .orderBy("user_id").select("r").as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(1, 0, 1), Seq(0, 0, 0)))
  }

  test("sequenceCount: greedy non-overlapping DFA, no re-anchor") {
    def count(rows: (Long, Long, String)*): Int =
      Behavior.sequenceCount(ev(rows: _*), "user_id", col("ts"), conds.take(2))
        .select("n_chains").as[Int].head()
    // A A B B → ONE chain (the DFA holds its open A; the second B has
    // no open chain) — a max-matching would say 2; CH's scan says 1
    assert(count((1L, 0L, "A"), (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "B")) == 1)
    // alternating A B A B → two disjoint chains
    assert(count((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "A"), (1L, 3L, "B")) == 2)
    // B first never opens; trailing A stays open
    assert(count((1L, 0L, "B"), (1L, 1L, "A")) == 0)
    // strict time order within a chain: B at the SAME ts as its A
    // does not complete
    assert(count((1L, 0L, "A"), (1L, 0L, "B")) == 0)
  }

  test("sequenceCount: three-step chain counts and resets") {
    val df = ev((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "C"),
      (1L, 3L, "A"), (1L, 4L, "B"), (1L, 5L, "C"), (1L, 6L, "A"))
    val n = Behavior.sequenceCount(df, "user_id", col("ts"), conds)
      .select("n_chains").as[Int].head()
    assert(n == 2)
  }

  test("one groupBy is the only shuffle in the funnel plan") {
    val df = ev((1L, 0L, "A"))
    val plan = Behavior.windowFunnel(df, "user_id", col("ts"), 10L, conds)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }
}
