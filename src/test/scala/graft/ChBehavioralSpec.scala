package graft

import graft.functions.{ChSql, GraftFunctions}
import graft.operators.Behavior
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The behavioral parametric aggregates' SQL surface
  * (functions/ChBehavioral) pinned row-for-row to the operator twins
  * (operators/Behavior) on the real events table, plus planted edge
  * fixtures for the pattern parser. */
class ChBehavioralSpec extends SparkSpec {
  import spark.implicits._

  private def chSql(q: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir).events.createOrReplaceTempView("events")
    spark.sql(ChSql.translate(q))
  }

  private lazy val ev = Tables(spark, sfDir).events

  /** SQL == operator, modulo the documented keyset difference: the
    * SQL surface's GROUP BY owns the group keyset, so users with ZERO
    * condition events appear there with the zero value, while the
    * operator (which filters before its groupBy) omits them. */
  private def pinned[T](sql: Seq[(Long, T)], op: Seq[(Long, T)],
      zero: T): Unit = {
    val opMap = op.toMap
    assert(opMap.keySet.subsetOf(sql.map(_._1).toSet),
      "operator emitted a user the SQL surface lost")
    sql.foreach { case (u, v) =>
      assert(opMap.getOrElse(u, zero) == v, s"user $u: sql=$v op=${opMap.get(u)}")
    }
  }

  test("windowFunnel SQL == operator on real events") {
    val sql = chSql(
      """SELECT user_id, windowFunnel(259200)(ts,
        |  event_type = 'view', event_type = 'click',
        |  event_type = 'purchase') AS level
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    val op = Behavior.windowFunnel(ev, "user_id", col("ts"), 259200000000L,
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"))
      .orderBy("user_id").as[(Long, Int)].collect().toSeq
    pinned(sql, op, 0)
  }

  test("behavioral collects carry the condition pre-filter (state bound)") {
    val df = chSql(
      """SELECT user_id, windowFunnel(10)(ts,
        |  event_type = 'view', event_type = 'click') AS level
        |FROM events GROUP BY user_id""".stripMargin)
    val agg = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    val hasFilteredCollect = agg.exists(_.aggregateExpressions.exists(_.exists {
      case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
        ae.filter.isDefined
      case _ => false
    }))
    assert(hasFilteredCollect,
      "collect_list must carry the exists(ms) FILTER so per-user state " +
        "is O(condition events):\n" + df.queryExecution.optimizedPlan)
  }

  test("sequenceMatch tie regression: same-t overwrite must not hide a match") {
    // gap-constrained, operator twin: cond1@0, cond2@2, cond2@5, cond3@5 —
    // the cond2@5 event overwrites the level-2 completion@2; cond3@5 must
    // still extend from the strictly-earlier @2 (latest-only DP returns 0)
    def tied(rows: (Long, Long, String)*) = rows
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))
    val conds3 = Seq(col("event_type") === "A", col("event_type") === "B",
      col("event_type") === "C")
    val gotOp = Behavior.sequenceMatch(
      tied((1L, 0L, "A"), (1L, 2L, "B"), (1L, 5L, "B"), (1L, 5L, "C")),
      "user_id", col("ts"), conds3, gapMicros = Some(10L))
      .select("matched").as[Int].head()
    assert(gotOp == 1, "gap DP lost the strictly-earlier completion at a tie")
    // SQL surface, plain pattern: cond1@3, cond1@5, cond2@5 — the A@5
    // overwrites A@3 in a latest-only DP; the strictly-increasing match
    // (A@3, B@5) must survive
    GraftFunctions.ensureRegistered(spark)
    tied((1L, 3L, "A"), (1L, 5L, "A"), (1L, 5L, "B"))
      .createOrReplaceTempView("events")
    val gotSql = spark.sql(ChSql.translate(
      """SELECT sequenceMatch('(?1).*(?2)')(ts,
        |  event_type = 'A', event_type = 'B') AS m
        |FROM events GROUP BY user_id""".stripMargin)).head().getInt(0)
    assert(gotSql == 1, "SQL DP lost the strictly-earlier completion at a tie")
    // strictness is intact: a fully-tied pair still refuses
    tied((1L, 5L, "A"), (1L, 5L, "B")).createOrReplaceTempView("events")
    val strict = spark.sql(ChSql.translate(
      """SELECT sequenceMatch('(?1).*(?2)')(ts,
        |  event_type = 'A', event_type = 'B') AS m
        |FROM events GROUP BY user_id""".stripMargin)).head().getInt(0)
    assert(strict == 0)
  }

  test("windowFunnel strict modes SQL == operator on real events") {
    val conds = Seq(col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase")
    for (mode <- Seq("strict_order", "strict_deduplication", "strict_increase")) {
      val sql = chSql(
        s"""SELECT user_id, windowFunnel(259200, '$mode')(ts,
           |  event_type = 'view', event_type = 'click',
           |  event_type = 'purchase') AS level
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
        .as[(Long, Int)].collect().toSeq
      val op = Behavior.windowFunnelModes(ev, "user_id", col("ts"),
          259200000000L, conds, Set(mode))
        .orderBy("user_id").as[(Long, Int)].collect().toSeq
      pinned(sql, op, 0)
      // a strict mode can only lower the level
      val base = Behavior.windowFunnel(ev, "user_id", col("ts"),
          259200000000L, conds)
        .orderBy("user_id").as[(Long, Int)].collect().toMap
      op.foreach { case (u, l) =>
        assert(l <= base(u), s"$mode raised user $u: $l > ${base(u)}")
      }
    }
    // unknown modes refuse loudly
    intercept[Exception](chSql(
      """SELECT user_id, windowFunnel(10, 'strict_nonsense')(ts,
        |  event_type = 'view') AS level
        |FROM events GROUP BY user_id""".stripMargin).collect())
  }

  test("retention SQL == operator on real events") {
    val sql = chSql(
      """SELECT user_id, retention(event_type = 'signup',
        |  event_type = 'click', event_type = 'purchase') AS r
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
      .as[(Long, Seq[Int])].collect().toSeq
    val op = Behavior.retention(ev, "user_id",
        Seq(col("event_type") === "signup", col("event_type") === "click",
          col("event_type") === "purchase"))
      .orderBy("user_id").as[(Long, Seq[Int])].collect().toSeq
    pinned(sql, op, Seq(0, 0, 0))
  }

  test("sequenceMatch SQL == operator, plain and gap-constrained") {
    val sqlPlain = chSql(
      """SELECT user_id, sequenceMatch('(?1).*(?2)')(ts,
        |  event_type = 'signup', event_type = 'purchase') AS matched
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    val opPlain = Behavior.sequenceMatch(ev, "user_id", col("ts"),
        Seq(col("event_type") === "signup", col("event_type") === "purchase"))
      .orderBy("user_id").as[(Long, Int)].collect().toSeq
    pinned(sqlPlain, opPlain, 0)

    val sqlGap = chSql(
      """SELECT user_id,
        |  sequenceMatch('(?1)(?t<=86400)(?2)(?t<=86400)(?3)')(ts,
        |    event_type = 'signup', event_type = 'click',
        |    event_type = 'purchase') AS matched
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    val opGap = Behavior.sequenceMatch(ev, "user_id", col("ts"),
        Seq(col("event_type") === "signup", col("event_type") === "click",
          col("event_type") === "purchase"), gapMicros = Some(86400000000L))
      .orderBy("user_id").as[(Long, Int)].collect().toSeq
    pinned(sqlGap, opGap, 0)
  }

  test("sequenceCount SQL == operator on real events") {
    val sql = chSql(
      """SELECT user_id, sequenceCount('(?1).*(?2)')(ts,
        |  event_type = 'signup', event_type = 'purchase') AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    val op = Behavior.sequenceCount(ev, "user_id", col("ts"),
        Seq(col("event_type") === "signup", col("event_type") === "purchase"))
      .orderBy("user_id").as[(Long, Int)].collect().toSeq
    pinned(sql, op, 0)
  }

  test("pattern parser: reordered refs, repeats, strict <, refusals") {
    import graft.functions.ChBehavioral.{parsePattern, Step}
    assert(parsePattern("(?2).*(?1)", 2) == Seq(Step(2, None), Step(1, None)))
    assert(parsePattern("(?1)(?t<=10)(?1)", 1) ==
      Seq(Step(1, None), Step(1, Some(10000000L))))
    assert(parsePattern("(?1)(?t<10)(?2)", 2) ==
      Seq(Step(1, None), Step(2, Some(9999999L))))
    intercept[IllegalArgumentException](parsePattern("(?3)", 2))
    intercept[UnsupportedOperationException](parsePattern("(?1)+(?2)", 2))
  }

  test("planted DFA edges through the SQL surface") {
    val rows = Seq((1L, 0L, "A"), (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "B"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))
    GraftFunctions.ensureRegistered(spark)
    rows.createOrReplaceTempView("events")
    val got = spark.sql(ChSql.translate(
      """SELECT sequenceCount('(?1).*(?2)')(ts,
        |  event_type = 'A', event_type = 'B') AS n,
        |  sequenceMatch('(?1).*(?2)')(ts,
        |  event_type = 'A', event_type = 'B') AS m
        |FROM events GROUP BY user_id""".stripMargin)).head()
    assert(got.getInt(0) == 1) // greedy DFA: A A B B is ONE chain
    assert(got.getInt(1) == 1)
  }
}
