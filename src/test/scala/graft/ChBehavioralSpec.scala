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
    assert(sql == op)
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
    assert(sql == op)
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
    assert(sqlPlain == opPlain)

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
    assert(sqlGap == opGap)
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
    assert(sql == op)
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
