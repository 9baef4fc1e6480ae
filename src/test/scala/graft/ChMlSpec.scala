package graft

import org.apache.spark.sql.Row
import graft.functions.ChSql

/** ChMl: the deterministic closed-form realizations behind CH's
  * stochasticLinearRegression / stochasticLogisticRegression /
  * evalMLMethod, plus the sequenceNextNode chain aggregate. */
class ChMlSpec extends SparkSpec {
  import spark.implicits._

  private def sql1(q: String): Row =
    spark.sql(ChSql.translate(q)).collect().head

  test("linear fit recovers an exact linear relation (l2 = 0)") {
    Seq.tabulate(20)(i => (i.toDouble, 2.0 * i + 1.0))
      .toDF("x", "y").createOrReplaceTempView("ml_lin")
    val r = sql1(
      """SELECT stochasticLinearRegression(0.1, 0.0, 4, 'SGD')(y, x) AS st
        |FROM ml_lin""".stripMargin).getStruct(0)
    val w = r.getSeq[Double](1)
    assert(r.getString(0) == "linear")
    assert(math.abs(w(0) - 2.0) < 1e-9 && math.abs(w(1) - 1.0) < 1e-9)
  }

  test("two-feature fit matches the normal-equation hand solve, ridge shrinks") {
    // y = 3a - 2b + 5 exactly
    val rows = for (a <- 0 until 6; b <- 0 until 5)
      yield (a.toDouble, b.toDouble, 3.0 * a - 2.0 * b + 5.0)
    rows.toDF("a", "b", "y").createOrReplaceTempView("ml_lin2")
    val w0 = sql1(
      """SELECT stochasticLinearRegression(0.1, 0.0, 4, 'SGD')(y, a, b) AS st
        |FROM ml_lin2""".stripMargin).getStruct(0).getSeq[Double](1)
    assert(math.abs(w0(0) - 3.0) < 1e-9)
    assert(math.abs(w0(1) + 2.0) < 1e-9)
    assert(math.abs(w0(2) - 5.0) < 1e-9)
    val wr = sql1(
      """SELECT stochasticLinearRegression(0.1, 10.0, 4, 'SGD')(y, a, b) AS st
        |FROM ml_lin2""".stripMargin).getStruct(0).getSeq[Double](1)
    assert(math.abs(wr(0)) < math.abs(w0(0)) && math.abs(wr(1)) < math.abs(w0(1)))
  }

  test("d > 3 Gauss-Jordan path agrees with the Cramer path") {
    // 3 features forces the GJ fold; an exact relation checks it
    val rows = for (a <- 0 until 4; b <- 0 until 4; c <- 0 until 3)
      yield (a.toDouble, b.toDouble, c.toDouble,
        1.5 * a - 0.5 * b + 2.0 * c - 3.0)
    rows.toDF("a", "b", "c", "y").createOrReplaceTempView("ml_lin3")
    val w = sql1(
      """SELECT stochasticLinearRegression(0.1, 0.0, 4, 'SGD')(y, a, b, c) AS st
        |FROM ml_lin3""".stripMargin).getStruct(0).getSeq[Double](1)
    assert(math.abs(w(0) - 1.5) < 1e-9)
    assert(math.abs(w(1) + 0.5) < 1e-9)
    assert(math.abs(w(2) - 2.0) < 1e-9)
    assert(math.abs(w(3) + 3.0) < 1e-9)
  }

  test("logistic fit is the hand-computed single Newton step from zero") {
    val data = Seq((0.0, 0.0), (1.0, 0.0), (2.0, 1.0), (3.0, 1.0))
    data.toDF("x", "y").createOrReplaceTempView("ml_log")
    // sums: Sxx=14 Sx1=6 S11=4; b = Σx(y-.5)=2.0, Σ(y-.5)=0
    // A = [[14/4, 6/4],[6/4, 4/4]] (l2=0); solve A w = [2.0, 0]
    val a00 = 14.0 / 4; val a01 = 6.0 / 4; val a11 = 4.0 / 4
    val det = a00 * a11 - a01 * a01
    val ew0 = (2.0 * a11 - a01 * 0.0) / det
    val ew1 = (a00 * 0.0 - 2.0 * a01) / det
    val r = sql1(
      """SELECT stochasticLogisticRegression(0.1, 0.0, 4, 'SGD')(y, x) AS st
        |FROM ml_log""".stripMargin).getStruct(0)
    assert(r.getString(0) == "logistic")
    val w = r.getSeq[Double](1)
    assert(math.abs(w(0) - ew0) < 1e-9 && math.abs(w(1) - ew1) < 1e-9)
  }

  test("evalMLMethod applies the state: dot for linear, sigmoid for logistic") {
    Seq.tabulate(10)(i => (i.toDouble, 2.0 * i + 1.0))
      .toDF("x", "y").createOrReplaceTempView("ml_lin")
    val p = sql1(
      """SELECT evalMLMethod(
        |  stochasticLinearRegression(0.1, 0.0, 4, 'SGD')(y, x), 7.0) AS p
        |FROM ml_lin""".stripMargin).getDouble(0)
    assert(math.abs(p - 15.0) < 1e-9)
    Seq((0.0, 0.0), (1.0, 0.0), (2.0, 1.0), (3.0, 1.0))
      .toDF("x", "y").createOrReplaceTempView("ml_log")
    val q = sql1(
      """SELECT evalMLMethod(
        |  stochasticLogisticRegression(0.1, 0.0, 4, 'SGD')(y, x), 1.5) AS p
        |FROM ml_log""".stripMargin).getDouble(0)
    assert(q > 0.0 && q < 1.0)
    // symmetric data around x=1.5 ⇒ P(y|x=1.5) = 0.5 exactly
    assert(math.abs(q - 0.5) < 1e-9)
  }

  test("sequenceNextNode forward variants") {
    Seq(
      (1L, 1, "home"), (1L, 2, "view"), (1L, 3, "click"), (1L, 4, "pay"),
      (2L, 1, "view"), (2L, 2, "view"), (2L, 3, "click"), (2L, 4, "exit"),
      (3L, 1, "view"), (3L, 2, "exit")
    ).toDF("u", "k", "ev")
      .selectExpr("u", "timestamp_micros(k * 1000000) AS ts", "ev")
      .createOrReplaceTempView("snn")
    // first_match: the chain view→click anywhere; next node after it
    val fm = spark.sql(ChSql.translate(
      """SELECT u, sequenceNextNode('forward', 'first_match')(
        |  ts, ev, ev IS NOT NULL, ev = 'view', ev = 'click') AS nxt
        |FROM snn GROUP BY u ORDER BY u""".stripMargin)).collect()
    assert(fm.map(r => r.getLong(0) -> Option(r.getString(1))).toSeq ==
      Seq(1L -> Some("pay"), 2L -> Some("exit"), 3L -> None))
    // head: chain must start at the FIRST event
    val hd = spark.sql(ChSql.translate(
      """SELECT u, sequenceNextNode('forward', 'head')(
        |  ts, ev, ev IS NOT NULL, ev = 'view', ev = 'click') AS nxt
        |FROM snn GROUP BY u ORDER BY u""".stripMargin)).collect()
    assert(hd.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, None, None)) // u2's chain starts at event 2, not 1
  }

  test("sequenceNextNode backward tail and last_match") {
    Seq(
      (1L, 1, "a"), (1L, 2, "view"), (1L, 3, "click"), (1L, 4, "view"),
      (1L, 5, "click")
    ).toDF("u", "k", "ev")
      .selectExpr("u", "timestamp_micros(k * 1000000) AS ts", "ev")
      .createOrReplaceTempView("snn2")
    // backward tail: reversed list is click,view,click,view,a; the
    // chain click→view matches at position 1; next node is 'click'@3
    val bt = sql1(
      """SELECT sequenceNextNode('backward', 'tail')(
        |  ts, ev, ev IS NOT NULL, ev = 'click', ev = 'view') AS nxt
        |FROM snn2 GROUP BY u""".stripMargin)
    assert(bt.getString(0) == "click")
    // forward last_match of view→click: anchor at 4, no event after 5
    val lm = sql1(
      """SELECT sequenceNextNode('forward', 'last_match')(
        |  ts, ev, ev IS NOT NULL, ev = 'view', ev = 'click') AS nxt
        |FROM snn2 GROUP BY u""".stripMargin)
    assert(lm.isNullAt(0))
  }

  test("tied-timestamp non-string events: both paths use the string tie-break") {
    // Two events at the SAME timestamp with int values 10 and 2:
    // '10' < '2' as strings, so the canonical order is [10, 2] on
    // BOTH the shared-collect path (pure-ev conditions) and the baked
    // path (condition reads `flag`). Before r13 the shared path
    // sorted by the RAW int (2 < 10) and the two paths diverged.
    Seq((1L, 10, true), (1L, 2, true)).toDF("u", "ev", "flag")
      .selectExpr("u", "timestamp_micros(5000000) AS ts", "ev", "flag")
      .createOrReplaceTempView("snn_tie")
    val shar = spark.sql(ChSql.translate(
      """SELECT u, sequenceNextNode('forward', 'first_match')(
        |  ts, ev, ev IS NOT NULL, ev = 10) AS nxt
        |FROM snn_tie GROUP BY u""".stripMargin)).collect().head
    val baked = spark.sql(ChSql.translate(
      """SELECT u, sequenceNextNode('forward', 'first_match')(
        |  ts, ev, ev IS NOT NULL, ev = 10 AND flag) AS nxt
        |FROM snn_tie GROUP BY u""".stripMargin)).collect().head
    assert(shar.getString(1) == "2", "shared path: next after 10 is 2")
    assert(baked.getString(1) == "2", "baked path must agree")
  }

  test("sequenceNextNode fallback path: conditions reading other columns") {
    Seq((1L, 1, "view", 1), (1L, 2, "click", 0), (1L, 3, "view", 1),
      (1L, 4, "click", 1), (1L, 5, "pay", 0))
      .toDF("u", "k", "ev", "flag")
      .selectExpr("u", "timestamp_micros(k * 1000000) AS ts", "ev", "flag")
      .createOrReplaceTempView("snn4")
    // conds read BOTH ev and flag → the post-collect rebind must bow
    // out and the baked-entry path serve: the flagged view→click chain
    // first matches at k=3..4 (k=2's click has flag=0); next = 'pay'
    val r = sql1(
      """SELECT sequenceNextNode('forward', 'first_match')(
        |  ts, ev, ev IS NOT NULL, ev = 'view' AND flag = 1,
        |  ev = 'click' AND flag = 1) AS nxt
        |FROM snn4 GROUP BY u""".stripMargin)
    assert(r.getString(0) == "pay")
  }

  test("sequenceNextNode battery shares ONE collect buffer across calls") {
    Seq((1L, 1, "view"), (1L, 2, "click"), (1L, 3, "pay"))
      .toDF("u", "k", "ev")
      .selectExpr("u", "timestamp_micros(k * 1000000) AS ts", "ev")
      .createOrReplaceTempView("snn5")
    val df = spark.sql(ChSql.translate(
      """SELECT u,
        |  sequenceNextNode('forward', 'first_match')(
        |    ts, ev, ev != '', ev = 'view', ev = 'click') AS a,
        |  sequenceNextNode('forward', 'head')(
        |    ts, ev, ev != '', ev = 'view') AS b,
        |  sequenceNextNode('backward', 'tail')(
        |    ts, ev, ev != '', ev = 'pay') AS c
        |FROM snn5 GROUP BY u""".stripMargin))
    // event-only conditions rebind post-collect, so all three calls
    // collect the identical (t, ev) struct and the planner dedupes to
    // ONE aggregate function: the executed plan carries exactly one
    // partial + one final collect_list
    val plan = df.queryExecution.executedPlan.toString
    val n = "collect_list\\(".r.findAllIn(plan).length
    assert(n == 2, s"expected 1 shared collect (partial+final), plan has $n:\n$plan")
    val row = df.collect().head
    assert(row.getString(1) == "pay" && row.getString(2) == "click" &&
      row.getString(3) == "click")
  }

  test("sequenceNextNode refuses invalid parameter pairs") {
    Seq((1L, 1, "a")).toDF("u", "k", "ev")
      .selectExpr("u", "timestamp_micros(k * 1000000) AS ts", "ev")
      .createOrReplaceTempView("snn3")
    val e = intercept[Exception] {
      spark.sql(ChSql.translate(
        """SELECT sequenceNextNode('backward', 'head')(
          |  ts, ev, true, ev = 'a') AS nxt
          |FROM snn3 GROUP BY u""".stripMargin)).collect()
    }
    assert(e.getMessage.contains("head goes with forward") ||
      e.getCause != null)
  }
}
