package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.{ChDdl, ChWindowView, GraftFunctions}
import graft.streaming.EventsStream.Event

/** CREATE WINDOW VIEW end-to-end: the CH DDL parsed, the tumble/hop
  * calls rewritten onto Spark window(), the watermark strategy applied,
  * and finalized windows appended into the target table — the
  * reference's fire-at-watermark contract on Structured Streaming. */
class WindowViewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("DDL parses: TO target, BOUNDED watermark, tumble rewrite") {
    val wv = ChWindowView.create(spark,
      """CREATE WINDOW VIEW wv_parse TO wv_parse_t
        |WATERMARK=BOUNDED(INTERVAL '7' MINUTE) AS
        |SELECT tumbleStart(ts, INTERVAL '1' HOUR) AS ws, count() AS n
        |FROM wv_src GROUP BY tumble(ts, INTERVAL '1' HOUR)""".stripMargin)
    assert(wv.target == "wv_parse_t" && wv.baseTable == "wv_src")
    assert(wv.tsCol == "ts" && wv.delay == "7 minute")
    assert(wv.sparkSelect.contains("window.start"))
    assert(wv.sparkSelect.contains("window(ts, '1 hour')"))
    // hop maps with Spark's (size, slide) order; ASCENDING → no lateness
    val hop = ChWindowView.create(spark,
      """CREATE WINDOW VIEW wv_hop WATERMARK=ASCENDING AS
        |SELECT hopEnd(ts, INTERVAL '1' MINUTE, INTERVAL '5' MINUTE) AS we, count() AS n
        |FROM wv_src GROUP BY hop(ts, INTERVAL '1' MINUTE, INTERVAL '5' MINUTE)""".stripMargin)
    assert(hop.delay == "0 seconds")
    assert(hop.sparkSelect.contains("window(ts, '5 minute', '1 minute')"))
    assert(hop.sparkSelect.contains("window.end"))
  }

  test("window view fires finalized windows into the target on watermark") {
    implicit val ctx = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS wv_fire_t")
    // via the execute() front door, like any other CH DDL
    ChDdl.execute(spark,
      """CREATE WINDOW VIEW wv_fire TO wv_fire_t
        |WATERMARK=BOUNDED(INTERVAL '10' MINUTE) AS
        |SELECT tumbleStart(ts, INTERVAL '1' HOUR) AS ws, event_type, count() AS n
        |FROM wv_fire_src GROUP BY tumble(ts, INTERVAL '1' HOUR), event_type""".stripMargin)
    val wv = ChWindowView.get("wv_fire").get
    val input = MemoryStream[Event]
    val q = ChWindowView.start(spark, wv, input.toDF)
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "click", 1.0),
        Event(3, ts(30), 2, "view", 1.0))
      q.processAllAvailable()
      // watermark still inside [0,60) — target has nothing yet
      assert(!spark.catalog.tableExists("wv_fire_t") ||
        spark.table("wv_fire_t").count() == 0)
      // t=75 → watermark 65 ≥ window end 60 → [0,60) fires per type
      // (the emitting no-data micro-batch can lag one processAllAvailable)
      input.addData(Event(4, ts(75), 1, "click", 1.0))
      var tries = 0
      while (tries < 10 && (!spark.catalog.tableExists("wv_fire_t") ||
          spark.table("wv_fire_t").count() < 2)) {
        q.processAllAvailable(); tries += 1
      }
      val got = spark.table("wv_fire_t").orderBy("event_type")
        .as[(Timestamp, String, Long)].collect().toSeq
      assert(got == Seq((ts(0), "click", 2L), (ts(0), "view", 1L)), got)
      // a later-than-lateness event cannot resurrect the fired window
      input.addData(Event(5, ts(6), 1, "click", 1.0))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(spark.table("wv_fire_t").filter($"event_type" === "click")
        .select("n").as[Long].collect().toSeq == Seq(2L))
    } finally q.stop()
  }
}
