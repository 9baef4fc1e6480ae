package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.date_trunc
import graft.operators.{AsOfJoin, AsOfJoinBucketed}

/** Edge cases for the union+last-value ASOF JOIN the r1 verdict asked
  * to pin: equal timestamps (backward-INCLUSIVE), empty right side,
  * keys without matches, and deterministic duplicate-(key,ts)
  * resolution. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("matches latest right row at-or-before each left timestamp") {
    val left = Seq((1L, t(10), "a"), (1L, t(20), "b"), (2L, t(15), "c"))
      .toDF("k", "lt", "tag")
    val right = Seq((1L, t(5), 100.0), (1L, t(15), 200.0), (2L, t(16), 300.0))
      .toDF("k", "rt", "price")
    val got = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"))
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(got == Map("a" -> Some(100.0), "b" -> Some(200.0), "c" -> None))
  }

  test("forward direction matches earliest right row at-or-after") {
    val left = Seq((1L, t(10), "a"), (1L, t(20), "b"), (2L, t(15), "c"))
      .toDF("k", "lt", "tag")
    val right = Seq((1L, t(10), 50.0), (1L, t(15), 200.0), (2L, t(10), 300.0))
      .toDF("k", "rt", "price")
    val got = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"), forward = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    // a: rt=10 >= lt=10 inclusive; b: nothing at/after 20; c: nothing
    assert(got == Map("a" -> Some(50.0), "b" -> None, "c" -> None))
  }

  test("equal timestamps are inclusive (ClickHouse ASOF <= semantics)") {
    val left = Seq((1L, t(10), "x")).toDF("k", "lt", "tag")
    val right = Seq((1L, t(10), 7.0)).toDF("k", "rt", "price")
    val got = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"))
      .select("price").as[Double].head()
    assert(got == 7.0)
  }

  test("strict bounds exclude equal-timestamp matches in both directions") {
    val left = Seq((1L, t(10), "a"), (1L, t(20), "b")).toDF("k", "lt", "tag")
    val right = Seq((1L, t(10), 100.0), (1L, t(15), 200.0)).toDF("k", "rt", "price")
    // backward strict (l.t > r.t): at lt=10 the rt=10 tie is excluded
    val back = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"), strict = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(back == Map("a" -> None, "b" -> Some(200.0)), back)
    // forward strict (l.t < r.t): at lt=10 it must skip to rt=15
    val fwd = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"),
        forward = true, strict = true)
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    assert(fwd == Map("a" -> Some(200.0), "b" -> None), fwd)
  }

  test("inner form drops left rows with no match; left form keeps them") {
    val left = Seq((1L, t(10), "a"), (2L, t(10), "b")).toDF("k", "lt", "tag")
    val right = Seq((1L, t(5), 1.0)).toDF("k", "rt", "price")
    val innerTags = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"), inner = true)
      .select("tag").as[String].collect().toSeq
    assert(innerTags == Seq("a"), innerTags)
    val leftTags = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"))
      .select("tag").as[String].collect().toSet
    assert(leftTags == Set("a", "b"))
  }

  test("empty right side keeps every left row with null payload") {
    val left = Seq((1L, t(1), "x"), (2L, t(2), "y")).toDF("k", "lt", "tag")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("k", "rt", "price")
    val got = AsOfJoin(left, right, "k", "lt", "rt", Seq("price"))
    assert(got.count() == 2)
    assert(got.filter("price IS NOT NULL").count() == 0)
  }

  test("bucketed hot-key form equals the plain form on real events") {
    import graft.sources.Tables
    val ev = Tables(spark, sfDir).events
    val clicks = ev.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_event_id"), $"user_id", $"ts")
    val plain = AsOfJoin(clicks, errors, "user_id", "ts", "ts", Seq("err_event_id"))
      .select("event_id", "err_event_id")
      .as[(Long, Option[Long])].collect().toMap
    val bucketed = AsOfJoinBucketed(clicks, errors, "user_id", "ts", "ts",
        Seq("err_event_id"), bucket = t => date_trunc("day", t))
      .select("event_id", "err_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(bucketed == plain,
      s"diff: ${bucketed.toSet.diff(plain.toSet).take(3)} / ${plain.toSet.diff(bucketed.toSet).take(3)}")
  }

  test("bucketed form: carry crosses empty and left-only buckets") {
    val left = Seq((1L, t(5), "x")).toDF("k", "lt", "tag")
      .union(Seq((1L, Timestamp.valueOf("2024-01-05 00:00:01"), "y")).toDF("k", "lt", "tag"))
    val right = Seq((1L, t(1), 7.0)).toDF("k", "rt", "price")
    val got = AsOfJoinBucketed(left, right, "k", "lt", "rt", Seq("price"),
        bucket = c => date_trunc("day", c))
      .select("tag", "price").as[(String, Option[Double])].collect().toMap
    // "y" lives 4 days (buckets) later with nothing in between — the
    // right payload must still carry across
    assert(got == Map("x" -> Some(7.0), "y" -> Some(7.0)))
  }

  test("duplicate (key, ts) right rows resolve deterministically to the max payload") {
    val left = Seq((1L, t(10), "x")).toDF("k", "lt", "tag")
    val right = Seq((1L, t(5), 1.0), (1L, t(5), 9.0), (1L, t(5), 4.0))
      .toDF("k", "rt", "price")
    val results = (1 to 5).map { _ =>
      AsOfJoin(left, right.repartition(3), "k", "lt", "rt", Seq("price"))
        .select("price").as[Double].head()
    }
    assert(results.toSet == Set(9.0), s"non-deterministic tie-break: $results")
  }
}
