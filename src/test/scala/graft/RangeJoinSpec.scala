package graft

import graft.operators.RangeJoin

/** Edge cases for the binned range join: boundary inclusivity,
  * intervals spanning many bins, empty intervals, no-match points,
  * and equivalence with a reference nested-loop computation. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 0.0, 10.0),   // spans many bins at binSize=2
    (2L, 9.5, 12.0),   // overlaps interval 1
    (3L, 20.0, 20.0),  // empty [20, 20)
    (4L, 30.0, 31.0)
  ).toDF("band_id", "lo", "hi")

  private val points = Seq(
    (1L, 0.0),   // lo boundary → inclusive
    (2L, 10.0),  // hi of 1 (exclusive) but inside 2
    (3L, 20.0),  // empty interval → no match
    (4L, 25.0),  // covered by nothing
    (5L, 9.9)    // inside both 1 and 2
  ).toDF("point_id", "v")

  test("binned plan equals the reference nested-loop semantics") {
    for (binSize <- Seq(0.5, 2.0, 64.0)) {
      val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", binSize)
        .select("point_id", "band_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 1L), (2L, 2L), (5L, 1L), (5L, 2L)),
        s"binSize=$binSize got $got")
    }
  }

  test("no duplicate matches regardless of how many bins an interval spans") {
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 0.25)
      .select("point_id", "band_id").as[(Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, s"duplicates in $got")
  }

  test("long/short split: a domain-spanning interval matches identically via the broadcast path") {
    // interval 9 covers 4000 bins at binSize 0.25 — far past the
    // split threshold — so it rides the broadcast non-equi join while
    // the short ones keep the binned plan; the union must equal the
    // nested-loop truth, without duplicates
    val withLong = intervals.unionByName(
      Seq((9L, -100.0, 900.0)).toDF("band_id", "lo", "hi"))
    val got = RangeJoin.pointInInterval(points, "v", withLong, "lo", "hi", 0.25)
      .select("point_id", "band_id").as[(Long, Long)].collect().toSeq
    val expect = Set((1L, 1L), (2L, 2L), (5L, 1L), (5L, 2L),
      (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (5L, 9L))
    assert(got.toSet == expect, got.sorted.mkString(", "))
    assert(got.size == got.toSet.size, s"duplicates in $got")
    // threshold boundary: force EVERYTHING long — still exact
    val allLong = RangeJoin.pointInInterval(points, "v", withLong, "lo", "hi",
      0.25, maxBinsPerInterval = 1)
    assert(allLong.select("point_id", "band_id").as[(Long, Long)]
      .collect().toSet == expect)
  }

  test("long side past the broadcast cap falls back to a plain non-equi join, same rows") {
    // everything long (maxBinsPerInterval = 1) AND past the broadcast
    // cap (maxBroadcastLong = 2 < 5 intervals): the plan must drop the
    // broadcast hint rather than broadcast an unbounded long side —
    // results identical either way
    val withLong = intervals.unionByName(
      Seq((9L, -100.0, 900.0)).toDF("band_id", "lo", "hi"))
    val expect = Set((1L, 1L), (2L, 2L), (5L, 1L), (5L, 2L),
      (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (5L, 9L))
    val capped = RangeJoin.pointInInterval(points, "v", withLong, "lo", "hi",
      0.25, maxBinsPerInterval = 1, maxBroadcastLong = 2L)
    assert(capped.select("point_id", "band_id").as[(Long, Long)]
      .collect().toSet == expect)
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    val hints = capped.queryExecution.analyzed.collect {
      case j: Join => j.hint }
    assert(!hints.exists(_ != JoinHint.NONE),
      s"broadcast hint survived the cap: $hints")
  }
}
