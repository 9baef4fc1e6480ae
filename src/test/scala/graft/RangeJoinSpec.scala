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
}
