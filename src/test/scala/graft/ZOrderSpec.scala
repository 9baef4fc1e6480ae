package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Tables

/** p11: the z-order layout's point is FILE-LEVEL locality on BOTH
  * dims — measured here, not argued: the same 2-D box query touches
  * far fewer files under the Morton layout than under the 1-D linear
  * layout (a file untouched here is a file whose parquet min/max
  * stats let a 100 TB scan skip it entirely). */
class ZOrderSpec extends SparkSpec {

  // ~15% of the partkey range x ~30% of the suppkey range (sf0.001
  // dims are partkey<=199, suppkey<=9) — a ~5%-area box, the locality
  // regime z-order exists for. (The registered p11 key uses a wider
  // box for row volume; the spec measures layout, not volume.)
  private val box =
    col("l_partkey").between(50, 80) && col("l_suppkey").between(2, 4)

  test("z-order confines a 2-D box to few files; linear spreads it; rows identical") {
    val li = Tables(spark, sfDir).lineitem
    val tmp = sys.props("java.io.tmpdir")
    val zPath = s"$tmp/graft_zorder_spec_z"
    val lPath = s"$tmp/graft_zorder_spec_l"
    // linear counterfactual sorted by l_orderkey — the natural
    // single-key layout, uncorrelated with either box dim
    Layout.zorderWrite(li, col("l_partkey"), col("l_suppkey"), zPath, 32)
    Layout.linearWrite(li, col("l_orderkey"), lPath, 32)

    def touched(path: String): Long =
      spark.read.parquet(path).filter(box)
        .select(input_file_name()).distinct().count()
    def rows(path: String): Set[(Long, Long)] =
      spark.read.parquet(path).filter(box)
        .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val zFiles = touched(zPath)
    val lFiles = touched(lPath)
    val expect = li.filter(box)
      .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(zPath) == expect && rows(lPath) == expect,
      "layout must never change query results")
    assert(zFiles < lFiles,
      s"z-order touched $zFiles files, linear $lFiles — no locality win")
    assert(zFiles <= 12, s"z-order box spread over $zFiles/32 files")
    assert(lFiles >= 20, s"counterfactual unexpectedly clustered: $lFiles/32")
  }

  test("morton16 interleaves bits exactly (matches the c45 recipe)") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var out = 0L
      for (i <- 0 until 16) {
        out |= (((a % 65536) >> i) & 1L) << (2 * i)
        out |= (((b % 65536) >> i) & 1L) << (2 * i + 1)
      }
      out
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (99999L, 3L))
    val got = cases.toDF("a", "b")
      .select(Layout.morton16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) },
      s"got $got")
  }
}
