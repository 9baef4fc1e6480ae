package graft

import graft.functions.{ChCombinators, GraftFunctions}

/** Generated ClickHouse aggregate-combinator names (-If, -Array,
  * -Distinct, -OrNull, -OrDefault and their stacks) resolve through
  * spark.sql and match hand-computed semantics on a fixture. */
class ChCombinatorSpec extends SparkSpec {

  private def row(q: String): org.apache.spark.sql.Row = {
    GraftFunctions.ensureRegistered(spark)
    spark.sql(q).collect().head
  }

  override val sfDir = "/root/testdata/sf0.001"

  test("generation covers the stacked chains and skips hand-written names") {
    val names = ChCombinators.generated.map(_._1).toSet
    for (n <- Seq("sumArray", "sumArrayIf", "sumDistinct", "sumDistinctIf",
        "countIfOrNull", "countOrNullIf", "avgOrNullIf", "avgIfOrNull",
        "uniqExactIf", "groupArrayArray", "maxArrayIf", "sumOrDefault"))
      assert(names.contains(n), s"missing $n")
    for (n <- Seq("sumIf", "countIf", "avgIf", "minIf", "maxIf", "sum", "uniq"))
      assert(!names.contains(n), s"should not re-register $n")
  }

  test("-Array family: element aggregation via per-row folds") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("""SELECT * FROM VALUES
      ('a', array(1, 2, 3), 1), ('a', array(4), 2),
      ('b', array(), 3), ('b', array(10, 20), 4)
      AS t(k, xs, n)""").createOrReplaceTempView("arr_t")
    val r = row(
      """SELECT
        |  CAST(sumArray(xs) AS BIGINT) AS s,
        |  countArray(xs) AS c,
        |  CAST(avgArray(xs) AS DOUBLE) AS a,
        |  minArray(xs) AS mn, maxArray(xs) AS mx,
        |  CAST(sumArrayIf(xs, n <= 2) AS BIGINT) AS sif,
        |  sort_array(groupArrayArray(xs)) AS ga,
        |  sort_array(groupUniqArrayArray(xs)) AS gua
        |FROM arr_t""".stripMargin)
    assert(r.getAs[Long]("s") == 40L)
    assert(r.getAs[Long]("c") == 6L)
    assert(math.abs(r.getAs[Double]("a") - 40.0 / 6) < 1e-12)
    assert(r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx") == 20)
    assert(r.getAs[Long]("sif") == 10L)
    assert(r.getSeq[Int](r.fieldIndex("ga")) == Seq(1, 2, 3, 4, 10, 20))
    assert(r.getSeq[Int](r.fieldIndex("gua")) == Seq(1, 2, 3, 4, 10, 20))
  }

  test("-Distinct and stacked -DistinctIf") {
    val r = row(
      """SELECT
        |  CAST(sumDistinct(x) AS BIGINT) AS sd,
        |  CAST(sumDistinctIf(x, x < 3) AS BIGINT) AS sdi,
        |  countDistinct2(x) AS cd
        |FROM VALUES (1), (1), (2), (2), (3) AS t(x)""".stripMargin
        .replace("countDistinct2(x)", "uniqExact(x)"))
    assert(r.getAs[Long]("sd") == 6L)
    assert(r.getAs[Long]("sdi") == 3L)
    assert(r.getAs[Long]("cd") == 3L)
  }

  test("-OrNull / -OrDefault: empty accepted set, both suffix spellings") {
    val r = row(
      """SELECT
        |  countIfOrNull(x > 100) AS cn,
        |  countOrNullIf(x > 100) AS cn2,
        |  CAST(avgOrNullIf(x, x > 100) AS DOUBLE) AS an,
        |  CAST(avgIfOrNull(x, x > 100) AS DOUBLE) AS an2,
        |  CAST(sumIfOrDefault(x, x > 100) AS BIGINT) AS sd0,
        |  CAST(sumIfOrNull(x, x > 1) AS BIGINT) AS sn,
        |  uniqExactIf(x, x > 1) AS ue
        |FROM VALUES (1), (2), (3) AS t(x)""".stripMargin)
    assert(r.isNullAt(r.fieldIndex("cn")) && r.isNullAt(r.fieldIndex("cn2")))
    assert(r.isNullAt(r.fieldIndex("an")) && r.isNullAt(r.fieldIndex("an2")))
    assert(r.getAs[Long]("sd0") == 0L)
    assert(r.getAs[Long]("sn") == 5L)
    assert(r.getAs[Long]("ue") == 2L)
  }

  test("combinator aggregates stay whole-stage-codegen'd hash aggregates") {
    GraftFunctions.ensureRegistered(spark)
    spark.range(10).createOrReplaceTempView("r10")
    val df = spark.sql(
      "SELECT CAST(sumIfOrDefault(id, id > 3) AS BIGINT) AS s FROM r10")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(df.collect().head.getLong(0) == 39L)
  }
}
