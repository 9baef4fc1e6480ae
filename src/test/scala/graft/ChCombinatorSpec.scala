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

  test("-State/-Merge: two-level == one-level on every base") {
    GraftFunctions.ensureRegistered(spark)
    spark.sql("""SELECT * FROM VALUES
      ('a', 'x', 1, 10.5), ('a', 'x', 2, 20.0), ('a', 'y', 2, 30.0),
      ('b', 'x', 3, 5.25), ('b', 'y', 4, 1.0), ('b', 'y', 4, 2.5)
      AS t(g, sub, k, v)""").createOrReplaceTempView("sm_t")
    // states at (g, sub), merged to g — vs the direct one-level agg
    spark.sql(
      """SELECT g, sub,
        |  sumState(CAST(v AS DECIMAL(10,2))) AS ss, countState() AS cs,
        |  minState(v) AS mns, maxState(v) AS mxs,
        |  avgState(CAST(v AS DECIMAL(10,2))) AS avs,
        |  uniqExactState(k) AS ues, groupArrayState(k) AS gas,
        |  groupUniqArrayState(k) AS gus,
        |  sumIfState(CAST(v AS DECIMAL(10,2)), k >= 2) AS sis
        |FROM sm_t GROUP BY g, sub""".stripMargin)
      .createOrReplaceTempView("sm_states")
    val merged = spark.sql(
      """SELECT g, CAST(sumMerge(ss) AS DOUBLE) AS s, countMerge(cs) AS c,
        |  minMerge(mns) AS mn, maxMerge(mxs) AS mx,
        |  avgMerge(avs) AS av, uniqExactMerge(ues) AS ue,
        |  sort_array(groupArrayMerge(gas)) AS ga,
        |  sort_array(groupUniqArrayMerge(gus)) AS gu,
        |  CAST(sumIfMerge2(sis) AS DOUBLE) AS si
        |FROM sm_states GROUP BY g ORDER BY g""".stripMargin
        .replace("sumIfMerge2", "sumMerge")).collect()
    val direct = spark.sql(
      """SELECT g, CAST(SUM(CAST(v AS DECIMAL(10,2))) AS DOUBLE) AS s,
        |  COUNT(*) AS c, MIN(v) AS mn, MAX(v) AS mx,
        |  CAST(SUM(CAST(v AS DECIMAL(10,2))) AS DOUBLE) / COUNT(v) AS av,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS ue,
        |  sort_array(collect_list(k)) AS ga,
        |  sort_array(collect_set(k)) AS gu,
        |  CAST(SUM(CASE WHEN k >= 2 THEN CAST(v AS DECIMAL(10,2)) END)
        |    AS DOUBLE) AS si
        |FROM sm_t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("-MergeState re-merges losslessly (the MV-over-MV idiom)") {
    GraftFunctions.ensureRegistered(spark)
    // fine states → -MergeState to a mid key → -Merge to the top:
    // equal to merging the fine states directly
    spark.sql("""SELECT * FROM VALUES
      ('a', 'p', 'x', 1), ('a', 'p', 'y', 2), ('a', 'q', 'x', 3),
      ('b', 'q', 'y', 4), ('b', 'q', 'y', 6)
      AS t(top, mid, sub, v)""").createOrReplaceTempView("ms_t")
    spark.sql(
      """SELECT top, mid, sub, sumState(v) AS ss, countState() AS cs,
        |  avgState(v) AS avs, uniqExactState(v) AS ues
        |FROM ms_t GROUP BY top, mid, sub""".stripMargin)
      .createOrReplaceTempView("ms_fine")
    spark.sql(
      """SELECT top, mid, sumMergeState(ss) AS ss, countMergeState(cs) AS cs,
        |  avgMergeState(avs) AS avs, uniqExactMergeState(ues) AS ues
        |FROM ms_fine GROUP BY top, mid""".stripMargin)
      .createOrReplaceTempView("ms_mid")
    def fin(view: String) = spark.sql(
      s"""SELECT top, CAST(sumMerge(ss) AS BIGINT) AS s, countMerge(cs) AS c,
         |  CAST(avgMerge(avs) AS DOUBLE) AS av, uniqExactMerge(ues) AS ue
         |FROM $view GROUP BY top ORDER BY top""".stripMargin).collect().toSeq
    assert(fin("ms_mid") == fin("ms_fine"))
  }

  test("uniqState/uniqMerge: mergeable HLL sketch within rel error") {
    GraftFunctions.ensureRegistered(spark)
    spark.range(100000)
      .selectExpr("CAST(id % 64 AS STRING) AS sub", "id % 20000 AS v")
      .createOrReplaceTempView("u_t")
    val est = spark.sql(
      """SELECT uniqMerge(us) AS u FROM (
        |  SELECT sub, uniqState(v) AS us FROM u_t GROUP BY sub)""".stripMargin)
      .collect().head.getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05, s"estimate $est")
    // uniqMergeState stays a sketch: estimating it matches uniqMerge
    val est2 = spark.sql(
      """SELECT hll_sketch_estimate(uniqMergeState(us)) AS u FROM (
        |  SELECT sub, uniqState(v) AS us FROM u_t GROUP BY sub)""".stripMargin)
      .collect().head.getLong(0)
    assert(est2 == est)
  }

  test("-SimpleState is the plain mergeable value") {
    val r = row(
      """SELECT CAST(sumSimpleState(x) AS BIGINT) AS s, minSimpleState(x) AS mn,
        |  maxSimpleState(x) AS mx, CAST(sumSimpleStateIf(x, x > 1) AS BIGINT) AS si
        |FROM VALUES (1), (2), (3) AS t(x)""".stripMargin)
    assert(r.getAs[Long]("s") == 6L && r.getAs[Int]("mn") == 1 &&
      r.getAs[Int]("mx") == 3 && r.getAs[Long]("si") == 5L)
  }

  test("state/merge aggregates stay hash aggregates (partial-agg at both levels)") {
    GraftFunctions.ensureRegistered(spark)
    spark.range(100).selectExpr("id % 7 AS g", "id % 3 AS sub", "id AS v")
      .createOrReplaceTempView("hm_t")
    val df = spark.sql(
      """SELECT g, CAST(sumMerge(ss) AS BIGINT) AS s FROM (
        |  SELECT g, sub, sumState(v) AS ss FROM hm_t GROUP BY g, sub)
        |GROUP BY g""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(df.collect().map(_.getLong(1)).sum == 4950L)
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
