package graft

import graft.functions.{ChDdl, GraftFunctions}

/** SELECT-surface forms the reference parses that need NO rewrite —
  * Spark's grammar covers them natively and the translator's
  * byte-identity pass-through must keep it that way (a regression in
  * any rewrite pass would surface here): named WINDOW clause
  * (ASTSelectQuery window_list), GROUP BY ALL, EXCEPT ALL / INTERSECT
  * DISTINCT (SelectUnionMode.h), null-safe equality, tuple IN,
  * simple-CASE, correlated EXISTS. */
class SelectParitySpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("pass-through parity: named windows, GROUP BY ALL, set-op modifiers, tuple IN, EXISTS") {
    GraftFunctions.ensureRegistered(spark)
    Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)).toDF("k", "g", "v")
      .createOrReplaceTempView("sel_parity")
    val named = ChDdl.execute(spark,
      """SELECT k, sum(v) OVER w AS s FROM sel_parity
        |WINDOW w AS (PARTITION BY g ORDER BY k) ORDER BY k""".stripMargin)
      .as[(Int, Double)].collect().toSeq
    assert(named == Seq((1, 10.0), (2, 30.0), (3, 5.0)))
    assert(ChDdl.execute(spark,
      "SELECT g, count() AS n FROM sel_parity GROUP BY ALL ORDER BY g")
      .as[(String, Long)].collect().toSeq == Seq(("a", 2L), ("b", 1L)))
    assert(ChDdl.execute(spark,
      "SELECT k FROM sel_parity EXCEPT ALL SELECT k FROM sel_parity WHERE k = 1")
      .count() == 2)
    assert(ChDdl.execute(spark,
      "SELECT k FROM sel_parity INTERSECT DISTINCT SELECT k FROM sel_parity WHERE k < 3")
      .count() == 2)
    assert(ChDdl.execute(spark,
      "SELECT count() AS n FROM sel_parity a JOIN sel_parity b ON a.k IS NOT DISTINCT FROM b.k")
      .as[Long].head() == 3L)
    assert(ChDdl.execute(spark,
      "SELECT k FROM sel_parity WHERE (k, g) IN ((1, 'a'), (3, 'b')) ORDER BY k")
      .as[Int].collect().toSeq == Seq(1, 3))
    assert(ChDdl.execute(spark,
      "SELECT CASE g WHEN 'a' THEN 1 ELSE 0 END AS x FROM sel_parity")
      .as[Int].collect().sum == 2)
    assert(ChDdl.execute(spark,
      """SELECT k FROM sel_parity
        |WHERE EXISTS (SELECT 1 FROM sel_parity x WHERE x.k = sel_parity.k + 1)""".stripMargin)
      .count() == 2)
  }
}
