package graft

import graft.functions.{ChDdl, GraftFunctions}

/** CREATE-list extras (ASTIndexDeclaration.h, ASTConstraintDeclaration.h)
  * and SHOW PROCESSLIST (ASTShowProcesslistQuery.h). */
class DdlExtrasSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("INDEX declarations parse and drop; CHECK constraints enforce on insert") {
    GraftFunctions.ensureRegistered(spark)
    ChDdl.execute(spark,
      """CREATE TABLE graft_cons (
        |  k Int64,
        |  v Float64,
        |  INDEX iv v TYPE minmax GRANULARITY 4,
        |  CONSTRAINT c_pos CHECK v >= 0
        |) ENGINE = MergeTree() ORDER BY (k)""".stripMargin)
    // the skip index is absorbed by the parquet layout — the table has
    // exactly the declared data columns
    assert(spark.table("graft_cons").schema.fieldNames.toSeq == Seq("k", "v"))
    // a clean batch inserts through both front doors
    ChDdl.execute(spark, "INSERT INTO graft_cons VALUES (1, 2.5), (2, 0.0)")
    assert(spark.table("graft_cons").count() == 2)
    // a violating batch is rejected whole, like the reference's
    // per-block constraint check
    val e = intercept[Exception] {
      ChDdl.execute(spark, "INSERT INTO graft_cons VALUES (3, -1.0)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("c_pos")), e.toString)
    assert(spark.table("graft_cons").count() == 2, "rejected batch must not land")
    // INSERT ... SELECT path enforces too
    val e2 = intercept[Exception] {
      ChDdl.parse(
        """CREATE TABLE graft_cons2 (k Int64, v Float64,
          |  CONSTRAINT c CHECK v < 10) ENGINE = MergeTree() ORDER BY (k)""".stripMargin)
        .tap(_.create(spark))
        .insertSelect(spark, Seq((1L, 50.0)).toDF("k", "v"))
    }
    assert(msgs(e2).exists(_.contains("constraint c violated")), e2.toString)
  }

  test("SHOW PROCESSLIST answers the reference's column shape with zero rows") {
    GraftFunctions.ensureRegistered(spark)
    val r = ChDdl.execute(spark, "SHOW PROCESSLIST")
    assert(r.schema.fieldNames.toSeq ==
      Seq("query_id", "user", "address", "query", "elapsed"))
    assert(r.count() == 0)
  }

  private implicit class Tap[A](a: A) {
    def tap(f: A => Unit): A = { f(a); a }
  }
}
