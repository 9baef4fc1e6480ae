package graft

import graft.functions.GraftFunctions

/** Native -Map / -ForEach combinator kernels (MapAggNative): keyed
  * and positional reduction semantics, buffer merge across
  * partitions (serialize/deserialize path), key ordering, null and
  * variable-length behavior. */
class MapAggSpec extends SparkSpec {

  override val sfDir = "/root/testdata/sf0.001"

  private def ensure(): Unit = GraftFunctions.ensureRegistered(spark)

  test("sumMap/minMap/maxMap/avgMap/countMap keyed semantics") {
    ensure()
    spark.sql("""SELECT * FROM VALUES
      ('a', map('x', 1, 'y', 10)), ('a', map('x', 2)),
      ('a', map('z', 5)), ('b', map('x', 7))
      AS t(g, m)""").createOrReplaceTempView("mk_t")
    val rows = spark.sql(
      """SELECT g, sumMap(m) AS s, minMap(m) AS mn, maxMap(m) AS mx,
        |  avgMap(m) AS av, countMap(m) AS c
        |FROM mk_t GROUP BY g ORDER BY g""".stripMargin).collect()
    val a = rows(0)
    assert(a.getAs[Map[String, Long]]("s") == Map("x" -> 3L, "y" -> 10L, "z" -> 5L))
    assert(a.getAs[Map[String, Long]]("mn") == Map("x" -> 1L, "y" -> 10L, "z" -> 5L))
    assert(a.getAs[Map[String, Long]]("mx") == Map("x" -> 2L, "y" -> 10L, "z" -> 5L))
    assert(a.getAs[Map[String, Double]]("av") == Map("x" -> 1.5, "y" -> 10.0, "z" -> 5.0))
    assert(a.getAs[Map[String, Long]]("c") == Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
    assert(rows(1).getAs[Map[String, Long]]("s") == Map("x" -> 7L))
  }

  test("output keys sorted ascending; duplicate in-row keys reduce") {
    ensure()
    val r = spark.sql(
      """SELECT sumMap(array('b', 'a', 'b'), array(1, 2, 3)) AS s
        |FROM VALUES (1) AS t(x)""".stripMargin).collect().head
    // LinkedHashMap iteration is insertion order; eval must sort
    val asScala = r.getAs[Map[String, Long]]("s")
    assert(asScala == Map("a" -> 2L, "b" -> 4L))
    val df = spark.sql(
      "SELECT map_keys(sumMap(array('b','a','c'), array(1,1,1))) AS ks " +
        "FROM VALUES (1) AS t(x)")
    assert(df.collect().head.getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("fractional values emit DOUBLE; integral emit BIGINT") {
    ensure()
    val r = spark.sql(
      """SELECT sumMap(map('k', 1.5D)) AS fd, sumMap(map('k', 2)) AS il
        |FROM VALUES (1) AS t(x)""".stripMargin)
    val tpe = r.schema("fd").dataType.simpleString
    assert(tpe == "map<string,double>", tpe)
    assert(r.schema("il").dataType.simpleString == "map<string,bigint>")
  }

  test("merge path: many partitions agree with single partition") {
    ensure()
    val base = spark.range(10000).selectExpr(
      "id % 5 AS g",
      "map(CAST(id % 13 AS STRING), id % 101) AS m",
      "array(CAST(id % 7 AS DOUBLE), CAST(id % 3 AS DOUBLE)) AS a")
    base.repartition(32).createOrReplaceTempView("mp_many")
    base.coalesce(1).createOrReplaceTempView("mp_one")
    def agg(v: String) = spark.sql(
      s"""SELECT g, sumMap(m) AS s, maxMap(m) AS mx, sumForEach(a) AS f,
         |  avgForEach(a) AS af
         |FROM $v GROUP BY g ORDER BY g""".stripMargin).collect().toSeq
    assert(agg("mp_many") == agg("mp_one"))
  }

  test("forEach: variable lengths, nulls skipped, min/max identities") {
    ensure()
    spark.sql("""SELECT * FROM VALUES
      (array(1, 2, 3)), (array(10)), (array(NULL, 5))
      AS t(a)""").createOrReplaceTempView("fe_t")
    val r = spark.sql(
      """SELECT sumForEach(a) AS s, minForEach(a) AS mn,
        |  maxForEach(a) AS mx, countForEach(a) AS c
        |FROM fe_t""".stripMargin).collect().head
    assert(r.getSeq[Long](r.fieldIndex("s")) == Seq(11L, 7L, 3L))
    assert(r.getSeq[Long](r.fieldIndex("mn")) == Seq(1L, 2L, 3L))
    assert(r.getSeq[Long](r.fieldIndex("mx")) == Seq(10L, 5L, 3L))
    assert(r.getSeq[Long](r.fieldIndex("c")) == Seq(2L, 2L, 1L))
  }

  test("stays a hash aggregate (no sort-based fallback in the plan)") {
    ensure()
    spark.range(100).selectExpr("id % 3 AS g", "map('k', id) AS m")
      .createOrReplaceTempView("ha_t")
    val df = spark.sql("SELECT g, sumMap(m) AS s FROM ha_t GROUP BY g")
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs in ObjectHashAggregate — the
    // hash-based path with map-side partial aggregation
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(df.collect().length == 3)
  }
}
