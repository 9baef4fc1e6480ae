package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds and has already changed a physical type once (events.ts went
  * TIMESTAMP(NANOS)→timestamp[us] mid-round-7, silently darkening 16
  * operators). This spec pins the POST-LOAD logical schema every graft
  * plan depends on, so a future regeneration fails here with one
  * readable message instead of 16 opaque analysis errors.
  */
class TestdataSchemaSpec extends SparkSpec {

  private def assertSchema(df: DataFrame, table: String,
                           expected: Seq[(String, DataType)]): Unit = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
    assert(actual == expected,
      s"\nTESTDATA DRIFT in `$table`:\n  expected ${expected.mkString(", ")}" +
      s"\n  actual   ${actual.mkString(", ")}" +
      s"\nIf the driver regenerated /root/testdata with new physical types, " +
      s"update sources/Tables.scala's loader (see the events.ts precedent) " +
      s"and then this spec.")
  }

  private val tb = Tables(spark, sfDir)

  test("events loads with ts as session TimestampType regardless of physical form") {
    assertSchema(tb.events, "events", Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("events raw parquet ts is a form the loader handles") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(raw),
      s"events.parquet ts arrived as $raw — Tables.events has no branch for it")
  }

  test("lineitem schema") {
    assertSchema(tb.lineitem, "lineitem", Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType))
  }

  test("orders schema") {
    assertSchema(tb.orders, "orders", Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
  }

  test("customer/supplier/part/nation/region schemas") {
    assertSchema(tb.customer, "customer", Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertSchema(tb.supplier, "supplier", Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertSchema(tb.part, "part", Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
    assertSchema(tb.nation, "nation", Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertSchema(tb.region, "region", Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
  }

  test("documents/embeddings schemas") {
    assertSchema(tb.documents, "documents", Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertSchema(tb.embeddings, "embeddings", Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
  }
}
