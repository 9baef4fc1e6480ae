package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// scratch micro-bench, not shipped
object ZPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.1")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"ZPERF $tag ${(System.nanoTime() - t0) / 1e9}")
    }
    def viaWindow() = {
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity", "l_extendedprice")
      val anyLi = t.lineitem.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("l_orderkey", "l_linenumber", "l_quantity")
      t.orders.join(anyLi, col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity")
        .orderBy("o_orderkey")
    }
    def viaMinStruct() = {
      val anyLi = t.lineitem.groupBy("l_orderkey")
        .agg(min(struct(col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))).as("__m"))
        .select(col("l_orderkey"), col("__m.l_linenumber").as("l_linenumber"),
          col("__m.l_quantity").as("l_quantity"))
      t.orders.join(anyLi, col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity")
        .orderBy("o_orderkey")
    }
    viaWindow().collect(); viaMinStruct().collect() // warmup
    (1 to 3).foreach { _ =>
      time("window") { viaWindow().write.format("noop").mode("overwrite").save() }
      time("minstruct") { viaMinStruct().write.format("noop").mode("overwrite").save() }
    }
    println("EQUAL " + (viaWindow().collect().toSeq == viaMinStruct().collect().toSeq))
    println("== minstruct plan ==")
    viaMinStruct().explain("formatted")
    spark.stop()
  }
}
