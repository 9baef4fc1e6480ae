package graft

import org.apache.spark.sql.SparkSession
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
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.1").lineitem
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"ZPERF $tag ${(System.nanoTime() - t0) / 1e9}")
    }
    def direct() = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        percentile(col("l_extendedprice"), lit(0.5)).as("median_price"))
      .orderBy("l_returnflag")
    def hist() = {
      val hq = li.groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("f"))
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5), col("f")).as("median_qty"),
          percentile(col("l_quantity"), lit(0.9), col("f")).as("p90_qty"))
      val hp = li.groupBy("l_returnflag", "l_extendedprice").agg(count(lit(1)).as("f"))
        .groupBy("l_returnflag")
        .agg(percentile(col("l_extendedprice"), lit(0.5), col("f")).as("median_price"))
      hq.join(hp, "l_returnflag").orderBy("l_returnflag")
    }
    // warmup both
    direct().collect(); hist().collect()
    (1 to 3).foreach { _ =>
      time("direct") { direct().write.format("noop").mode("overwrite").save() }
      time("hist") { hist().write.format("noop").mode("overwrite").save() }
    }
    println("EQUAL " + (direct().collect().toSeq == hist()
      .select("l_returnflag", "median_qty", "p90_qty", "median_price")
      .collect().toSeq))
    spark.stop()
  }
}
