package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 scratch probe: where q01/y01/a05's seconds go. */
object Q01Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(n: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"[q01probe] $n%-22s ${(System.nanoTime() - t) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def li = graft.sources.Tables(spark, dir).lineitem
    import graft.queries.{dec, rate, moneySum}
    noop(li) // warm
    (1 to 3).foreach { i =>
      timed(s"scan pass$i")(noop(li))
      timed(s"scan6 pass$i")(noop(li.select("l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")))
      timed(s"agg_double pass$i")(noop(
        li.filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")).as("a"),
            sum(col("l_extendedprice")).as("b"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
            count(lit(1)).as("n"))))
      timed(s"agg_decimal pass$i")(noop(
        li.filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(moneySum(col("l_quantity")).as("a"),
            moneySum(col("l_extendedprice")).as("b"),
            sum(dec(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
              .cast("double").as("c"),
            count(lit(1)).as("n"))))
      timed(s"q01_full pass$i")(noop(
        graft.SparkEntry.queries("q01_agg")(spark, dir)))
      timed(s"a05_full pass$i")(noop(
        graft.SparkEntry.queries("a05_quantile")(spark, dir)))
      timed(s"a05_qty_only pass$i")(noop(
        li.groupBy("l_returnflag")
          .agg(percentile(col("l_quantity"), lit(0.5)).as("m"))))
      timed(s"a05_price_only pass$i")(noop(
        li.groupBy("l_returnflag")
          .agg(percentile(col("l_extendedprice"), lit(0.5)).as("m"))))
    }
    spark.stop()
  }
}
