package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: j12 range-join bin-width stress (verdict r13, ask #7).
  *
  * RangeJoin.pointInInterval explodes each interval into one row per
  * covered bin (`sequence(floor(lo/bin), floor(hi/bin))`). A LONG
  * interval therefore multiplies: width/binSize exploded rows, and
  * every one of them meets the points of its bin in the equi-join.
  * The question is where that blows up when interval lengths are
  * skewed (one interval covering the whole domain among thousands of
  * short ones), and whether a long/short split is needed.
  *
  * Run: sbt "Test/runMain graft.tools.RangeBinProbe [points] [shorts]"
  * (defaults 2M points on [0, 1e6), 5000 short intervals of width ~20
  * plus 5 domain-spanning ones; binSize swept so the long intervals
  * explode 1e2 .. 1e6 bins).
  */
object RangeBinProbe {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nShort = if (args.length > 1) args(1).toInt else 5000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val domain = 1000000.0
    val points = spark.range(0L, nPoints, 1L, 32)
      .select(col("id").as("pid"),
        (pmod(col("id") * 2654435761L, lit(1000000000L)) / 1000.0).as("v"))
      .persist()
    points.count()

    // nShort short intervals (width ~10-30) + 5 spanning the domain
    val shorts = spark.range(nShort).select(
      col("id").as("band_id"),
      (pmod(col("id") * 48271L, lit(999969L)) * 1.0).as("lo"))
      .withColumn("hi", col("lo") + 10.0 + pmod(col("band_id"), lit(21)))
    val longs = spark.range(5).select(
      (col("id") + 1000000L).as("band_id"),
      (col("id") * 1000.0).as("lo"),
      (lit(domain) - col("id") * 1000.0).as("hi"))
    val bands = shorts.unionByName(longs).persist()
    bands.count()

    def run(binSize: Double): (Long, Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.RangeJoin
        .pointInInterval(points, "v", bands, "lo", "hi", binSize)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      val exploded = bands.filter(col("lo") < col("hi"))
        .select(sum(floor(col("hi") / binSize).cast("long") -
          floor(col("lo") / binSize).cast("long") + 1L)).head().getLong(0)
      (n, secs, exploded)
    }

    println(f"RANGEPROBE points=$nPoints shorts=$nShort longs=5 domain=$domain")
    for (bin <- Seq(10000.0, 1000.0, 100.0, 10.0, 1.0)) {
      val (n, secs, exploded) = run(bin)
      println(f"RANGEPROBE bin=$bin%.1f matches=$n exploded_interval_rows=$exploded time=$secs%.2f s")
    }
    spark.stop()
  }
}
