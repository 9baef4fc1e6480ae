package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the bare-quantile reservoir's scale contract, measured.
  *
  * The r13 verdict's one perf_weak was the exact percentile buffering
  * whole groups. The reservoir replaces it with ≤8192 samples per
  * group — so per-row cost and per-group state must stay FLAT as the
  * group grows. This probe sweeps one group from 100k to 12.8M rows
  * (128x) and reports wall time per run and ns/row; flat ns/row at a
  * 128x group is the bounded-state contract demonstrated, where the
  * exact percentile's sort would be O(n log n) with an O(n) buffer.
  *
  * Run: sbt "Test/runMain graft.tools.ReservoirScaleProbe"
  */
object ReservoirScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    def run(rows: Long, agg: String): Double = {
      spark.range(0L, rows, 1L, 32)
        .select((col("id") % 4).as("g"),
          (pmod(col("id") * 2654435761L, lit(1000000L)) / 7.0).as("v"))
        .createOrReplaceTempView("rs_probe")
      val sql = graft.functions.ChSql.translate(
        s"SELECT g, $agg AS q FROM rs_probe GROUP BY g")
      // min of 3 shots (GC noise only ever inflates)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    println("RESPROBE rows_per_group  reservoir_s  ns_per_row | exact_percentile_s")
    for (perGroup <- Seq(100000L, 400000L, 1600000L, 6400000L, 12800000L)) {
      val rows = perGroup * 4
      val rs = run(rows, "quantile(0.9)(v)")
      val ex = if (perGroup <= 1600000L)
        f"${run(rows, "quantileExact(v, 0.9)")}%.2f" else "-"
      println(f"RESPROBE $perGroup%11d  ${rs}%.2f s  ${rs * 1e9 / rows}%.1f ns/row | $ex s")
    }
    spark.stop()
  }
}
