package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the r17 sf1→sf10 scale probe (verdict ask #2 — "the bar
  * is plans you'd want at 100×"). For each key, times `passes`
  * ALTERNATING passes over the given SF dirs in ascending order (the
  * smaller run doubles as the JVM/codegen warmup for the larger, the
  * r16 probe protocol; r19: multiple interleaved passes, gate takes
  * min() per leg, so a within-run ambient phase that lands between a
  * key's two legs — the r18b d09 artifact — cannot inflate a single
  * denominator). Noop sink so the full plan executes. Emits one CSV
  * line per (key, dir, pass) to stdout: `probe,key,dir,seconds`.
  *
  * Run: java -cp "classes:test-classes:spark-jars" (glob the jars)
  *   graft.tools.ScaleProbe /tmp/sf1,/tmp/sf10 d25_substring_dedup,… [passes]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(',').toSeq
    val keys = args(1).split(',').toSeq
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one cheap warmup: parquet reader + shuffle + codegen init
    try graft.SparkEntry.entry(spark)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .selectExpr("id % 9973 AS k", "id AS v")
        .groupBy("k").sum("v")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"probe,canary,-,${canary()}%.3f")
    for (key <- keys) {
      val fn = graft.SparkEntry.queries(key)
      for (_ <- 1 to passes; dir <- dirs) {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            Console.err.println(s"[probe] $key @ $dir FAILED: ${e.getMessage}")
            false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"probe,$key,$dir,${if (ok) dt else -1.0}%.3f")
        Console.out.flush()
      }
    }
    println(f"probe,canary,-,${canary()}%.3f")
    spark.stop()
  }
}
