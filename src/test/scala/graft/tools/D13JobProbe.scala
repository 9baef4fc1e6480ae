package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev probe: per-job wall-clock breakdown of d13_pretrain_e2e (r12
  * verdict ask #8 — is the composed funnel's fixed overhead
  * reducible?). Prints one line per Spark job with duration, then the
  * total, after one warm-up run.
  *
  * Run: sbt "Test/runMain graft.tools.D13JobProbe [sfDir]"
  */
object D13JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("d13_pretrain_e2e")
    def run(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    run() // warm-up
    spark.catalog.clearCache()
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val starts = scala.collection.mutable.Map.empty[Int, (Long, Int)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (j.time, j.stageInfos.size)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, nStages) =>
          jobs += ((j.jobId, j.time - t0, nStages.toLong)) }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    spark.sparkContext.removeSparkListener(listener)
    jobs.sortBy(_._1).foreach { case (id, ms, st) =>
      println(f"[d13probe] job=$id%3d  ${ms / 1000.0}%6.2f s  stages=$st")
    }
    val sum = jobs.map(_._2).sum / 1000.0
    println(f"[d13probe] jobs=${jobs.size}  sum=$sum%.2f s  wall=$wall%.2f s  " +
      f"gap=${wall - sum}%.2f s (driver planning/between-job time)")
    spark.stop()
  }
}
