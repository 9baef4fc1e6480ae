package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` output of registered query
  * keys to files — the plans/rN/<key>_{before,after}.txt evidence the
  * optimization rounds commit:
  *
  *   sbt "runMain graft.PlanSnap <sfDir> <outDir> <suffix> <key>[,key…]"
  *
  * Session config mirrors Bench (AQE on, shuffle.partitions = cpus) so
  * the captured plan is the one the bench executes.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val keys: Seq[String] =
      if (args.length > 3) args(3).split(',').toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // optional 5th arg "final": EXECUTE each query first (via its own
    // queryExecution, so AQE re-optimizes in place) and dump the
    // resulting isFinalPlan=true rendering — the evidence for runtime
    // effects the static plan can't show (stage/exchange reuse,
    // AQEShuffleRead coalescing, join-strategy changes). A noop write
    // would wrap the plan in a NEW command execution and leave the
    // dataframe's own adaptive plan un-finalized.
    val finalMode = args.length > 4 && args(4) == "final"
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      if (finalMode) df.queryExecution.toRdd.foreach(_ => ())
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${k}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      Console.err.println(s"[plansnap] wrote $k")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
