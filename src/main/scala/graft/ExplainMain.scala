package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of a registered query —
  * `runMain graft.ExplainMain <key> [sfDir]`. AQE off so codegen
  * stars render (the PlanAuditSpec convention). */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("=== PLAN " + key + " ===")
    println(SparkEntry.queries(key)(spark, sfDir).queryExecution.executedPlan)
    println("=== END PLAN ===")
    spark.stop()
  }
}
