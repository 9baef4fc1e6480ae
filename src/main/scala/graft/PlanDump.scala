package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted executed plan of registered query
  * keys — the `.explain` loop SURVEY §1 prescribes, runnable per key:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <key>[,key…]"
  *
  * Uses the same session config as Verify/Bench so the dumped plan is
  * the one those runs execute.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val keys: Seq[String] =
      if (args.length > 1) args(1).split(',').toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"===== $k =====")
      val df = SparkEntry.queries(k)(spark, sfDir)
      println(df.queryExecution.executedPlan.toString)
      spark.catalog.clearCache()
    }
  }
}
