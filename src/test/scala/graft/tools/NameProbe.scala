package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Dev tool: report which candidate ClickHouse function names resolve
  * in a graft session (builtin or injected) vs which are absent.
  * Run: sbt "Test/runMain graft.tools.NameProbe name1 name2 ..."
  */
object NameProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val reg = spark.sessionState.functionRegistry
    val missing = args.filterNot { n =>
      reg.functionExists(FunctionIdentifier(n)) ||
        reg.functionExists(FunctionIdentifier(n.toLowerCase))
    }
    println("MISSING: " + missing.mkString(" "))
    spark.stop()
  }
}
