package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.{ChSql, GraftFunctions}
import graft.sources.Tables

/** Dev probe: cost ATTRIBUTION for c44_ch_seq_next (r12 verdict ask
  * #3). The plan already shares ONE collect_list buffer across the
  * three sequenceNextNode calls (dev/c44_plan_r13.txt), so the open
  * question is where the isolated ~2.7 s goes: the collect shuffle,
  * the per-group sort, or the three fold projections. Three ladders,
  * min-envelope over 3 shots after a warm-up (the ScaleProbe
  * discipline):
  *   collect — scan + shuffle + collect_list, size() only
  *   sorted  — + sort_array per group
  *   full    — the c44 battery (3 sequenceNextNode projections)
  *
  * Run: sbt "Test/runMain graft.tools.C44Probe [sfDir]"
  * Results: dev/c44_attrib_r13.txt
  */
object C44Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.ensureRegistered(spark)
    Tables(spark, sfDir).events.createOrReplaceTempView("events")

    def timed(label: String, sql: String, translate: Boolean): Unit = {
      def run(): Long = {
        val q = if (translate) ChSql.translate(sql) else sql
        spark.sql(q).queryExecution.toRdd.count()
      }
      run() // warm-up (codegen/JIT)
      val shots = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = run()
        (System.nanoTime() - t0, n)
      }
      val min = shots.map(_._1).min / 1e9
      println(f"[c44probe] $label%-8s min=$min%.3f s rows=${shots.head._2}")
    }

    timed("collect",
      """SELECT user_id, size(collect_list(
        |  named_struct('t', unix_micros(ts), 'ev', event_type))) AS n
        |FROM events GROUP BY user_id""".stripMargin, translate = false)
    timed("sorted",
      """SELECT user_id, size(sort_array(collect_list(
        |  named_struct('t', unix_micros(ts), 'ev', event_type)))) AS n
        |FROM events GROUP BY user_id""".stripMargin, translate = false)
    timed("full",
      """SELECT user_id,
        |  sequenceNextNode('forward', 'first_match')(ts, event_type,
        |    event_type != '', event_type = 'view', event_type = 'click') AS nxt,
        |  sequenceNextNode('forward', 'head')(ts, event_type,
        |    event_type != '', event_type = 'view') AS hd,
        |  sequenceNextNode('backward', 'tail')(ts, event_type,
        |    event_type != '', event_type = 'purchase') AS bk
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
      translate = true)
    spark.stop()
  }
}
