package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-reader/shuffle init otherwise
    // lands on whichever query happens to run first (~6 s of noise)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink, not count(): count() lets Catalyst drop top-level
    // sorts/projections, flattering ORDER BY-heavy queries; noop
    // consumes every row of the real plan.
    // clearCache between queries: several operators persist
    // intermediates (signatures, grams, range partitions); 90+ queries
    // of accumulated cache in one session turns into GC pressure that
    // taxes whichever query runs late in the map order.
    // MEDIAN of `iters` full passes (the JVM is forked by sbt with a
    // fixed -Xmx): a single shot in a shared, pressured JVM swung
    // individual queries 4-8× run-to-run; the median pass-wise timing
    // is stable and GC hiccups land on one pass, not the report.
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    // one untimed FULL pass first: per-plan codegen/JIT and one-time
    // layout writes land here instead of skewing pass 1 of the stats
    pass()
    val passes = (1 to iters).map(_ => pass())
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    val results = SparkEntry.queries.keys.map { name =>
      name -> median(passes.map(_(name)))
    }.toMap
    // relative spread (max-min)/median per query — the stability
    // evidence for the reported medians
    val spreads = SparkEntry.queries.keys.map { name =>
      val xs = passes.map(_(name))
      val m = median(xs)
      if (m > 0) (xs.max - xs.min) / m else 0.0
    }.toSeq
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val medSpread = if (spreads.nonEmpty) median(spreads) else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters,"median_rel_spread":$medSpread}""")
    spark.stop()
  }
}
