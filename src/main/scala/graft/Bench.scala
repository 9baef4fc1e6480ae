package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 4 interleaved passes: with ≥4 samples the spread below trims the
    // single best/worst shot, so one GC hiccup can't smear a key
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "4").toInt
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
    // a clean heap at each pass start keeps one pass's garbage from
    // taxing the next pass's first queries
    val passes = (1 to iters).map { _ => System.gc(); pass() }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    def relSpread(xs: Seq[Double]): Double = {
      // with ≥4 samples trim the single best/worst shot (a GC hiccup
      // or JIT deopt lands on ONE sample; untrimmed max-min only ever
      // grows with more samples, penalizing the re-measurement below)
      val s = xs.sorted
      val t = if (s.length >= 4) s.slice(1, s.length - 1) else s
      val m = median(xs)
      if (m > 0) (t.max - t.min) / m else 0.0
    }
    var samples: Map[String, Seq[Double]] =
      SparkEntry.queries.keys.map(n => n -> passes.map(_(n))).toMap
    // adaptive re-measurement: keys whose 3 interleaved shots disagree
    // re-run ALONE (fresh cache, no neighboring query's GC debris) and
    // pool the samples — noise gets more evidence, stable keys don't
    // pay for it
    val extraIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA", "4").toInt
    samples.keys.toSeq.sorted
      .filter(n => relSpread(samples(n)) > 0.3)
      .foreach { name =>
        val fn = SparkEntry.queries(name)
        System.gc()
        val extra = (1 to extraIters).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        samples += name -> (samples(name) ++ extra)
      }
    val results = samples.map { case (k, xs) => k -> median(xs) }
    val spreads = samples.valuesIterator.map(relSpread).toSeq
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val medSpread = if (spreads.nonEmpty) median(spreads) else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","iters":$iters,"median_rel_spread":$medSpread}""")
    spark.stop()
  }
}
