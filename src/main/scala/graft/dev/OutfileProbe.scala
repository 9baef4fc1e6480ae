package graft.dev

import org.apache.spark.sql.SparkSession

/** r16 probe for the streamed INTO OUTFILE writers (r15 "what's
  * wrong" #1: the collect()-based writers held the ENTIRE result in
  * driver memory before the first byte hit disk).
  *
  * Run with a deliberately small heap — the result is built to be
  * several times larger than -Xmx, so the pre-r16 collect() path
  * could not have survived it:
  *
  *   SPARK_DRIVER_MEM=700m sbt "runMain graft.dev.OutfileProbe /tmp/probe_out"
  *   (700m is just above Spark's own 450m floor)
  *
  * Writes the same result through all three streamed writers (Native
  * block writer, RowBinary, TSV line render) and prints file sizes +
  * max heap; a run that completes IS the proof (driver memory stayed
  * one partition deep). Results recorded in dev/outfile_probe_r16.txt.
  */
object OutfileProbe {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "/tmp/graft_outfile_probe")
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxHeap = Runtime.getRuntime.maxMemory()
    println(s"[probe] max heap = ${maxHeap / (1 << 20)} MiB")
    // ~12M rows x ~120 B ≈ 1.4 GB of result — 2x+ the heap
    val df = spark.range(0L, 12000000L, 1L, 32)
      .selectExpr("id", "repeat('x', 100) AS s", "CAST(id AS DOUBLE) AS v")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    df.createOrReplaceTempView("probe_src")
    def run(name: String, fmt: String): Unit = {
      val p = outDir.resolve(name)
      java.nio.file.Files.deleteIfExists(p)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(p.toString + ".idx"))
      val t0 = System.nanoTime()
      graft.functions.ChDdl.execute(spark,
        s"SELECT * FROM probe_src INTO OUTFILE '$p' FORMAT $fmt")
      val dt = (System.nanoTime() - t0) / 1e9
      val sz = java.nio.file.Files.size(p)
      println(f"[probe] $fmt%-10s ${sz / (1 << 20)}%5d MiB in $dt%6.1f s " +
        f"(${sz.toDouble / maxHeap}%.1fx the heap)")
      require(sz > maxHeap,
        s"$fmt probe result smaller than the heap — not probative")
    }
    run("probe.native", "Native")
    run("probe.bin", "RowBinary")
    run("probe.tsv", "TSV")
    println("[probe] PASS — all three writers streamed a result " +
      "several times larger than the driver heap")
    spark.stop()
  }
}
