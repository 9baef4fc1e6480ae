package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup}
import graft.sources.Tables

/** r20 scratch probe: stage-level timing of the d13 pretrain pipeline
  * (funnel → decontaminate → mixSample) — r19's "not yet optimized"
  * item 5 said the decontaminate + mix stages were never attributed. */
object D13Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables(spark, dir).documents
    noop(docs) // warm
    val isBench = col("doc_id") % 97 === 0
    (1 to 2).foreach { i =>
      val corpus = docs.filter(!isBench)
      val bench = docs.filter(isBench)
      var kept: org.apache.spark.sql.DataFrame = null
      timed(s"funnel pass$i") { kept = Curate.funnel(corpus, "doc_id", "text") }
      val keptDocs = docs.select(col("doc_id"), col("source"), col("text"))
        .join(kept, Seq("doc_id"))
      timed(s"keptDocs join pass$i")(noop(keptDocs))
      val clean = Dedup.decontaminate(keptDocs, bench, "doc_id", "text",
          minOverlap = 5)
        .filter(!col("contaminated"))
        .drop("text", "n_hits", "contaminated")
      timed(s"decontaminate pass$i")(noop(clean))
      timed(s"mixSample pass$i")(noop(
        Curate.mixSample(clean, "doc_id", "source",
          Map("src0" -> 12, "src1" -> 12, "src2" -> 12, "src3" -> 0), 5)))
      kept.unpersist(blocking = false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
