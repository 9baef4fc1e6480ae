package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, Text}
import graft.sources.Tables

/** r19 scratch probe: stage-level timing of the d09 funnel. */
object FunnelProbe {
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
    val docs = graft.queries.fanOut(Tables(spark, dir).documents)
    // warm
    noop(docs)
    val scores = Text.langScores(col("text"))
    def scored = docs.select(
        col("doc_id"), col("text"),
        Text.predictedLang(scores).as("predicted"),
        Text.qualityScore(col("text")).as("quality"),
        Text.wsTokenCount(col("text")).as("n_tokens"),
        Text.fingerprint(col("text")).as("__fp"))
      .filter(col("predicted") === "en" && col("quality") >= 0.45)
    def exact = scored
      .groupBy("__fp")
      .agg(min(struct(col("doc_id"), col("text"), col("predicted"),
        col("quality"), col("n_tokens"))).as("__m"))
      .select(col("__m.doc_id").as("doc_id"), col("__m.text").as("text"),
        col("__m.predicted").as("predicted"),
        col("__m.quality").as("quality"),
        col("__m.n_tokens").as("n_tokens"))
    (1 to 2).foreach { i =>
      timed(s"scored pass$i")(noop(scored))
      timed(s"exact pass$i")(noop(exact))
      timed(s"pairs pass$i") {
        val p = Dedup.ngramJaccard(exact, "doc_id", "text", "predicted",
          3, 0.5, 1000)
        p.count(); p.unpersist(blocking = false)
      }
      timed(s"funnel pass$i") {
        val f = Curate.funnel(graft.queries.fanOut(Tables(spark, dir).documents), "doc_id", "text")
        noop(f.orderBy("doc_id"))
        f.unpersist(blocking = false)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
