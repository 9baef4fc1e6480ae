package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}
import graft.sources.Tables

/** Dev probe: attribute m03's r10 cost delta — complete-release
  * materialization vs the lazy leak-y variant, at sf0.1.
  * Run: sbt "Test/runMain graft.tools.M03Probe"
  *
  * Measured (r10, local[32], sf0.1, warm shots): current 2.5-2.7 s,
  * lazy-leak 1.5-2.4 s, no-cache 1.2-3.3 s. Reading: the persist +
  * count of the pair frame costs ~0.5-1.0 s CONSTANT overhead at this
  * SF (persist machinery + one extra job), which is the whole m03
  * delta vs the r9 baseline. The trade is kept: the overhead is pair-
  * scale (vanishes relative to compute at corpus size), and the
  * doc-level hash-set cache it enables is mandatory at real
  * multimodal scale — one scan of the binary corpus instead of three
  * — while the complete release keeps long-lived sessions from
  * accumulating unreachable caches (ADVICE r9).
  */
object M03Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$label shot$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }

    def media = Multimodal.asMedia(Tables(spark, dir).documents, "doc_id", "text")

    time("current (persist+count pairs)") {
      Multimodal.binaryNearDup(media, 32, 2, 100, 0.3)
        .orderBy("id1", "id2")
        .write.format("noop").mode("overwrite").save()
    }

    // lazy variant: docSets persisted and LEAKED, pairs not materialized
    time("lazy-leak") {
      val docSets = Multimodal.sampleFrames(media, 32, 2)
        .groupBy("doc_id")
        .agg(collect_set(col("frame_md5")).as("__gs"))
        .persist()
      val items = docSets.select(col("doc_id"), lit("*").as("__blk"),
        size(col("__gs")).as("__sz"), explode(col("__gs")).as("__g"))
      val m = classOf[Dedup.type].getDeclaredMethods
        .find(_.getName == "setJaccardPairs").get
      m.setAccessible(true)
      val pairs = m.invoke(Dedup, items, "doc_id",
        Double.box(0.3), Int.box(100)).asInstanceOf[org.apache.spark.sql.DataFrame]
      pairs.orderBy("id1", "id2")
        .write.format("noop").mode("overwrite").save()
    }

    // no docSets cache at all: three replants recompute frames
    time("no-cache") {
      val docSets = Multimodal.sampleFrames(media, 32, 2)
        .groupBy("doc_id")
        .agg(collect_set(col("frame_md5")).as("__gs"))
      val items = docSets.select(col("doc_id"), lit("*").as("__blk"),
        size(col("__gs")).as("__sz"), explode(col("__gs")).as("__g"))
      val m = classOf[Dedup.type].getDeclaredMethods
        .find(_.getName == "setJaccardPairs").get
      m.setAccessible(true)
      val pairs = m.invoke(Dedup, items, "doc_id",
        Double.box(0.3), Int.box(100)).asInstanceOf[org.apache.spark.sql.DataFrame]
      pairs.orderBy("id1", "id2")
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
