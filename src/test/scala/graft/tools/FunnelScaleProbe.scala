package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, Multimodal}

/** Dev probe: LINEARITY of the composed funnels beyond sf0.1 (the r10
  * verdict's remaining honest caveat — d09/d13 "have still only ever
  * run at sf0.1") plus the m03 one-scan-vs-three claim at scale.
  *
  * Synthetic documents follow the funnel's gates: ~60-word docs whose
  * every 3rd token is an English stopword (lang-ID keeps 'en',
  * quality ≈ 0.6 ≥ 0.45), every 10th doc a near-dup of its
  * predecessor (drops the last 6 words), every 17th an EXACT copy
  * (same normalized fingerprint), 8 sources for the d13 mixing caps.
  * The ScaleProbe discipline applies: broadcast pinned off, min
  * envelope is the linearity statistic, warm-up shot dropped.
  * Results recorded in dev/scale_probe_r11.txt.
  *
  * Run: sbt "Test/runMain graft.tools.FunnelScaleProbe [baseDocs]"
  */
object FunnelScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDocs = if (args.nonEmpty) args(0).toInt else 50000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Int): DataFrame = {
      val stop = array(Seq("the", "and", "of", "to", "in", "is").map(lit): _*)
      spark.range(n.toLong).toDF("doc_id")
        .withColumn("__src",
          when(col("doc_id") % 17 === 16, col("doc_id") - 3) // exact dup
            .when(col("doc_id") % 10 === 9, col("doc_id") - 1) // near dup
            .otherwise(col("doc_id")))
        .withColumn("__len",
          when(col("doc_id") % 10 === 9 && col("doc_id") % 17 =!= 16,
            lit(54)).otherwise(lit(60)))
        .withColumn("text",
          array_join(transform(sequence(lit(0), col("__len") - 1), i =>
            when(i % 3 === 0,
              element_at(stop, (pmod(xxhash64(col("__src"), i), lit(6)) + 1)
                .cast("int")))
              .otherwise(concat(lit("w"),
                pmod(xxhash64(col("__src"), i), lit(5000))))), " "))
        .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(8))))
        .select("doc_id", "source", "text")
    }

    def timed(label: String)(f: => Long): Unit = {
      f // warm-up dropped (JIT/codegen)
      spark.catalog.clearCache()
      val shots = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = shots.map(_._1).sorted.apply(1)
      val mn = shots.map(_._1).min
      println(f"$label median $med%7.2f s  min $mn%7.2f s  " +
        f"(${shots.head._2} rows; " +
        shots.map(s => f"${s._1}%.2f").mkString("/") + ")")
    }

    val m03Only = args.contains("m03") // re-run just the m03 cells
    for (mult <- Seq(1, 2, 4)) {
      val n = baseDocs * mult
      val docs = corpus(n)
      if (!m03Only) timed(f"d09 curate_funnel  n=$n%7d") {
        val out = Curate.funnel(docs, "doc_id", "text")
        val c = out.count(); out.unpersist(); c
      }
      if (!m03Only) timed(f"d13 pretrain_e2e   n=$n%7d") {
        val out = Curate.pretrain(docs, "doc_id", "text", "source",
          isBench = col("doc_id") % 97 === 0,
          caps = Map("src0" -> 12, "src1" -> 12, "src2" -> 12, "src3" -> 0),
          defaultCap = 5)
        out.write.format("noop").mode("overwrite").save(); -1L
      }
      // m03 cache-vs-recompute: since r11 the SHIPPED binaryNearDup
      // does NOT cache the per-doc frame-hash sets (the r11 probe
      // measured recompute winning), so the shipped cell here is the
      // 3-planting recompute form and the TWIN persists the doc-set
      // frame — kept as the standing measurement that would flag the
      // regime flipping back. Blobs are ~4.5 KB (12× the text), the
      // real-multimodal regime, not the 0.4 KB text rows where the
      // scan is too cheap to matter.
      // PARQUET-BACKED media (not the in-memory synthetic): a re-scan
      // must pay real source IO, the term the doc-set cache exists to
      // save — regenerating the synthetic corpus from range()
      // arithmetic would undercharge the 3-scan variant
      val media = {
        val path = s"/tmp/m03probe_$n.parquet"
        Multimodal.asMedia(
          docs.withColumn("text", concat_ws(" ",
            (0 until 12).map(k => col("text")): _*)),
          "doc_id", "text")
          .write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
      timed(f"m03 shipped 3-scan n=$n%7d") {
        Multimodal.binaryNearDup(media, 32, 2, 100, 0.3)
          .write.format("noop").mode("overwrite").save(); -1L
      }
      timed(f"m03 cached twin    n=$n%7d") {
        val docSets = Multimodal.sampleFrames(media, 32, 2)
          .groupBy("doc_id")
          .agg(collect_set(col("frame_md5")).as("__gs"))
          .persist()
        try {
          val items = docSets.select(col("doc_id"), lit("*").as("__blk"),
            size(col("__gs")).as("__sz"), explode(col("__gs")).as("__g"))
          val m = classOf[Dedup.type].getDeclaredMethods
            .find(_.getName == "setJaccardPairs").get
          m.setAccessible(true)
          m.invoke(Dedup, items, "doc_id", Double.box(0.3), Int.box(100))
            .asInstanceOf[DataFrame]
            .write.format("noop").mode("overwrite").save()
        } finally docSets.unpersist()
        -1L
      }
    }
    spark.stop()
  }
}
