package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Ivf, Pq}

/** r16 quality-at-scale probe: does ANN RECALL survive 10x data, and
  * at what candidate-work cost? The correctness keys pin determinism
  * and hash-exactness of the scoring; this measures the QUALITY knob
  * the 100 TB story rests on — recall@5 vs the exact brute-force
  * baseline for LSH, IVF, and IVF-PQ, at sf0.1 and at the r15 Sf1Gen
  * 10x corpus, with the fraction of the corpus each method actually
  * scored (candidate work) alongside.
  *
  *   sbt 'Test/runMain graft.tools.RecallProbe /root/testdata/sf0.1 /tmp/sf1'
  *
  * Results recorded in dev/recall_probe_r16.txt. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    args.foreach { dir =>
      val e = graft.sources.Tables(spark, dir).embeddings
        .select("vec_id", "embedding").cache()
      val n = e.count()
      val q = e.filter(col("vec_id") < 50)
      val k = 5
      val exact = pairs(Ann.bruteTopK(e, q, "vec_id", "embedding", k))
      println(f"[recall] $dir corpus=$n%d queries=50 k=$k (exact pairs=${exact.size})")

      def report(name: String, got: Set[(Long, Long)], workFrac: Double): Unit = {
        val r = got.intersect(exact).size.toDouble / exact.size
        println(f"[recall]   $name%-12s recall@5=$r%.3f  candidate-work=$workFrac%.3f of corpus")
      }

      // LSH: candidate fraction measured DIRECTLY (k = n returns the
      // whole ranked candidate set) — a recall number without its
      // work number is vacuous
      for (bits <- Seq(4, 8)) {
        val all = Ann.lshTopK(e, q, "vec_id", "embedding",
          k = n.toInt, dim = 64, bits = bits).count()
        val frac = all.toDouble / (50.0 * (n - 1))
        report(s"lsh b=$bits",
          pairs(Ann.lshTopK(e, q, "vec_id", "embedding", k, dim = 64,
            bits = bits)), frac)
      }

      // IVF (d08's knobs): nprobe/k cells scored exactly
      val ivf = Ivf.fit(e, "vec_id", "embedding", k = 16)
      for (nprobe <- Seq(2, 4)) {
        report(s"ivf@$nprobe",
          pairs(Ivf.search(e, q, "vec_id", "embedding", ivf, k, nprobe)),
          nprobe / 16.0)
      }

      // IVF-PQ (d20's knobs): same probed fraction, ADC-coded scoring.
      // Two readings: vs EXACT (includes PQ quantization error — the
      // isotropic worst case) and vs full ADC (probing loss only, the
      // AnnSpec-pinned metric).
      val pq = Pq.fit(e, "vec_id", "embedding")
      val adc = pairs(Pq.searchAdc(e, q, "vec_id", "embedding", pq, k))
      for (nprobe <- Seq(2, 4)) {
        val got = pairs(
          Pq.searchIvfAdc(e, q, "vec_id", "embedding", ivf, pq, k, nprobe))
        report(s"ivfpq@$nprobe", got, nprobe / 16.0)
        val ov = got.intersect(adc).size.toDouble / adc.size
        println(f"[recall]   ivfpq@$nprobe%-9s vs-full-ADC overlap=$ov%.3f (probing loss only)")
      }
      e.unpersist()
    }
    spark.stop()
  }
}
