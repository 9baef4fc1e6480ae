package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Ivf}

/** Dev probe: ANN search cost vs corpus size beyond sf0.1 (5k
  * embedding rows there). Synthesizes deterministic float vectors at
  * 100k/200k/400k rows (20-80x the bench corpus) and times
  *  - brute-force cosine top-k (d05's shape: broadcast queries ×
  *    corpus scan), and
  *  - IVF search (d08's shape: assign to cells, probe nprobe/k of
  *    the corpus) — fit is done once per size OFF the clock (an index
  *    is trained once and amortized across every query batch; the
  *    registered keys cache it the same way via Ivf.fitted).
  * Expectations at scale: both linear in corpus size; IVF's slope
  * ~nprobe/k of brute's (it scores only the probed fraction), which
  * is the whole reason the IVF path exists. Results in
  * dev/scale_probe_r10.txt.
  *
  * Run: sbt "Test/runMain graft.tools.AnnScaleProbe [baseRows]"
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseRows = if (args.nonEmpty) args(0).toInt else 100000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 32
    /** Deterministic dense vectors: 16 clusters of ids share a
      * direction (so IVF cells are meaningful), plus per-id jitter. */
    def corpus(n: Int): DataFrame =
      spark.range(n.toLong).toDF("vec_id")
        .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
          d => (pmod(xxhash64(pmod(col("vec_id"), lit(16)), d), lit(1000))
            / 500.0 - 1.0
            + (pmod(xxhash64(col("vec_id"), d), lit(100)) / 500.0 - 0.1))
            .cast("float")))

    def timed(label: String)(f: => Long): Unit = {
      f // warmup dropped
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

    for (mult <- Seq(1, 2, 4)) {
      val n = baseRows * mult
      val docs = corpus(n)
      val queries = corpus(n).filter(col("vec_id") % (n / 100) === 0)
      // fit off the clock: the quantizer trains once per corpus (a
      // few KB of centroids) and serves every query batch after
      val model = Ivf.fit(docs, "vec_id", "embedding", k = 64,
        iterations = 3)
      timed(f"bruteTopK    n=$n%7d") {
        Ann.bruteTopK(docs, queries, "vec_id", "embedding", k = 10).count()
      }
      timed(f"ivfOneShot   n=$n%7d") {
        Ivf.search(docs, queries, "vec_id", "embedding", model,
          k = 10, nprobe = 4).count()
      }
      // the shipped-at-scale layout: assignment written ONCE as a
      // cell-partitioned parquet table (off the clock, like fit);
      // searches prune non-probed cells at the FILE level. Queries
      // from one id-cluster so the probed set is a small cell subset
      // (the online-serving shape); the one-shot twin runs the SAME
      // queries for a like-for-like read.
      val narrow = corpus(n).filter(pmod(col("vec_id"), lit(16)) === 0)
        .filter(col("vec_id") < 16L * 100)
      val path = sys.props("java.io.tmpdir") + s"/graft_ann_probe_$n"
      val idx = Ivf.buildIndexOnDisk(docs, "vec_id", "embedding", model, path)
      timed(f"ivfDiskIdx   n=$n%7d") {
        Ivf.searchIndexed(idx, narrow, "vec_id", "embedding",
          k = 10, nprobe = 4).count()
      }
      timed(f"ivfOneShotNw n=$n%7d") {
        Ivf.search(docs, narrow, "vec_id", "embedding", model,
          k = 10, nprobe = 4).count()
      }
      // r12 verdict ask #6: the file-level-pruning claim, MEASURED.
      // (Task input-metrics undercount parquet column-chunk reads by
      // >10x here, so the probe uses ground truth instead:) 1. the
      // executed scan must carry a __cell partition filter — i.e. the
      // probed-cell IN list prunes at PLANNING, before any file opens;
      // 2. bytes = on-disk size of the probed cells' partition dirs
      // (what a pruned scan can possibly touch) vs the whole index.
      locally {
        val res = Ivf.searchIndexed(idx, narrow, "vec_id", "embedding",
          k = 10, nprobe = 4)
        res.count()
        val plan = res.queryExecution.executedPlan.toString
        val pruned = "PartitionFilters: \\[[^\\]]*__cell".r
          .findFirstIn(plan).isDefined
        // the probed cell set, recomputed the way searchIndexed plants
        // its IN filter (top-nprobe cells per query, distinct)
        graft.functions.GraftFunctions.ensureRegistered(spark)
        val cellIds = narrow
          .select(call_function("cell_distances", col("embedding"),
            typedLit(model.centroids.map(_.toSeq).toSeq)).as("__d"))
          .select(explode(slice(array_sort(zip_with(col("__d"),
            sequence(lit(0), lit(model.k - 1)),
            (d, i) => struct(d.as("d"), i.as("i")))), 1, 4)).as("s"))
          .select(col("s.i").cast("int").as("c")).distinct()
          .collect().map(_.getInt(0)).toSet
        def dirBytes(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
        val root = new java.io.File(path)
        val total = dirBytes(root)
        val probedBytes = Option(root.listFiles).getOrElse(Array.empty)
          .filter(d => d.getName.startsWith("__cell=") &&
            cellIds(d.getName.stripPrefix("__cell=").toInt))
          .map(dirBytes).sum
        println(f"ivfDiskIdx bytes n=$n%7d partition-filter-in-plan=$pruned " +
          f"probedCells=${cellIds.size}/${model.k} " +
          f"probedBytes=$probedBytes%10d totalBytes=$total%10d " +
          f"frac=${probedBytes.toDouble / total}%.3f")
      }
    }
    spark.stop()
  }
}
