package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: substantiate d12's DELTA iteration (the r10 verdict's
  * item 3 — "the SkewProbe discipline for the component graph"). Two
  * planted graph shapes at 1M/4M nodes:
  *  - CHAINS of length 16 (diameter 15): the worst case for label
  *    propagation — the min label floods one hop per round, so full
  *    propagation re-joins the WHOLE label table against every edge
  *    for all ~15 rounds while the delta frontier collapses to the
  *    flood head;
  *  - STARS of fan 15 (diameter 2): converges in ~3 rounds either
  *    way — pins that delta costs nothing when there is nothing to
  *    skip.
  * Variants:
  *  - delta = the shipped Dedup.dupClusters (frontier-filtered probe);
  *  - full  = the same loop with the frontier filter REMOVED (every
  *    round joins the whole label table), isolating the delta effect
  *    from the r11 one-action/one-persist overhead fold.
  * Results recorded in dev/d12_probe_r11.txt.
  *
  * Run: sbt "Test/runMain graft.tools.D12Probe [baseNodes]"
  */
object D12Probe {
  def main(args: Array[String]): Unit = {
    val baseNodes = if (args.nonEmpty) args(0).toInt else 1000000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** c = n/len chains: edges (i, i+1) except at chain boundaries. */
    def chains(n: Int, len: Int): DataFrame =
      spark.range(n.toLong).toDF("id1")
        .filter(col("id1") % len =!= (len - 1))
        .withColumn("id2", col("id1") + 1)

    /** n/(fan+1) stars: hub h connects to h+1 .. h+fan. */
    def stars(n: Int, fan: Int): DataFrame =
      spark.range(n.toLong / (fan + 1)).toDF("h")
        .select((col("h") * (fan + 1)).as("hub"),
          explode(sequence(lit(1), lit(fan))).as("j"))
        .select(col("hub").as("id1"), (col("hub") + col("j")).as("id2"))

    /** dupClusters with the frontier filter removed — full
      * propagation, otherwise identical loop (same single action +
      * persist per round, so the timing difference IS the delta). */
    def fullPropagation(pairs: DataFrame, maxIters: Int = 40): DataFrame = {
      val e = pairs.select(col("id1").as("__a"), col("id2").as("__b"))
      val edges = e.union(e.select(col("__b").as("__a"), col("__a").as("__b")))
        .distinct().persist()
      // same per-round lineage truncation as the shipped operator
      // (plain persist doubles the analyzed plan per round — OOM at
      // diameter ~16, the very finding this probe surfaced)
      var labels = edges.select(col("__a").as("id1"))
        .distinct().withColumn("cluster_id", col("id1")).localCheckpoint(false)
      var converged = false
      var i = 0
      while (!converged && i < maxIters) {
        val prop = edges
          .join(labels.select(col("id1").as("__b"), col("cluster_id")), "__b")
          .groupBy(col("__a").as("id1")).agg(min("cluster_id").as("__new"))
        val next = labels.join(prop, Seq("id1"), "left")
          .select(col("id1"),
            least(coalesce(col("__new"), col("cluster_id")),
              col("cluster_id")).as("cluster_id"),
            coalesce(col("__new") < col("cluster_id"), lit(false)).as("__chg"))
          .localCheckpoint(false)
        converged = next.filter(col("__chg")).count() == 0
        labels = next.drop("__chg")
        i += 1
      }
      edges.unpersist()
      labels
    }

    def timed(label: String)(f: => Long): Unit = {
      f // warm-up shot dropped (JIT/codegen)
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

    // equivalence pin at a small size (DedupSpec pins semantics; this
    // pins delta ≡ full on BOTH probe shapes)
    for ((nm, g) <- Seq("chains" -> chains(100000, 16), "stars" -> stars(100000, 15))) {
      val d = Dedup.dupClusters(g).withColumnRenamed("cluster_id", "cd")
      val f = fullPropagation(g).withColumnRenamed("cluster_id", "cf")
      val diff = d.join(f, "id1").filter(col("cd") =!= col("cf")).count()
      require(diff == 0, s"$nm: delta and full disagree on $diff nodes")
      d.unpersist(); f.unpersist(); spark.catalog.clearCache()
      println(s"equivalence $nm: delta == full (0 diffs)")
    }

    /** The realistic near-dup shape: n/2 isolated PAIRS (converge in
      * round 1) plus ONE chain of length 16 that keeps the loop alive
      * for 15 rounds. Full propagation re-joins all 2·(n/2 + 16)
      * edges against the whole label table for every one of those
      * rounds; delta's frontier collapses to the chain's flood head
      * after round 1. */
    def mixed(n: Int): DataFrame = {
      val pairs = spark.range(n.toLong / 2).toDF("h")
        .select((col("h") * 2).as("id1"), (col("h") * 2 + 1).as("id2"))
      val chain = spark.range(15).toDF("i")
        .select((lit(n.toLong) + col("i")).as("id1"),
          (lit(n.toLong) + col("i") + 1).as("id2"))
      pairs.union(chain)
    }

    for (mult <- Seq(1, 4)) {
      val n = baseNodes * mult
      timed(f"chains/len16 delta n=$n%8d") {
        val out = Dedup.dupClusters(chains(n, 16)); val c = out.count()
        out.unpersist(); c }
      timed(f"chains/len16 full  n=$n%8d") {
        val out = fullPropagation(chains(n, 16)); val c = out.count()
        out.unpersist(); c }
      timed(f"stars/fan15  delta n=$n%8d") {
        val out = Dedup.dupClusters(stars(n, 15)); val c = out.count()
        out.unpersist(); c }
      timed(f"stars/fan15  full  n=$n%8d") {
        val out = fullPropagation(stars(n, 15)); val c = out.count()
        out.unpersist(); c }
      timed(f"mixed/pairs+1chain delta n=$n%8d") {
        val out = Dedup.dupClusters(mixed(n)); val c = out.count()
        out.unpersist(); c }
      timed(f"mixed/pairs+1chain full  n=$n%8d") {
        val out = fullPropagation(mixed(n)); val c = out.count()
        out.unpersist(); c }
    }
    spark.stop()
  }
}
