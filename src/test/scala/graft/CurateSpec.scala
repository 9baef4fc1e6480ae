package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Curate, Text}
import graft.sources.Tables

/** Semantic oracles for the sampling/packing operators beyond the
  * DuckDB hash compare: bucket-count invariance of the distributed
  * prefix sum, stream contiguity, and the temperature-weighting law.
  */
class CurateSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private lazy val docs = Tables(spark, sfDir).documents

  test("packSequences equals the single-window spelling at every bucket count") {
    // the one-window reference plan (what the DuckDB oracle runs)
    val ref = docs
      .select(col("doc_id"), Text.wsTokenCount(col("text")).as("n_tokens"),
        md5(col("doc_id").cast("string")).as("__h"))
      .withColumn("__cum", sum(col("n_tokens").cast("long") + 1L).over(
        Window.orderBy(col("__h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_off", col("__cum") - col("n_tokens") - 1L)
      .select(col("doc_id"), col("start_off"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (chars <- Seq(1, 2, 3)) {
      val got = Curate.packSequences(docs, "doc_id", "text",
          seqLen = 512, prefixChars = chars)
        .select("doc_id", "start_off")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == ref, s"prefixChars=$chars diverges from the single window")
    }
  }

  test("packSequences output is a contiguous token stream with exact chunking") {
    val L = 512
    val out = Curate.packSequences(docs, "doc_id", "text", seqLen = L)
      .collect().map(r => (r.getLong(r.fieldIndex("start_off")),
        r.getInt(r.fieldIndex("n_tokens")),
        r.getLong(r.fieldIndex("seq_id")),
        r.getLong(r.fieldIndex("seq_off")),
        r.getLong(r.fieldIndex("n_seqs"))))
      .sortBy(_._1)
    // contiguity: each doc starts exactly where the previous (plus its
    // separator) ended — the offsets tile the stream with no gaps
    out.sliding(2).foreach {
      case Array((s1, n1, _, _, _), (s2, _, _, _, _)) =>
        assert(s2 == s1 + n1 + 1, s"gap between $s1+$n1+1 and $s2")
      case _ => ()
    }
    // chunk arithmetic: seq_id/seq_off/n_seqs are pure functions of
    // the offset — and n_seqs counts every sequence the doc touches
    out.foreach { case (s, n, seqId, seqOff, nSeqs) =>
      assert(seqId == s / L && seqOff == s % L)
      assert(nSeqs == (s + n) / L - s / L + 1,
        s"doc at $s len $n (+sep) spans ${(s + n) / L - s / L + 1}, got $nSeqs")
    }
  }

  test("temperatureMix follows the sqrt law and upweights small sources") {
    val budget = 100L
    val out = Curate.temperatureMix(docs, "doc_id", "source", budget = budget)
    val picked = out.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ns = docs.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // expected caps from the exact integer arithmetic the operator uses
    val w = ns.map { case (s, n) => s -> math.round(math.sqrt(n.toDouble) * 1e6) }
    val wsum = w.values.sum
    val caps = w.map { case (s, x) => s -> budget * x / wsum }
    ns.keys.foreach { s =>
      assert(picked.getOrElse(s, 0L) == math.min(caps(s), ns(s)),
        s"source $s: picked ${picked.getOrElse(s, 0L)}, cap ${caps(s)}, n ${ns(s)}")
    }
    // the temperature property: keep RATE decreases as source size
    // grows (small sources upweighted relative to proportional)
    val rates = ns.toSeq.sortBy(_._2).map { case (s, n) =>
      caps(s).toDouble / n }
    assert(rates.head >= rates.last,
      s"smallest source must keep at a rate >= largest: $rates")
  }

  test("globalShuffle is a balanced strided permutation, bucket-count invariant") {
    val n = docs.count()
    val shards = 8
    val ref = Curate.globalShuffle(docs, "doc_id", shards, prefixChars = 2)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    // every doc exactly once
    assert(ref.size == n)
    // (shard, pos) is injective and pos tiles 0..size-1 per shard
    val byShard = ref.values.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    byShard.foreach { case (s, ps) =>
      assert(ps == (0L until ps.size.toLong), s"shard $s positions not contiguous")
    }
    // strided sharding balances to within one row
    val sizes = byShard.values.map(_.size).toSeq
    assert(sizes.max - sizes.min <= 1, s"shard skew: $sizes")
    // the distributed prefix sum is bucket-count invariant
    for (chars <- Seq(1, 3)) {
      val got = Curate.globalShuffle(docs, "doc_id", shards, prefixChars = chars)
        .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
      assert(got == ref, s"prefixChars=$chars diverges")
    }
  }

  test("datasetSplit is a stable pure function of the id with ~90/5/5 mass") {
    val full = Curate.datasetSplit(docs, "doc_id")
      .select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(full.size == docs.count())
    // subset stability: assigning a filtered corpus never moves a doc
    val sub = Curate.datasetSplit(docs.filter(col("doc_id") % 3 === 0), "doc_id")
      .select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    sub.foreach { case (id, s) => assert(full(id) == s, s"doc $id moved") }
    // proportions: binomial(n, p) stays well within 5 sigma at any SF
    val n = full.size.toDouble
    val frac = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    def close(p: Double, want: Double): Boolean =
      math.abs(p - want) <= 5 * math.sqrt(want * (1 - want) / n)
    assert(close(frac.getOrElse("train", 0.0), 0.90), s"train ${frac}")
    assert(close(frac.getOrElse("val", 0.0), 0.05), s"val ${frac}")
    assert(close(frac.getOrElse("test", 0.0), 0.05), s"test ${frac}")
  }
}
