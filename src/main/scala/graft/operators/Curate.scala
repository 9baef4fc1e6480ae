package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed training-data curation — the end-to-end funnel the
  * single-purpose operators (Text, Dedup) exist for, plus the
  * deterministic mixing sampler that follows it in a real pipeline.
  */
object Curate {

  /** language ID → quality gate → exact dedup → near-dup removal →
    * per-doc stats, as ONE composed plan:
    *  - every per-document signal (lang scores, quality, token count,
    *    fingerprint) is computed in a single scan-speed projection —
    *    not one pass per stage;
    *  - the only shuffles are the fingerprint window and the bounded
    *    (block, gram) candidate join inside Dedup.ngramJaccard;
    *  - the near-dup drop list (id2 of each surviving pair, keep-the-
    *    lowest-id rule) is broadcast into a left-anti join, so the
    *    surviving corpus never reshuffles.
    */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
      keepLang: String = "en", minQuality: Double = 0.45,
      n: Int = 3, minJaccard: Double = 0.5, maxGramDf: Int = 1000): DataFrame = {
    val scores = Text.langScores(col(textCol))
    val scored = docs.select(
        col(idCol), col(textCol),
        Text.predictedLang(scores).as("predicted"),
        Text.qualityScore(col(textCol)).as("quality"),
        Text.wsTokenCount(col(textCol)).as("n_tokens"),
        Text.fingerprint(col(textCol)).as("__fp"))
      .filter(col("predicted") === keepLang && col("quality") >= minQuality)
    // deliberately NOT persisted: both consumers (pair generation and
    // the final anti-join) re-derive this from lineage. Caching the
    // full surviving corpus is exactly the wrong trade at 100 TB —
    // memory-and-disk-spilling a corpus-sized intermediate costs more
    // than the one extra scan + fingerprint window it saves, and a
    // persist with no unpersist epilogue would accumulate for the
    // lifetime of a long-lived session (the LIVE VIEW / WATCH case).
    val exact = scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__fp").orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn", "__fp")
    val pairs = Dedup.ngramJaccard(exact, idCol, textCol, "predicted",
      n, minJaccard, maxGramDf)
    val drop = pairs.select(col("id2").as(idCol)).distinct()
    exact.join(broadcast(drop), Seq(idCol), "left_anti")
      .select(col(idCol), col("predicted"), col("quality"), col("n_tokens"))
  }

  /** The end-to-end pretraining corpus build — what everything in
    * this package composes into: curation funnel (lang-ID → quality →
    * exact dedup → near-dup removal) over the non-benchmark corpus,
    * benchmark decontamination of the survivors, then the
    * deterministic stratified mixing sample. Every stage is the same
    * audited building block its standalone key uses, so the scale
    * posture (one-scan signals, bounded joins, broadcast drop lists,
    * salted two-phase sampling) is inherited, and the whole output is
    * DuckDB-oracle-able end to end. */
  def pretrain(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, isBench: Column, caps: Map[String, Int],
      defaultCap: Int, minOverlap: Int = 5): DataFrame = {
    val corpus = docs.filter(!isBench)
    val bench = docs.filter(isBench)
    val kept = funnel(corpus, idCol, textCol)
    // re-attach text + stratum for decontamination and mixing (the
    // funnel deliberately drops text from its output)
    val keptDocs = docs
      .select(col(idCol), col(strataCol), col(textCol))
      .join(kept, Seq(idCol))
    val clean = Dedup.decontaminate(keptDocs, bench, idCol, textCol,
        minOverlap = minOverlap)
      .filter(!col("contaminated"))
      .drop(textCol, "n_hits", "contaminated")
    mixSample(clean, idCol, strataCol, caps, defaultCap)
  }

  /** Deterministic stratified sampling for corpus mixing: keep the
    * first `cap(stratum)` documents of each stratum in id-HASH order —
    * an unbiased, seedless, engine-portable pick (md5 of the id
    * renders identically everywhere, unlike RNG sampling).
    *
    * Strata are mixing sources — single digits of them — so a window
    * partitioned on the bare strata column would sort an entire
    * stratum on ONE task at 100 TB. Instead: two-phase top-k.
    * Phase 1 salts each stratum into `salts` sub-partitions and takes
    * a LOCAL `row_number ≤ cap` per (stratum, salt) — exact, because
    * a row's rank within its salt group is ≤ its rank within the
    * stratum, so every true top-cap row survives. Phase 2 re-ranks
    * only the ≤ cap×salts survivors per stratum — the same `pick`
    * values the one-window plan would emit, without the global sort.
    * Caps are the mixing weights, so output size is Σ caps regardless
    * of corpus size.
    */
  def mixSample(docs: DataFrame, idCol: String, strataCol: String,
      caps: Map[String, Int], defaultCap: Int, salts: Int = 64): DataFrame = {
    val capCol: Column = caps.foldLeft(lit(defaultCap)) {
      case (acc, (s, k)) => when(col(strataCol) === s, k).otherwise(acc)
    }
    val local = docs
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__salt", pmod(xxhash64(col(idCol).cast("string")), lit(salts)))
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col(strataCol), col("__salt"))
          .orderBy(col("__h"), col(idCol))))
      .filter(col("__lrn") <= capCol)
    local
      .withColumn("__pick", row_number().over(
        Window.partitionBy(strataCol).orderBy(col("__h"), col(idCol))))
      .filter(col("__pick") <= capCol)
      .drop("__h", "__salt", "__lrn")
      .withColumnRenamed("__pick", "pick")
  }
}
