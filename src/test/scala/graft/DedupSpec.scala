package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, IncrementalIndex, NearDupIndex}
import graft.sources.Tables

/** Semantic oracles for the rows-only dedup operators, on a corpus
  * with KNOWN planted duplicates — the ScalaTest side of the
  * correctness contract SURVEY §2 promises for d02/d03. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** 23 deterministic docs: 20 with disjoint vocabularies, plus one
    * exact copy of doc 0 (id 100), and near-copies of docs 1 and 2
    * (ids 101, 102 — one word changed / one appended out of 60). */
  private lazy val corpus = {
    def words(seed: Int) = (0 until 60).map(i => s"doc${seed}_w$i")
    val base = (0 until 20).map(i => (i.toLong, words(i).mkString(" ")))
    val planted = Seq(
      (100L, words(0).mkString(" ")),                       // exact dup of 0
      (101L, words(1).updated(30, "CHANGED").mkString(" ")), // near dup of 1
      (102L, (words(2) :+ "extra").mkString(" ")))           // near dup of 2
    (base ++ planted).toDF("doc_id", "text")
  }

  test("exact dedup keeps min-id row per digest and drops exact copies") {
    val out = Dedup.exact(corpus, "text", "doc_id")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 22)          // 23 rows - 1 exact dup
    assert(!ids.contains(100L))     // copy dropped
    assert(ids.contains(0L))        // min-id original kept
  }

  test("minhash LSH finds exact and near dups, estimates high jaccard, no junk") {
    val got = Dedup.minHashLsh(corpus, "doc_id", "text", minEstJaccard = 0.5)
      .select("id1", "id2", "est_jaccard")
      .as[(Long, Long, Double)].collect().toMap2
    assert(got.keySet == Set((0L, 100L), (1L, 101L), (2L, 102L)), s"got $got")
    assert(got((0L, 100L)) == 1.0)
    assert(got((1L, 101L)) > 0.7 && got((2L, 102L)) > 0.7)
  }

  test("simhash banding finds planted near-dups within hamming 4") {
    val got = Dedup.simHashNearDup(corpus, "doc_id", "text", maxHamming = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 100L)) && got.contains((1L, 101L)) && got.contains((2L, 102L)),
      s"got $got")
  }

  test("ngram jaccard verifies planted pairs with exact similarity") {
    val blocked = corpus.withColumn("blk", lit(1))
    val got = Dedup.ngramJaccard(blocked, "doc_id", "text", "blk", minJaccard = 0.5)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toMap2
    assert(got.keySet == Set((0L, 100L), (1L, 101L), (2L, 102L)), s"got $got")
    assert(got((0L, 100L)) == 1.0)
  }

  test("ngram jaccard df cap drops boilerplate grams and bounds the join input") {
    // every doc shares one boilerplate bigram ("BP X"); pairwise they
    // are otherwise disjoint, so without the cap the self-join emits
    // df² ≈ n² rows for that single gram
    val n = 40
    val docs = (0 until n).map(i => (i.toLong, s"BP X doc${i}_a doc${i}_b doc${i}_c"))
      .toDF("doc_id", "text").withColumn("blk", lit(1))
    // capped: the shared gram exceeds maxGramDf and is dropped before
    // the join — no pair survives (their only overlap was boilerplate)
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", "blk",
      n = 2, minJaccard = 0.1, maxGramDf = 10)
    assert(capped.count() == 0)
    // uncapped twin: the boilerplate gram alone generates n·(n-1)/2
    // pair rows — the quadratic blowup the cap exists to prevent
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text", "blk",
      n = 2, minJaccard = 0.1, maxGramDf = 10000)
    assert(uncapped.count() == n.toLong * (n - 1) / 2)
    // and the cap never affects pairs whose similarity is genuine:
    // planted near-dups from the shared corpus keep their jaccard
    val blocked = corpus.withColumn("blk", lit(1))
    val got = Dedup.ngramJaccard(blocked, "doc_id", "text", "blk",
      minJaccard = 0.5, maxGramDf = 10)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 100L), (1L, 101L), (2L, 102L)))
  }

  test("maxGramDf = AutoGramDf derives the cap at the df-profile knee") {
    // D04DenseGen shape in miniature: 30 families of 8 copies (content
    // grams at df 8 — the vocabulary mass) + a 3-word boilerplate
    // footer in EVERY doc (df 240 — a vanishing fraction of distinct
    // grams with outsized df). The knee rule must keep the content df
    // range (floor 64 >= 8) and cut the boilerplate tail (240 > 64).
    val docs = (0 until 240).map { i =>
      val fam = i % 30
      (i.toLong, s"fam${fam}_a fam${fam}_b fam${fam}_c fam${fam}_d " +
        s"uniq${i}_x uniq${i}_y BOILER PLATE FOOTER")
    }.toDF("doc_id", "text").withColumn("blk", lit(1))
    val grams = docs.select(col("doc_id"), col("blk").as("__blk"),
        Dedup.wordNGrams(col("text"), 2).as("__gs"))
      .select(col("doc_id"), col("__blk"), size(col("__gs")).as("__sz"),
        explode(col("__gs")).as("__g"))
    assert(Dedup.autoGramDf(grams) == 64)
    // auto and the equivalent explicit cap agree pair-for-pair, and
    // boilerplate-only overlap yields no pairs under either
    val auto = Dedup.ngramJaccard(docs, "doc_id", "text", "blk",
        n = 2, minJaccard = 0.2, maxGramDf = Dedup.AutoGramDf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val explicit = Dedup.ngramJaccard(docs, "doc_id", "text", "blk",
        n = 2, minJaccard = 0.2, maxGramDf = 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(auto == explicit && auto.nonEmpty)
    // family pairs survive (content df 8 is under the derived cap);
    // every surviving pair is same-family
    assert(auto.forall { case (a, b) => a % 30 == b % 30 })
    // containment twin takes the sentinel through its own hot-set path
    val cont = Dedup.ngramContainment(docs, "doc_id", "text", "blk",
      n = 2, minContainment = 0.2, maxGramDf = Dedup.AutoGramDf)
    assert(cont.count() == auto.size)
  }

  test("span coverage counts cross-doc duplicated positions, not same-doc repeats") {
    // doc 1 and 2 share a 6-token span; doc 3 repeats its OWN span
    // twice (t06 territory — must NOT count); doc 4 is unique
    val docs = Seq(
      (1L, "a b c d e f x1 x2 x3"),
      (2L, "y1 y2 a b c d e f"),
      (3L, "r s t r s t"),
      (4L, "u v w z")).toDF("doc_id", "text")
    val out = Dedup.spanCoverage(docs, "doc_id", "text", n = 3, minCoverage = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "dup_spans", "flagged")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // doc 1: 9 tokens → 7 spans; "a b c","b c d","c d e","d e f" shared
    //        → 4/7 ≈ 0.57 ≥ 0.5 flags
    // doc 2: 8 tokens → 6 spans; same 4 shared → 4/6 flags
    // doc 3: 6 tokens → 4 spans, "r s t" twice but only in THIS doc → 0
    // doc 4: 4 tokens → 2 spans, unique → 0
    assert(out == Seq(
      (1L, 7L, 4L, true), (2L, 6L, 4L, true),
      (3L, 4L, 0L, false), (4L, 2L, 0L, false)))
  }

  test("incremental dedup drops known fingerprints exactly, keeps new docs") {
    // corpus = docs 0..19; batch = re-formatted copies of 0..4 (same
    // normalized fingerprint: case + padding changes only) plus 3
    // genuinely new docs
    val batch = ((0 until 5).map(i =>
        (200L + i, "  " + corpus.where(col("doc_id") === i)
          .select("text").as[String].head.toUpperCase + "  ")) ++
      (0 until 3).map(i => (300L + i, s"brand new document $i")))
      .toDF("doc_id", "text")
    val out = Dedup.incremental(corpus, batch, "doc_id", "text")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(300L, 301L, 302L), s"got $ids")
    // the plan must carry the map-side Bloom prefilter: candidates are
    // pruned BEFORE any join, so definitively-new batch rows never
    // shuffle. Asserted on the analyzed plan — over this in-memory
    // batch ConvertToLocalRelation folds the filter into the
    // LocalTableScan (i.e. it already ran); over a file source it
    // stays a scan-side Filter.
    val plan = out.queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), // BloomFilterMightContain.prettyName
      s"expected a bloom_contains prefilter in:\n$plan")
  }

  test("prebuilt IncrementalIndex serves successive drops with zero corpus scans") {
    // the standing-pipeline contract: ONE build (one corpus scan),
    // then every crawl drop reads only the batch and the cached
    // fingerprint table — never the corpus again
    val idx = IncrementalIndex.build(corpus, "text")
    try {
      assert(idx.fingerprints.storageLevel.useMemory,
        "index fingerprint table must be persisted")
      def reform(i: Int, newId: Long) =
        (newId, "  " + corpus.where(col("doc_id") === i)
          .select("text").as[String].head.toUpperCase + "  ")
      // drop 1: re-formatted copies of docs 0..2 + two new docs
      val batch1 = ((0 until 3).map(i => reform(i, 200L + i)) ++
        Seq((300L, "fresh doc alpha"), (301L, "fresh doc beta")))
        .toDF("doc_id", "text")
      val out1 = Dedup.incremental(idx, batch1, "doc_id", "text")
      assert(out1.select("doc_id").as[Long].collect().toSet == Set(300L, 301L))
      // drop 2 through the SAME index: copies of docs 3..4 + one new
      val batch2 = (Seq(3, 4).map(i => reform(i, 210L + i)) :+
        (400L, "fresh doc gamma")).toDF("doc_id", "text")
      val out2 = Dedup.incremental(idx, batch2, "doc_id", "text")
      assert(out2.select("doc_id").as[Long].collect().toSet == Set(400L))
      // per-drop plan shape: the exact-verify side reads the CACHE
      // (InMemoryTableScan), and the map-side Bloom prefilter is there
      val physical = out2.queryExecution.executedPlan.toString
      assert(physical.contains("InMemoryTableScan"),
        s"drop plan must read the cached fingerprint table:\n$physical")
      assert(out2.queryExecution.analyzed.toString.contains("might_contain"),
        "drop plan must carry the Bloom prefilter")
    } finally idx.release()
  }

  test("prebuilt NearDupIndex drops re-crawled near-dups across successive batches") {
    // d11's exact index would keep ALL of these: every batch doc has a
    // DIFFERENT normalized fingerprint. Only shingle similarity links
    // a footered re-crawl back to its corpus original.
    val idx = NearDupIndex.build(corpus, "doc_id", "text")
    try {
      def refooter(i: Int, newId: Long) =
        (newId, corpus.where(col("doc_id") === i)
          .select("text").as[String].head + " new footer line appended")
      // drop 1: re-crawls of docs 3..5 + one genuinely new doc
      val batch1 = ((3 to 5).map(i => refooter(i, 200L + i)) :+
        (300L, (0 until 60).map(i => s"fresh1_w$i").mkString(" ")))
        .toDF("doc_id", "text")
      val out1 = Dedup.incrementalNearDup(idx, batch1, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(300L), s"got $out1")
      // drop 2 through the SAME index
      val batch2 = (Seq(refooter(6, 206L)) :+
        (400L, (0 until 60).map(i => s"fresh2_w$i").mkString(" ")))
        .toDF("doc_id", "text")
      val out2 = Dedup.incrementalNearDup(idx, batch2, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(out2 == Set(400L), s"got $out2")
      // the drop plan reads the CACHED index tables, never the corpus
      val physical = Dedup.incrementalNearDup(idx, batch2, "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(physical.contains("InMemoryTableScan"),
        s"drop plan must read the cached index:\n$physical")
    } finally idx.release()
  }

  test("incremental dedup keeps Bloom false positives via the exact verify join") {
    // a 64-bit sketch sized for 2 items over a 200-doc corpus forces
    // real false positives; the verify join must clear every one —
    // output must equal the plain exact anti-join regardless
    val bigCorpus = (0 until 200).map(i => (i.toLong, s"corpus doc number $i"))
      .toDF("doc_id", "text")
    val batch = (0 until 200).map(i => (1000L + i, s"batch doc number $i"))
      .toDF("doc_id", "text")
    val out = Dedup.incremental(bigCorpus, batch, "doc_id", "text",
      expectedItems = 2L)
    assert(out.count() == 200, "no batch doc is truly in the corpus")
  }

  test("cache hygiene: funnel/ngramJaccard/dupClusters return complete-release handles") {
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // the curation funnel (d09's/d13's core) returns its materialized
    // narrow output as THE persisted frame — internal caches (grams,
    // pairs) are released before it returns, so unpersisting the
    // returned handle releases everything
    val kept = Curate.funnel(corpus, "doc_id", "text")
    kept.count()
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      "funnel must leave only its returned handle persisted, got " +
        s"${spark.sparkContext.getPersistentRDDs.size}")
    kept.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "unpersisting funnel's returned handle must release everything")
    // ngramJaccard materializes while the doc-level gram cache is
    // live, then RELEASES it — the only frame left persisted is the
    // returned pair-scale result, so the caller's unpersist() is a
    // real, complete release (no gram-cache accumulation across a
    // long-lived session's repeated calls).
    val blocked = corpus.withColumn("blk", lit(1))
    val d04 = Dedup.ngramJaccard(blocked, "doc_id", "text", "blk", minJaccard = 0.5)
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      "ngramJaccard leaves exactly its returned result persisted, got " +
        s"${spark.sparkContext.getPersistentRDDs.size}")
    d04.collect() // consuming the handle reads the cache, not the grams
    d04.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "unpersisting ngramJaccard's returned handle must release everything")
    // dupClusters hands back ITS one persisted frame — unpersisting
    // the returned handle is a real, complete release
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val cl = Dedup.dupClusters(pairs)
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      s"only the returned handle should be persisted, got " +
        s"${spark.sparkContext.getPersistentRDDs.size}")
    cl.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "unpersisting the returned handle must release everything")
  }

  test("ngramContainment finds subset duplication Jaccard misses") {
    // doc 1 (6 words, 4 trigrams) is pasted verbatim into doc 2 (36
    // words): containment = 1.0 while Jaccard ≈ 4/34 — below any
    // sane Jaccard threshold. doc 3 shares nothing.
    val small = (1 to 6).map(i => s"w$i").mkString(" ")
    val big = small + " " + (100 to 129).map(i => s"x$i").mkString(" ")
    val other = (200 to 229).map(i => s"y$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, other))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val cont = Dedup.ngramContainment(docs, "doc_id", "text", "lang",
      n = 3, minContainment = 0.8, maxGramDf = 100)
    val got = cont.select("id1", "id2", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    cont.unpersist()
    assert(got == Seq((1L, 2L, 1.0)), s"got $got")
    val jac = Dedup.ngramJaccard(docs, "doc_id", "text", "lang",
      n = 3, minJaccard = 0.8, maxGramDf = 100)
    val gotJ = jac.select("id1", "id2").as[(Long, Long)].collect().toSeq
    jac.unpersist()
    assert(gotJ.isEmpty, s"Jaccard at the same threshold must miss it: $gotJ")
  }

  test("dupClusters closes transitive chains with min-id labels") {
    // 1-2-3-4 is a CHAIN (no direct 1~3 / 1~4 pair): only transitive
    // closure puts all four in one group; two disjoint components
    // must keep their own labels
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L)).toDF("id1", "id2")
    val got = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L), s"got $got")
  }

  test("d02/d03 on the real documents table recover its planted near-dups") {
    val docs = Tables(spark, sfDir).documents
    val mh = Dedup.minHashLsh(docs, "doc_id", "text", minEstJaccard = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val sh = Dedup.simHashNearDup(docs, "doc_id", "text")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // ground truth: exact bigram jaccard >= 0.5 within lang blocks
    val truth = Dedup.ngramJaccard(docs, "doc_id", "text", "lang", minJaccard = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dups")
    assert(truth.subsetOf(mh), s"minhash missed ${truth.diff(mh)}")
    // simhash banding (4 bands of 16 bits) is recall-COMPLETE only for
    // Hamming < 4 — assert exactly that guarantee, no more.
    import graft.functions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val sims = docs.select(col("doc_id"), call_function("simhash64",
        filter(split(col("text"), " ", -1), w => w =!= "")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val mustFind = truth.filter { case (a, b) =>
      java.lang.Long.bitCount(sims(a) ^ sims(b)) < 4 }
    assert(mustFind.subsetOf(sh), s"simhash missed ${mustFind.diff(sh)}")
  }

  test("semantic dedup drops planted embedding copies, keeps lowest id, transitive") {
    // 8 vectors in 4 dims: ids 1,2,3 are one duplicate chain
    // (1≈2 exactly, 2≈3 via scaling — cosine 1.0), 4 is orthogonal,
    // 5 is a scaled copy of 4, 6..8 are distinct directions
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(2f, 0f, 0f, 0f)),
      (4L, Seq(0f, 1f, 0f, 0f)), (5L, Seq(0f, 3f, 0f, 0f)),
      (6L, Seq(0f, 0f, 1f, 0f)), (7L, Seq(0f, 0f, 0f, 1f)),
      (8L, Seq(1f, 1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 2, minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    try {
      assert(out.size == 8)
      // chain 1-2-3 collapses to cluster 1, keep only id 1
      assert(out(1L) == (1L, true) && out(2L) == (1L, false)
        && out(3L) == (1L, false))
      // 4 and 5 are cosine-1 duplicates
      assert(out(4L) == (4L, true) && out(5L) == (4L, false))
      // singletons keep themselves
      Seq(6L, 7L, 8L).foreach(i => assert(out(i) == (i, true), s"id $i"))
      // deterministic across a fresh fit+run
      val again = Dedup.semanticDedup(vecs, "vec_id", "embedding",
          k = 2, minCosine = 0.95)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap
      assert(again == out)
    } finally spark.catalog.clearCache()
  }

  test("chunkDedup keeps first occurrences and reassembles in order") {
    // 4-word chunks; doc 2 repeats doc 1's first chunk, doc 3 repeats
    // its own chunk within itself
    val docs = Seq(
      (1L, "a b c d e f g h"),            // chunks: [a b c d][e f g h]
      (2L, "a b c d x y z w"),            // first chunk dups doc 1's
      (3L, "p q r s p q r s p q r s t")   // self-dup twice + tail [t]
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a b c d e f g h", 2, 2L)))
    assert(out(2L) == (("x y z w", 2, 1L)))           // dup chunk gone
    assert(out(3L) == (("p q r s t", 4, 2L)))         // self-dups gone
  }

  test("chunkDedup drops a doc to empty text when every chunk is taken") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", chunkWords = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c d" && out(2L) == "")
  }

  test("substringDedup cuts later span occurrences, unions overlaps, keeps firsts") {
    // 3-word spans. doc 2 embeds doc 1's "a b c d" (two overlapping
    // dup spans whose coverage must union to 4 tokens); doc 3 is a
    // full copy of doc 1 (drops to empty); doc 4 repeats its own
    // 3-gram internally (later repeats cut, first kept).
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y a b c d q"),
      (3L, "a b c d e"),
      (4L, "m n o m n o m n o")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, "doc_id", "text", spanWords = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("a b c d e", 5L, 0L)))   // first occurrences keep
    assert(out(2L) == (("x y q", 7L, 4L)))       // overlap union = a b c d
    assert(out(3L) == (("", 5L, 5L)))            // full copy → empty
    assert(out(4L) == (("m n o", 9L, 6L)))       // self-repeats cut
  }

  test("exactByPriority keeps the best-ranked copy, id as tiebreak") {
    import spark.implicits._
    val docs = Seq(
      // same content: curated (prio 0) beats crawl (1) despite HIGHER id
      (1L, "crawl", "alpha beta", 1),
      (9L, "curated", "alpha beta", 0),
      (5L, "mirror", "alpha beta", 2),
      // prio tie → min id wins
      (3L, "crawl", "gamma", 1),
      (7L, "crawl", "gamma", 1),
      // unique content survives untouched
      (4L, "mirror", "delta", 2)
    ).toDF("doc_id", "source", "text", "prio")
    val out = Dedup.exactByPriority(docs, "text", "doc_id", "prio")
      .select("doc_id", "source", "n_copies")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set((9L, "curated", 3L), (3L, "crawl", 2L),
      (4L, "mirror", 1L)))
  }

  test("substringDedup leaves short docs (< span length) untouched") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, "doc_id", "text", spanWords = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b", 2L -> "a b"))
  }

  test("sz_pairs kernel matches the composed transform+slice form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // irregular sizes incl. ties and a ratio boundary (2/4 = 0.5)
    val entries = Seq(
      Seq((1L, 4), (3L, 2), (7L, 4), (9L, 8)),
      Seq((2L, 5), (4L, 5)),
      Seq((5L, 1), (6L, 100))
    ).toDF("raw")
      .select(transform(col("raw"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("sz"))).as("es"))
    for (ratio <- Seq(0.0, 0.5, 0.9)) {
      val kernel = entries
        .select(explode(call_function("sz_pairs", col("es"), lit(ratio))).as("p"))
        .select("p.id1", "p.s1", "p.id2", "p.s2")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        .toSet
      val composed0 = entries
        .select(explode(Dedup.szPairsOf(col("es"))).as("p"))
      val composed = (if (ratio <= 0.0) composed0
        else composed0.filter(
          least(col("p.s1"), col("p.s2")).cast("double") >=
            lit(ratio) * greatest(col("p.s1"), col("p.s2"))))
        .select("p.id1", "p.s1", "p.id2", "p.s2")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(kernel == composed, s"ratio $ratio")
      if (ratio == 0.0) assert(kernel.size == 6 + 1 + 1)
    }
  }

  private implicit class Map2[A, B, C](arr: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = arr.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
