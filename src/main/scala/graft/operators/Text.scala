package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (SURVEY §2
  * t01–t04). Everything is pure column arithmetic over codegen'd
  * built-ins — no UDFs — so each of these runs at scan speed and is
  * DuckDB-oracle-able for exact cross-engine verification.
  */
object Text {

  /** Minimal public stopword lists per language (frequency heuristics,
    * not linguistics — the point is deterministic n-gram scoring).
    * Canonical copy lives with the native kernel that consumes it. */
  val stopwords: Seq[(String, Seq[String])] =
    graft.functions.TextSignalsImpl.stopwords

  def words(text: Column): Column =
    filter(split(text, " ", -1), w => w =!= "")

  /** Occurrences of any of `dict` among the tokens. */
  def hitCount(ws: Column, dict: Seq[String]): Column =
    size(filter(ws, w => w.isin(dict.map(lit): _*)))

  /** One-pass native signal struct (functions.TextSignalsExpr):
    * n_words, n_chars, punct, per-language stopword hits — identical
    * instances in one projection dedupe under codegen CSE, so every
    * consumer below shares a SINGLE string walk per row (the composed
    * filter/split lambda forms are CodegenFallback and re-split per
    * consumer). Callers must have GraftFunctions registered (every
    * graft session does via GraftExtensions). */
  def signals(text: Column): Column = call_function("text_signals", text)

  /** t19: deflate-compression ratio (compressed/raw bytes) — the
    * DCLM/RefinedWeb compressibility quality signal. Repetitive or
    * boilerplate text compresses far below prose (ratio ≪ 0.4);
    * near-random text approaches (or exceeds) 1. Scan-speed static
    * kernel call, no shuffle. */
  def compressionRatio(text: Column): Column =
    call_function("graftCompressedSize", text).cast("double") /
      octet_length(text)

  /** t01: language ID — per-language stopword hit counts and an
    * argmax prediction. Tie-break: the >= chain runs languages in
    * REVERSE alphabetical order, so ties go to the alphabetically
    * LAST language; the oracle mirrors the same CASE chain. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val hits = signals(text).getField("hits")
    stopwords.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(hits, i + 1)
    }
  }

  def predictedLang(scoreCols: Seq[(String, Column)]): Column = {
    val desc = scoreCols.sortBy(_._1).reverse // zh, fr, es, en, de
    desc.foldRight(lit(desc.last._1)) { case ((lang, s), acc) =>
      val others = desc.filter(_._1 != lang).map(_._2)
      when(others.foldLeft(lit(true))((c, o) => c && s >= o), lang).otherwise(acc)
    }
  }

  /** t02: quality scoring — length, punctuation and stopword ratios
    * combined into one bounded score. Single-division doubles only, so
    * both engines produce identical bits. All counts come from the
    * shared one-pass signal struct. */
  def qualityScore(text: Column): Column = {
    val sig = signals(text)
    val enIdx = stopwords.indexWhere(_._1 == "en") + 1
    val nWords = sig.getField("n_words").cast("double")
    val stopRatio = element_at(sig.getField("hits"), enIdx).cast("double") / nWords
    val punctRatio = sig.getField("punct").cast("double") /
      sig.getField("n_chars").cast("double")
    round(least(nWords / 100.0, lit(1.0)) * 0.3 + stopRatio * 0.4 +
      (lit(1.0) - punctRatio) * 0.3, 6)
  }

  /** t03: token counting — whitespace tokens and a BPE-ish regex
    * tokenization (letter runs / digit runs / single symbols). */
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def wsTokenCount(text: Column): Column = signals(text).getField("n_words")
  def bpeishTokenCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** t04: document fingerprint — md5 over normalized text (lowercase,
    * whitespace collapsed, trimmed): byte-identical rendering of the
    * same content fingerprints identically across engines. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** t07: PII scrubbing — the redaction pass a curation pipeline runs
    * before anything reaches training (emails, IPv4 addresses,
    * international phone numbers). The patterns are deliberately
    * engine-portable: the same regex text means the same thing under
    * Java regex (Spark, codegen'd) and RE2 (DuckDB), so both the hit
    * counts AND the redacted bytes cross-verify exactly. Pure regexp
    * column arithmetic — scan speed, no shuffle, no UDF. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+\\d{10,14}"

  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(emailRe)),
    "n_ipv4"   -> regexp_count(text, lit(ipv4Re)),
    "n_phones" -> regexp_count(text, lit(phoneRe)))

  /** Redaction order matters: emails first (their hosts contain the
    * dotted substrings the IPv4 pattern hunts), then IPv4, then
    * phone numbers. The replacement tags carry no digits or '@', so
    * later passes never re-match earlier redactions. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipv4Re, "[IP]"),
      phoneRe, "[PHONE]")

  /** t10: hashed-feature linear quality model — the scoring shape of
    * a fasttext-style document classifier (hash each token into a
    * bucket, sum the bucket weights, threshold the mean). The weights
    * here are a DETERMINISTIC stand-in (a Knuth-hash ramp over the
    * bucket index) so the score is engine-portable and oracle-able;
    * a trained model would broadcast its weight table into the same
    * plan. Pure per-row fold arithmetic: no shuffle, no UDF, scan
    * speed — the shape that matters at 100 TB, where model scoring
    * must ride the ingest scan.
    *
    * Determinism discipline: bucket = 3 hex digits of md5(token)
    * (exact 0..4095), weight = exact long arithmetic divided by a
    * power of two (binary-exact double), per-doc sum = left fold in
    * token order (DuckDB list_sum matches Spark's aggregate-fold IEEE
    * order exactly — the d05 discipline). */
  def qualityModel(text: Column, buckets: Int = 4096,
      bias: Double = 0.0): (Column, Column) = {
    // native one-pass kernel (functions.QualityModelExpr): md5-prefix
    // bucket + Knuth-ramp weight per token, summed in token order —
    // the exact arithmetic (and IEEE sum sequence) of the lambda fold
    // it replaced, at codegen scan speed
    val s = call_function("quality_model", text, lit(buckets))
    val score = s.getField("sum") /
      greatest(s.getField("n"), lit(1)).cast("double") + bias
    (round(score, 6), score > 0)
  }

  /** t06: repetition signals (the Gopher-rules quality family) — the
    * per-document fractions a filtering pipeline thresholds on:
    * duplicate-word fraction, most-frequent-word fraction, duplicate
    * trigram fraction, plus a combined flag.
    *
    * The word histogram is explode → two-level hash aggregate (both
    * levels keyed by doc, partial-agg friendly — never a per-row
    * O(len²) array fold); the gram stats are pure column arithmetic
    * on the same shingle builder d04 uses. One shuffle per branch,
    * re-joined on the high-cardinality doc id. All fractions are
    * single divisions of exact ints, rounded to 6 — bit-identical
    * cross-engine. */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val wstats = df
      .select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(idCol).agg(
        sum("__c").as("n_words"),
        count(lit(1)).as("__n_distinct"),
        max("__c").as("__top_c"))
    val gstats = df.select(col(idCol),
      size(Dedup.wordNGrams(col(textCol), 3)).as("__n_dg"),
      greatest(size(Dedup.tokens(col(textCol))) - 2, lit(0)).as("__n_g"))
    val dupWord =
      round(lit(1.0) - col("__n_distinct").cast("double") / col("n_words"), 6)
    val topWord = round(col("__top_c").cast("double") / col("n_words"), 6)
    val dupGram = when(col("__n_g") > 0,
      round(lit(1.0) - col("__n_dg").cast("double") / col("__n_g"), 6))
      .otherwise(lit(0.0))
    wstats.join(gstats, idCol)
      .select(col(idCol), col("n_words").cast("long").as("n_words"),
        dupWord.as("dup_word_frac"), topWord.as("top_word_frac"),
        dupGram.as("dup_gram_frac"))
      .withColumn("flagged",
        col("dup_word_frac") > 0.3 || col("top_word_frac") > 0.2 ||
          col("dup_gram_frac") > 0.18)
  }

  /** t16: DSIR-style data selection via hashed-n-gram importance
    * weights (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"). Both the target domain and the raw pool
    * are modeled as bags of HASHED unigrams over `buckets` buckets;
    * a doc's log importance weight is
    * `Σ_tokens ln p̂_target(b(tok)) − ln p̂_raw(b(tok))` with Laplace
    * (+1) smoothing. Docs the target model likes better than the raw
    * model (logw > 0) are kept — a deterministic threshold stand-in
    * for the paper's Gumbel resampling (seeded sampling isn't
    * engine-portable; t05/t09 carry the sampled-selection shapes).
    *
    * Scale design: ONE token-scale pass — explode+md5 collapses
    * map-side into a per-(doc, bucket) count frame (≤ buckets rows
    * per doc, orders of magnitude under token scale), which is
    * persisted and consumed twice: once to derive the per-bucket
    * target/raw counts AND their scalar totals in a single ≤ `buckets`
    * -row aggregate, once joined back against the broadcast weight
    * table for the per-doc score. A doc's log-weight is then
    * Σ_buckets c(doc,b)·lw(b) — identical math to the per-token sum,
    * grouped. The count cache is released before returning (the
    * ngramJaccard complete-release discipline: the doc-scale result
    * materializes first, so the caller's unpersist is a real release).
    * Bucket hash = first 3 hex digits of md5(token) (t10's
    * engine-portable discipline); the ln sums are round-6 bridged like
    * t14, with the oracle summing the SAME bucket-grouped terms.
    *
    * Returns (idCol, n_tokens, logw, keep) one row per doc — EAGER and
    * CACHED: the result is persisted and materialized before the
    * internal bucket-count cache is released (otherwise the caller's
    * lazy evaluation would recompute the corpus scan per consumer).
    * The caller owns the returned cache and must `unpersist()` it when
    * done (the Bench/Verify harness clears cache between keys; library
    * users release explicitly). */
  def dsirScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, isTarget: Column, buckets: Int = 1024)
      : org.apache.spark.sql.DataFrame = {
    require(buckets > 0 && buckets <= 4096, "buckets must be in (0, 4096]")
    // One-pass compiled histogram (functions/DsirBucketsExpr): the
    // per-doc (bucket, count) pairs are a function of ONE row's text,
    // so the former token explode (3 md5-string ops per token) and the
    // corpus-scale groupBy(doc, tgt, bucket) SHUFFLE that rebuilt the
    // histogram were pure overhead — at 100 TB that shuffle dominated
    // the operator (guide §2.3/§2.4: shuffle removed outright). Same
    // md5-nibble arithmetic, pinned by TextSignalsSpec + the oracle.
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val docBuckets = df.select(col(idCol), isTarget.as("__tgt"),
        explode(call_function("dsir_buckets", col(textCol), lit(buckets)))
          .as("__e"))
      .select(col(idCol), col("__tgt"),
        col("__e.b").as("__b"), col("__e.c").as("__c"))
      .persist()
    try {
      val bucketStats = docBuckets.groupBy("__b")
        .agg(sum("__c").as("__cr"),
          sum(when(col("__tgt"), col("__c")).otherwise(lit(0L))).as("__ct"))
      // scalar totals derive from the ≤ buckets-row stats frame, not
      // another corpus pass
      val weights = bucketStats
        .crossJoin(broadcast(
          bucketStats.agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"))))
        .select(col("__b"),
          (log((col("__ct") + lit(1.0)) / (col("__nt") + lit(buckets.toDouble))) -
            log((col("__cr") + lit(1.0)) / (col("__nr") + lit(buckets.toDouble))))
            .as("__lw"))
      val out = docBuckets.join(broadcast(weights), Seq("__b"))
        .groupBy(idCol)
        .agg(sum("__c").as("n_tokens"),
          round(sum(col("__c") * col("__lw")), 6).as("logw"))
        .select(col(idCol), col("n_tokens"), col("logw"),
          (col("logw") > 0).as("keep"))
        .persist()
      out.count()
      out
    } finally docBuckets.unpersist(blocking = false)
  }

  /** t21: character-entropy quality gate — Shannon entropy (bits per
    * character) of each doc's character distribution, the cheap noise
    * detector that complements t02/t15: near-zero entropy flags
    * repeated-character boilerplate, abnormally high entropy flags
    * base64/binary junk pasted into text; prose sits ~3.5–4.5 bits.
    *
    * Scale shape: one explode to (doc, char) rows, one partial-agg-
    * friendly count shuffle, then the per-doc entropy folds over the
    * CHAR-SORTED count list — a deterministic summation order the
    * DuckDB oracle replays term for term (ln ulps bridged by the
    * final round-6, the t14 discipline; the bits conversion divides
    * by a shared ln(2) literal so no second libm call exists on
    * either side).
    *
    * Returns (idCol, n_chars, entropy, keep) — empty docs are
    * excluded (entropy of nothing is undefined, both engines drop
    * them identically). */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minBits: Double = 2.0, maxBits: Double = 6.0)
      : org.apache.spark.sql.DataFrame = {
    // Compiled per-row kernel (char_entropy → charEntropyKernel): the
    // whole signal is a function of ONE row's text, so the former
    // explode-per-char + two-shuffle plan (10M intermediate rows at
    // sf0.1, 2.7 s) was pure overhead — the kernel computes the
    // IDENTICAL IEEE sequence at scan speed with zero shuffles
    // (isolated 0.2 s). Parity pinned by TextSignalsSpec against the
    // composed collect-sort-fold form on real corpus text.
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(col(idCol), length(col(textCol)).cast("long").as("n_chars"),
        round(call_function("char_entropy", col(textCol)), 6).as("entropy"))
      .filter(col("n_chars") > 0)
      .withColumn("keep", col("entropy") >= minBits && col("entropy") <= maxBits)
  }

  /** The pre-r13 composed spelling of charEntropy — kept as the
    * parity oracle for the kernel (TextSignalsSpec), never on a hot
    * path. */
  private[graft] def charEntropyComposed(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, minBits: Double = 2.0,
      maxBits: Double = 6.0): org.apache.spark.sql.DataFrame = {
    val base = df
      .select(col(idCol), col(textCol).as("__t"),
        length(col(textCol)).as("__len"))
      .filter(col("__len") > 0)
    val counts = base
      .select(col(idCol), col("__len"),
        explode(transform(sequence(lit(1), col("__len")),
          i => col("__t").substr(i, lit(1)))).as("__c"))
      .groupBy(col(idCol), col("__len"), col("__c"))
      .agg(count(lit(1)).as("__n"))
    def p(s: Column): Column =
      s.getField("__n").cast("double") / col("__len").cast("double")
    counts
      .groupBy(col(idCol), col("__len"))
      .agg(sort_array(collect_list(struct(col("__c"), col("__n")))).as("__cs"))
      .select(col(idCol), col("__len").cast("long").as("n_chars"),
        round(
          aggregate(col("__cs"), lit(0.0d),
            (acc, s) => acc + p(s) * log(p(s))) /
            lit(-0.6931471805599453d), 6).as("entropy"))
      .withColumn("keep", col("entropy") >= minBits && col("entropy") <= maxBits)
  }

  /** Compiled Shannon char-entropy kernel: code-point counts via an
    * ordered map, terms (n/len)·ln(n/len) summed in ASCENDING
    * code-point order (= UTF-8 byte order = the composed form's
    * sort_array order = the DuckDB oracle's ORDER BY c), divided by
    * −ln 2 — the identical IEEE double sequence, one row at a time.
    * Invoked via StaticInvoke (codegen'd static call, not a UDF). */
  def charEntropyKernel(text: org.apache.spark.unsafe.types.UTF8String)
      : Double = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var len = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1
      i += Character.charCount(cp)
      len += 1
    }
    var acc = 0.0d
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / len.toDouble
      acc += p * math.log(p)
    }
    acc / -0.6931471805599453d
  }
}
