package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Bpe, Dedup, Text}

/** Text-analysis coverage (SURVEY §2 t01–t04) over `documents` — all
  * four are exact column arithmetic, all four DuckDB-oracled.
  */
object TextQueries {

  /** lang → quoted stopword list for the oracle SQL. */
  private def dictSql(lang: String): String =
    Text.stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")

  /** Shared with d09_curate_pipeline's composed oracle. */
  private[queries] def dictSqlPub(lang: String): String = dictSql(lang)

  /** Hex digit i of md5(t) as its 0–15 value (oracle side of t10's
    * token-bucket hash). */
  private def hexCase(i: Int): String =
    s"(CASE WHEN ascii(substr(md5(t), $i, 1)) >= 97" +
      s" THEN ascii(substr(md5(t), $i, 1)) - 87" +
      s" ELSE ascii(substr(md5(t), $i, 1)) - 48 END)"

  /** t17's oracle: Bpe.train's merge loop unrolled as `merges` chained
    * MATERIALIZED CTE rounds. Words travel as t18's chr(1)-wrapped
    * symbol strings; per round, pairs come from splitting the wrap,
    * the top-1 is the deterministic (count desc, left, right) order,
    * and the merge applies as the wrapped non-overlapping replace. */
  private def bpeTrainOracle(merges: Int): String = {
    val S = "chr(1)"
    def round(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT ls[j] AS l, ls[j+1] AS r, SUM(c) AS n FROM (
         |    SELECT string_split(trim(ws, $S), $S||$S) AS ls, c FROM $prev) s,
         |    LATERAL (SELECT unnest(range(1, len(s.ls))) AS j) t
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT replace(w.ws, $S||m.l||$S||$S||m.r||$S, $S||m.l||m.r||$S) AS ws, w.c
         |  FROM $prev w, m$i m)""".stripMargin
    }
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT $S || array_to_string(list_append(string_split_regex(w, ''),
       |    '</w>'), $S||$S) || $S AS ws, COUNT(*) AS c
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
       |    w -> w != '')) AS w FROM documents) u
       |  GROUP BY 1
       |),
       |""".stripMargin +
      (1 to merges).map(round).mkString(",\n") + "\n" +
      (1 to merges).map(i =>
        s"""SELECT $i AS rank, l AS "left", r AS "right",
           |  CAST(n AS BIGINT) AS pair_count FROM m$i""".stripMargin)
        .mkString(" UNION ALL ") +
      " ORDER BY rank"
  }

  val defs: Map[String, Q] = Map(

    // Hashed-feature linear quality scorer (t10): bucket = 3 md5 hex
    // digits (0..4095), weight = Knuth-hash ramp in [-0.5, 0.5),
    // score = mean token weight. The list_sum left fold matches
    // Spark's aggregate-fold IEEE order bit-for-bit (d05 discipline).
    "t10_quality_model" -> Q(
      s"""WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    COALESCE(list_sum([
        |      CAST((((${hexCase(1)} * 256 + ${hexCase(2)} * 16 + ${hexCase(3)})
        |        % 4096) * 2654435761) % 1048576 AS DOUBLE) / 1048576.0 - 0.5
        |      for t in toks]), 0.0) AS sw
        |  FROM base)
        |SELECT doc_id, n_tokens,
        |  ROUND(sw / GREATEST(n_tokens, 1), 6) AS score,
        |  sw / GREATEST(n_tokens, 1) > 0 AS keep
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (score, keep) = Text.qualityModel(col("text"))
      Tables(s, dir).documents
        .select(col("doc_id"),
          size(Text.words(col("text"))).cast("long").as("n_tokens"),
          score.as("score"), keep.as("keep"))
        .orderBy("doc_id")
    },

    // The Gopher rule battery (Rae et al. 2021, public pretraining
    // filter set) — repetition-free doc-shape signals the t02
    // heuristics don't cover: mean word length bounds, symbol-to-word
    // ratio, bullet/ellipsis line fractions, duplicate-line fraction,
    // required-stopword hits. Pure scan-speed column arithmetic (one
    // pass over text, no shuffle until the final ORDER BY); identical
    // string ops spelled in DuckDB (replace is leftmost-non-overlap
    // in both engines, so the '...' count is engine-identical).
    "t15_gopher_rules" -> Q(
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS ws,
        |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls,
        |    (length(text) - length(replace(text, '#', ''))) AS n_hash,
        |    (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(list_sum([length(t) for t in ws]) AS DOUBLE)
        |      / GREATEST(len(ws), 1) AS mwl,
        |    CAST(n_hash + n_ell AS DOUBLE) / GREATEST(len(ws), 1) AS sym_r,
        |    CAST(len(list_filter(ls, l -> starts_with(ltrim(l), '-')
        |      OR starts_with(ltrim(l), '*'))) AS DOUBLE)
        |      / GREATEST(len(ls), 1) AS bullet_f,
        |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')))
        |      AS DOUBLE) / GREATEST(len(ls), 1) AS ellipsis_f,
        |    1.0 - CAST(len(list_distinct(ls)) AS DOUBLE)
        |      / GREATEST(len(ls), 1) AS dupl_f,
        |    CAST(len(list_filter(['the','be','to','of','and','that',
        |      'have','with'], s -> list_contains(ws, s))) AS BIGINT)
        |      AS stop_hits
        |  FROM base)
        |SELECT doc_id, n_words, ROUND(mwl, 6) AS mwl, ROUND(sym_r, 6) AS sym_r,
        |  ROUND(bullet_f, 6) AS bullet_f, ROUND(ellipsis_f, 6) AS ellipsis_f,
        |  ROUND(dupl_f, 6) AS dupl_f, stop_hits,
        |  (n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3 AND 10
        |   AND sym_r < 0.1 AND bullet_f < 0.9 AND ellipsis_f < 0.3
        |   AND dupl_f < 0.3 AND stop_hits >= 2) AS keep
        |FROM sig ORDER BY doc_id""".stripMargin) { (s, dir) =>
      fanOut(Tables(s, dir).documents).selectExpr("doc_id",
        "filter(split(text, '\\\\s+'), t -> t != '') AS ws",
        "filter(split(text, '\\n'), l -> trim(l) != '') AS ls",
        "length(text) - length(replace(text, '#', '')) AS n_hash",
        "CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_ell")
        .selectExpr("doc_id",
          "CAST(size(ws) AS BIGINT) AS n_words",
          "CAST(aggregate(ws, 0L, (a, t) -> a + length(t)) AS DOUBLE)" +
            " / GREATEST(size(ws), 1) AS mwl",
          "CAST(n_hash + n_ell AS DOUBLE) / GREATEST(size(ws), 1) AS sym_r",
          "CAST(size(filter(ls, l -> startswith(ltrim(l), '-')" +
            " OR startswith(ltrim(l), '*'))) AS DOUBLE)" +
            " / GREATEST(size(ls), 1) AS bullet_f",
          "CAST(size(filter(ls, l -> endswith(rtrim(l), '...'))) AS DOUBLE)" +
            " / GREATEST(size(ls), 1) AS ellipsis_f",
          "1.0 - CAST(size(array_distinct(ls)) AS DOUBLE)" +
            " / GREATEST(size(ls), 1) AS dupl_f",
          "CAST(size(filter(array('the','be','to','of','and','that'," +
            "'have','with'), s -> array_contains(ws, s))) AS BIGINT)" +
            " AS stop_hits")
        .selectExpr("doc_id", "n_words", "ROUND(mwl, 6) AS mwl",
          "ROUND(sym_r, 6) AS sym_r", "ROUND(bullet_f, 6) AS bullet_f",
          "ROUND(ellipsis_f, 6) AS ellipsis_f", "ROUND(dupl_f, 6) AS dupl_f",
          "stop_hits",
          "(n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3 AND 10" +
            " AND sym_r < 0.1 AND bullet_f < 0.9 AND ellipsis_f < 0.3" +
            " AND dupl_f < 0.3 AND stop_hits >= 2) AS keep")
        .orderBy("doc_id")
    },

    "t01_lang_id" -> Q(
      s"""WITH s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(w, x -> x IN (${dictSql("de")}))) AS s_de,
        |    len(list_filter(w, x -> x IN (${dictSql("en")}))) AS s_en,
        |    len(list_filter(w, x -> x IN (${dictSql("es")}))) AS s_es,
        |    len(list_filter(w, x -> x IN (${dictSql("fr")}))) AS s_fr,
        |    len(list_filter(w, x -> x IN (${dictSql("zh")}))) AS s_zh
        |  FROM (SELECT doc_id, lang,
        |          list_filter(string_split(text, ' '), x -> x <> '') AS w
        |        FROM documents))
        |SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
        |       WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        |       WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es'
        |       WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
        |       ELSE 'de' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val scores = Text.langScores(col("text"))
      Tables(s, dir).documents.select(
          Seq(col("doc_id"), col("lang")) ++
          scores.map { case (l, c) => c.as(s"s_$l") } :+
          Text.predictedLang(
            scores.map { case (l, _) => l -> col(s"s_$l") }).as("predicted"): _*)
        .orderBy("doc_id")
    },

    "t02_quality" -> Q(
      s"""SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
        |  ROUND(
        |    least(len(list_filter(string_split(text, ' '), x -> x <> '')) / 100.0, 1.0) * 0.3
        |    + (len(list_filter(string_split(text, ' '), x -> x IN (${dictSql("en")})))
        |       / CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE)) * 0.4
        |    + (1.0 - length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
        |             / CAST(length(text) AS DOUBLE)) * 0.3, 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents.select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          Text.wsTokenCount(col("text")).as("n_words"),
          Text.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    "t03_tokens" -> Q(
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpeish,
        |  ROUND(CAST(length(text) AS DOUBLE)
        |        / len(list_filter(string_split(text, ' '), x -> x <> '')), 6) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents.select(
          col("doc_id"),
          Text.wsTokenCount(col("text")).as("n_ws_tokens"),
          Text.bpeishTokenCount(col("text")).as("n_bpeish"),
          round(length(col("text")).cast("double") /
            Text.wsTokenCount(col("text")), 6).as("chars_per_token"))
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling for corpus mixing: per-source
    // caps (the mixing weights), picked in md5(id) order — seedless,
    // unbiased, identical on every engine and cluster size.
    "t05_mix_sample" -> Q(
      """SELECT doc_id, source, pick FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
        |  FROM documents)
        |WHERE pick <= CASE WHEN source IN ('src0', 'src1', 'src2') THEN 12
        |                   WHEN source = 'src3' THEN 0 ELSE 5 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Curate.mixSample(Tables(s, dir).documents,
          "doc_id", "source",
          caps = Map("src0" -> 12, "src1" -> 12, "src2" -> 12, "src3" -> 0),
          defaultCap = 5)
        .select("doc_id", "source", "pick")
        .orderBy("doc_id")
    },

    // PII scrubbing: the synthetic corpus carries no real PII, so the
    // key derives a deterministic contact block (email, phone, IPv4)
    // from existing columns — mirrored VERBATIM in the oracle — and
    // runs the real operator over it: regexp hit counts plus the
    // md5 of the redacted text, so the exact redacted bytes are
    // pinned cross-engine, not just the counts.
    "t07_pii" -> Q(
      """WITH p AS (
        |  SELECT doc_id,
        |    source || '.user' || CAST(doc_id AS VARCHAR) || '@example.com +1' ||
        |    lpad(CAST((doc_id * 7919) % 10000000 AS VARCHAR), 10, '0') || ' 10.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
        |    '.' || CAST((doc_id * 13) % 256 AS VARCHAR) || ' ' || text AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
        |  len(regexp_extract_all(t, '\+\d{10,14}')) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |    '\+\d{10,14}', '[PHONE]', 'g')) AS redacted_md5
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val pii = concat(col("source"), lit(".user"), col("doc_id").cast("string"),
        lit("@example.com +1"),
        lpad(((col("doc_id") * 7919) % 10000000).cast("string"), 10, "0"),
        lit(" 10."), (col("doc_id") % 256).cast("string"), lit("."),
        ((col("doc_id") * 7) % 256).cast("string"), lit("."),
        ((col("doc_id") * 13) % 256).cast("string"), lit(" "), col("text"))
      fanOut(Tables(s, dir).documents).withColumn("__t", pii)
        .select(Seq(col("doc_id")) ++
          Text.piiCounts(col("__t")).map { case (n, c) => c.as(n) } :+
          md5(Text.piiRedact(col("__t"))).as("redacted_md5"): _*)
        .orderBy("doc_id")
    },

    // Repetition signals (the Gopher-rules quality family): duplicate
    // -word fraction, top-word fraction, duplicate-trigram fraction —
    // the per-doc numbers a filtering pipeline thresholds on. Word
    // histogram = explode + two-level hash agg; gram stats share d04's
    // shingle builder; single-division doubles rounded to 6 hash-match
    // the oracle exactly.
    "t06_repetition" -> Q(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws,
        |    string_split(text, ' ') AS w
        |  FROM documents),
        |wstat AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
        |         COUNT(*) AS n_distinct, MAX(c) AS top_c
        |  FROM (SELECT doc_id, wrd, COUNT(*) AS c
        |        FROM (SELECT doc_id, unnest(ws) AS wrd FROM t)
        |        GROUP BY 1, 2)
        |  GROUP BY 1),
        |gstat AS (
        |  SELECT doc_id,
        |    len(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)])) AS n_dg,
        |    greatest(len(w) - 2, 0) AS n_g
        |  FROM t)
        |SELECT w.doc_id AS doc_id, n_words,
        |  ROUND(1 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
        |  ROUND(CAST(top_c AS DOUBLE) / n_words, 6) AS top_word_frac,
        |  CASE WHEN n_g > 0
        |       THEN ROUND(1 - CAST(n_dg AS DOUBLE) / n_g, 6)
        |       ELSE 0.0 END AS dup_gram_frac,
        |  (ROUND(1 - CAST(n_distinct AS DOUBLE) / n_words, 6) > 0.3
        |   OR ROUND(CAST(top_c AS DOUBLE) / n_words, 6) > 0.2
        |   OR CASE WHEN n_g > 0
        |           THEN ROUND(1 - CAST(n_dg AS DOUBLE) / n_g, 6)
        |           ELSE 0.0 END > 0.18) AS flagged
        |FROM wstat w JOIN gstat g ON w.doc_id = g.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Text.repetitionSignals(Tables(s, dir).documents, "doc_id", "text")
        .orderBy("doc_id")
    },

    // Concat-and-chunk sequence packing: docs in md5(id) order, one
    // separator token between docs, cut into 512-token training
    // sequences. The oracle is the single-window spelling; the Spark
    // plan is the distributed two-phase prefix sum (order-preserving
    // md5-prefix buckets + broadcast bucket offsets) — byte-identical
    // output, no global window.
    "t08_pack_sequences" -> Q(
      """WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens + 1) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(cum - n_tokens - 1 AS BIGINT) AS start_off,
        |  CAST((cum - n_tokens - 1) // 512 AS BIGINT) AS seq_id,
        |  CAST((cum - n_tokens - 1) % 512 AS BIGINT) AS seq_off,
        |  CAST((cum - 1) // 512 - (cum - n_tokens - 1) // 512 + 1 AS BIGINT) AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Curate.packSequences(Tables(s, dir).documents,
          "doc_id", "text", seqLen = 512)
        .orderBy("doc_id")
    },

    // Temperature-weighted mixing: per-source keep counts ∝ sqrt(n_s)
    // (alpha = 0.5 upweights small sources), budget 100. Weights round
    // to integers before normalizing so the caps are exact long
    // division in both engines; selection is the same deterministic
    // md5-order top-k as t05.
    "t09_temperature_mix" -> Q(
      """WITH n AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1),
        |w AS (SELECT source, CAST(ROUND(SQRT(ns) * 1000000) AS BIGINT) AS w FROM n),
        |c AS (SELECT source,
        |        CAST((100 * w) // (SELECT SUM(w) FROM w) AS BIGINT) AS cap FROM w),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
        |      FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.pick AS BIGINT) AS pick
        |FROM r JOIN c USING (source) WHERE r.pick <= c.cap
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Curate.temperatureMix(Tables(s, dir).documents,
          "doc_id", "source", budget = 100L)
        .select("doc_id", "source", "pick")
        .orderBy("doc_id")
    },

    // Deterministic global corpus shuffle (t11): rank in seedless md5
    // order, strided into 8 shards (shard = rank mod 8, pos = rank div
    // 8 — every shard a uniform corpus sample, sizes within one).
    // Spark side computes the rank with the t08 distributed prefix sum
    // (md5-prefix buckets, no global window); the oracle's single
    // row_number window is the same math at DuckDB's single-node scale.
    "t11_global_shuffle" -> Q(
      """WITH r AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rk
        |  FROM documents)
        |SELECT doc_id, CAST(rk % 8 AS INT) AS shard, rk // 8 AS pos
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Curate.globalShuffle(Tables(s, dir).documents,
          "doc_id", nShards = 8)
        .orderBy("doc_id")
    },

    // Size-balanced shard assignment (t20): docs in seedless md5
    // order, char-sizes prefix-summed, shard = exclusive-cum div
    // 65536 — ~64 KiB shards that only ever overshoot by one doc.
    // Spark side is the t08 distributed prefix sum (md5-prefix
    // buckets, no global window); the oracle's single cumsum window
    // is the same math at DuckDB's single-node scale.
    "t20_shard_assign" -> Q(
      """WITH c AS (
        |  SELECT doc_id, LENGTH(text) AS n_size,
        |    SUM(LENGTH(text)) OVER (
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)
        |SELECT doc_id, CAST(n_size AS BIGINT) AS n_size,
        |  CAST(cum - n_size AS BIGINT) AS start_off,
        |  CAST((cum - n_size) // 65536 AS INT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Curate.shardBySize(Tables(s, dir).documents,
          "doc_id", length(col("text")), shardSize = 65536L)
        .orderBy("doc_id")
    },

    // Stable train/val/test split (t13): bucket = first 4 hex digits
    // of md5('split:' || id) in [0, 65536), cut at integer thresholds
    // 90% / 95% — a pure function of the id, so re-processing the
    // corpus can never migrate a document across the eval boundary.
    "t13_dataset_split" -> Q {
      val trainTh = 65536L * 90 / 100
      val valTh = 65536L * 95 / 100
      def hx(i: Int): String =
        s"(CASE WHEN ascii(substr(h, $i, 1)) >= 97" +
          s" THEN ascii(substr(h, $i, 1)) - 87" +
          s" ELSE ascii(substr(h, $i, 1)) - 48 END)"
      s"""WITH m AS (
        |  SELECT doc_id, source,
        |    md5('split:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, source,
        |    ((${hx(1)} * 16 + ${hx(2)}) * 16 + ${hx(3)}) * 16 + ${hx(4)} AS bkt
        |  FROM m)
        |SELECT doc_id, source,
        |  CASE WHEN bkt < $trainTh THEN 'train'
        |       WHEN bkt < $valTh THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin } { (s, dir) =>
      graft.operators.Curate.datasetSplit(Tables(s, dir).documents, "doc_id")
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    },

    // Vocabulary induction (t12): corpus-wide unigram + bigram counts,
    // top 200 by (count desc, token asc) — the frequency-mining core
    // of tokenizer training. One explode + hash aggregate (map-side
    // combining collapses hot tokens before the shuffle) + distributed
    // top-k (TakeOrderedAndProject — per-partition heads, never a
    // global sort). Bigrams contain a space, so they can never collide
    // with a unigram and `token` alone is a total key.
    "t12_vocab_mine" -> Q(
      """WITH w AS (
        |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |u AS (SELECT unnest(toks) AS token FROM w),
        |b AS (SELECT unnest(list_transform(range(1, GREATEST(len(toks), 1)),
        |        i -> toks[i] || ' ' || toks[i + 1])) AS token FROM w),
        |a AS (SELECT token FROM u UNION ALL SELECT token FROM b)
        |SELECT token, COUNT(*) AS n FROM a GROUP BY token
        |ORDER BY n DESC, token LIMIT 200""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
        .select(Text.words(col("text")).as("w"))
      val uni = docs.select(explode(col("w")).as("token"))
      val bi = docs.select(explode(
          when(size(col("w")) < 2, array().cast("array<string>"))
            .otherwise(expr("transform(sequence(1, size(w) - 1)," +
              " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))")))
          .as("token"))
      uni.unionAll(bi).groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("token")).limit(200)
    },

    // Unigram-LM perplexity scoring (t14) — the CCNet-style quality
    // signal: train a unigram LM on the corpus itself (token counts /
    // total), score each doc by its mean negative log-likelihood.
    // Scale shape: the vocab is one partial-agg scan and is
    // VOCABULARY-sized, so it broadcast-joins into the scoring pass
    // (map-side — the hot-token skew a shuffled token join would
    // have) and the per-doc mean is a partial avg. -ln sums bridge
    // engines at round 6 (term-order error ~1e-13).
    // BPE merge-table training (Sennrich et al. 2016). Hash-exact
    // since r16: the sequentially data-dependent merge loop (each
    // round's arg-max feeds the next) UNROLLS into 12 chained
    // MATERIALIZED CTE rounds — per round a pair-count aggregate over
    // the word table, the deterministic top-1 (count desc, left,
    // right), and the merge applied via t18's chr(1)-wrapped
    // non-overlapping replace trick. MATERIALIZED is load-bearing:
    // each w_i is referenced twice (pairs of round i+1 + merge of
    // round i+1), so inlined CTEs re-derive the chain 2^12 times;
    // materialized, the whole 12-round replay runs in ~0.2 s. Early
    // exhaustion matches too: an empty top-1 empties every later CTE,
    // which is exactly Bpe.train's early stop. BpeSpec still pins the
    // loop against an independent in-test reference on fixtures.
    // The Spark loop itself is distributed (explode + hash-agg pair
    // counts, distributed top-1) — see operators/Bpe.
    "t17_bpe_train" -> Q(bpeTrainOracle(12)) { (s, dir) =>
      Bpe.train(Tables(s, dir).documents, "text", 12)
    },

    // BPE tokenizer APPLICATION — t17's trained merge table encodes
    // the corpus (the tokenize step every pretraining pipeline runs
    // after training its tokenizer). The merge table is model-scale
    // and travels as literals inside the fold expression (broadcast
    // by value, no join); the encode itself is a per-row rank-order
    // fold — scan speed, zero shuffles beyond the train step.
    // Hash-exact since r13 via the Q.dynamic fitted-model discipline:
    // the TRAIN loop stays non-portable (t17's contract), but the
    // encode replays in DuckDB over the fitted merge pairs spliced as
    // literals. DuckDB 1.0's list_reduce has no initial accumulator,
    // so the left-to-right non-overlapping merge fold is realized as
    // chained string replace over a \x01-wrapped symbol string:
    // each symbol travels as <SEP>sym<SEP>, a merge (l,r)->lr is
    // replace(<SEP>l<SEP><SEP>r<SEP> -> <SEP>lr<SEP>) — wrapped
    // occurrences never share characters, so replace's left-to-right
    // non-overlapping scan IS the fold (a just-merged symbol cannot
    // re-merge in the same round; symbols are never empty). BpeSpec
    // still pins encode against an independent reference.
    "t18_bpe_encode" -> Q.dynamic { (s, dir) =>
      graft.functions.GraftFunctions.ensureRegistered(s)
      val merges = Bpe.train(Tables(s, dir).documents, "text", 12)
        .orderBy("rank").collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
        .toSeq
      def q(x: String) = "'" + x.replace("'", "''") + "'"
      val S = "chr(1)"
      val base = s"$S || array_to_string(list_append(" +
        s"string_split_regex(w, ''), '</w>'), $S || $S) || $S"
      val folded = merges.foldLeft(base) { case (acc, (l, r)) =>
        s"replace($acc, $S || ${q(l)} || $S || $S || ${q(r)} || $S, " +
          s"$S || ${q(l + r)} || $S)"
      }
      s"""WITH toks AS (
         |  SELECT doc_id, flatten(list_transform(
         |    list_filter(string_split(text, ' '), w -> w != ''),
         |    w -> string_split(trim($folded, chr(1)), chr(1) || chr(1)))) AS t
         |  FROM documents)
         |SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
         |  array_to_string(t[1:12], ' ') AS head_tokens
         |FROM toks ORDER BY doc_id""".stripMargin
    } { (s, dir) =>
      graft.functions.GraftFunctions.ensureRegistered(s)
      val docs = Tables(s, dir).documents
      val merges = Bpe.train(docs, "text", 12)
        .orderBy("rank").collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
        .toSeq
      docs.select(col("doc_id"),
          Bpe.encode(col("text"), merges).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          array_join(slice(col("toks"), 1, 12), " ").as("head_tokens"))
        .orderBy("doc_id")
    },

    // Compression-ratio quality gate (DCLM / RefinedWeb
    // compressibility signal): deflate bytes over raw bytes —
    // repetitive/boilerplate text compresses far below prose.
    // *Rows-only*: the byte count depends on the zlib build, so no
    // cross-engine oracle exists; ChDialect4Spec pins monotonicity
    // (repetitive < prose < random), determinism, and the kernel's
    // round-trip byte count.
    "t19_compress_ratio" -> Q.rowsOnly { (s, dir) =>
      graft.functions.GraftFunctions.ensureRegistered(s)
      Tables(s, dir).documents
        .select(col("doc_id"), octet_length(col("text")).as("n_bytes"),
          graft.operators.Text.compressionRatio(col("text")).as("r"))
        .select(col("doc_id"), col("n_bytes"),
          round(col("r"), 4).as("ratio"),
          (col("r") >= 0.25).as("keep"))
        .orderBy("doc_id")
    },

    // DSIR importance weighting (Xie et al. 2023): hashed-unigram
    // bag models for the target domain (4 of the 20 sources) vs the
    // raw pool, Laplace-smoothed log-likelihood ratio per doc, keep
    // where the target model wins. Bucket-count tables are ≤1024 rows
    // and broadcast — no token-level shuffle; round-6 bridged sums
    // (the t14 discipline).
    "t16_dsir" -> Q(
      s"""WITH w AS (
        |  SELECT doc_id, source IN ('src0','src1','src2','src3') AS tg,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, tg,
        |    ((${hexCase(1)} * 256 + ${hexCase(2)} * 16 + ${hexCase(3)})
        |      % 1024) AS b
        |  FROM w),
        |db AS (
        |  SELECT doc_id, tg, b, COUNT(*) AS c
        |  FROM b GROUP BY doc_id, tg, b),
        |tgt AS (SELECT b, SUM(CASE WHEN tg THEN c ELSE 0 END) AS ct,
        |    SUM(c) AS cr
        |  FROM db GROUP BY b),
        |nt AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM tgt),
        |s AS (
        |  SELECT db.doc_id, db.c,
        |    ln((tgt.ct + 1.0) / (nt.nt + 1024.0))
        |      - ln((tgt.cr + 1.0) / (nt.nr + 1024.0)) AS lw
        |  FROM db JOIN tgt USING (b) CROSS JOIN nt),
        |d AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    ROUND(SUM(c * lw), 6) AS logw
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_tokens, logw, logw > 0 AS keep
        |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Text.dsirScore(fanOut(Tables(s, dir).documents), "doc_id", "text",
          col("source").isin("src0", "src1", "src2", "src3"))
        .orderBy("doc_id")
    },

    // Character-entropy quality gate (t21): Shannon bits/char — the
    // cheap noise detector next to t02/t15 (near-zero = repeated-char
    // boilerplate, very high = base64/binary junk; prose ~3.5-4.5).
    // The per-doc fold runs over the CHAR-SORTED count list, a
    // deterministic summation order the oracle replays term for term;
    // both sides divide by the same ln(2) literal (no second libm
    // call) and round-6 bridges ln ulps (the t14 discipline).
    "t21_char_entropy" -> Q(
      """WITH b AS (
        |  SELECT doc_id, text, length(text) AS len
        |  FROM documents WHERE length(text) > 0),
        |ch AS (
        |  SELECT doc_id, len, unnest(string_split_regex(text, '')) AS c
        |  FROM b),
        |cnt AS (SELECT doc_id, len, c, COUNT(*) AS n FROM ch GROUP BY 1, 2, 3),
        |e AS (
        |  SELECT doc_id, len,
        |    ROUND(list_reduce(list_transform(list(CAST(n AS DOUBLE) ORDER BY c),
        |        x -> (x / len) * ln(x / len)), (a, b) -> a + b)
        |      / -0.6931471805599453, 6) AS entropy
        |  FROM cnt GROUP BY doc_id, len)
        |SELECT doc_id, CAST(len AS BIGINT) AS n_chars, entropy,
        |  (entropy >= 2.0 AND entropy <= 6.0) AS keep
        |FROM e ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Text.charEntropy(Tables(s, dir).documents, "doc_id", "text")
        .orderBy("doc_id")
    },

    // Bigram LM log-perplexity (t22): the smoothed upgrade of t14's
    // unigram signal — per-doc mean of -ln p(w2|w1) under an add-one
    // (Laplace) corpus bigram model, the classic cheap LM-quality
    // filter. Same discipline as t14: corpus model via one hash agg
    // per table (bigram counts, context counts, |V|), broadcast into
    // a scan-speed scoring pass; round-6 bridges ln ulps and the avg
    // order. Docs with < 2 tokens carry no bigram and drop on both
    // engines identically. Bigrams ride the same positional-gram
    // kernel d04 uses (raw space-split tokens, empties included —
    // mirrored exactly by the oracle's list comprehension).
    "t22_bigram_logppl" -> Q(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
        |    for i in range(1, len(ws))]) AS b
        |  FROM w),
        |bgc AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b),
        |ctx AS (SELECT string_split(b, ' ')[1] AS c1, COUNT(*) AS cc
        |        FROM bg GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT t) AS v FROM
        |        (SELECT unnest(ws) AS t FROM w)),
        |s AS (
        |  SELECT bg.doc_id,
        |    -ln((bgc.cb + 1.0) / (ctx.cc + v.v)) AS lp
        |  FROM bg JOIN bgc USING (b)
        |  JOIN ctx ON ctx.c1 = string_split(bg.b, ' ')[1]
        |  CROSS JOIN v)
        |SELECT doc_id, ROUND(AVG(lp), 6) AS logppl,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val bg = docs.select(col("doc_id"),
        explode(Dedup.wordNGramsAll(col("text"), 2)).as("b"))
      val bgc = bg.groupBy("b").agg(count(lit(1)).as("cb"))
      val ctx = bg.select(element_at(split(col("b"), " ", -1), 1).as("c1"))
        .groupBy("c1").agg(count(lit(1)).as("cc"))
      val v = docs.select(explode(split(col("text"), " ", -1)).as("t"))
        .agg(countDistinct("t").as("v"))
      bg.join(broadcast(bgc), Seq("b"))
        .join(broadcast(ctx),
          element_at(split(col("b"), " ", -1), 1) === col("c1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          (-log((col("cb") + lit(1.0)) / (col("cc") + col("v")))).as("lp"))
        .groupBy("doc_id")
        .agg(round(avg("lp"), 6).as("logppl"),
          count(lit(1)).as("n_bigrams"))
        .orderBy("doc_id")
    },

    "t14_unigram_logppl" -> Q(
      """WITH w AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS t
        |  FROM documents),
        |v AS (SELECT t, COUNT(*) AS c FROM w GROUP BY t),
        |n AS (SELECT SUM(c) AS n FROM v),
        |s AS (
        |  SELECT w.doc_id, -ln(CAST(v.c AS DOUBLE) / n.n) AS lp
        |  FROM w JOIN v USING (t) CROSS JOIN n)
        |SELECT doc_id, ROUND(AVG(lp), 6) AS logppl,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(Text.words(col("text"))).as("t"))
      val vocab = toks.groupBy("t").agg(count(lit(1)).as("c"))
      val total = vocab.agg(sum("c").as("n"))
      toks.join(broadcast(vocab), Seq("t"))
        .crossJoin(broadcast(total))
        .select(col("doc_id"),
          (-log(col("c").cast("double") / col("n"))).as("lp"))
        .groupBy("doc_id")
        .agg(round(avg("lp"), 6).as("logppl"),
          count(lit(1)).as("n_tokens"))
        .orderBy("doc_id")
    },

    "t04_fingerprint" -> Q(
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS fp_short,
        |  length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents.select(
          col("doc_id"),
          Text.fingerprint(col("text")).as("fp"),
          substring(Text.fingerprint(col("text")), 1, 8).as("fp_short"),
          length(Text.normalized(col("text"))).as("norm_len"))
        .orderBy("doc_id")
    }
  )
}
