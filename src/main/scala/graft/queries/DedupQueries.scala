package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, NearDupIndex}

/** Dedup pipeline coverage (SURVEY §2 d01–d04) over the `documents`
  * table. The synthetic corpus has planted near-duplicate pairs
  * (bigram Jaccard ≥ 0.96, SimHash Hamming ≤ 4), so every stage of
  * the funnel produces real matches. d01/d04 are DuckDB-oracled;
  * d02/d03 involve signature hash families DuckDB can't reproduce
  * (splitmix64 permutations) → rows-only here, semantics pinned by
  * DedupSpec on planted data.
  */
object DedupQueries {

  val defs: Map[String, Q] = Map(

    // Exact dedup: keep min doc_id per md5(text). On this corpus all
    // 500 digests are unique — the oracle still pins the digest
    // computation, the keep-min rule, and the full surviving row.
    "d01_exact_dedup" -> Q(
      """SELECT doc_id, source, digest FROM (
        |  SELECT doc_id, source, md5(text) AS digest,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.exact(Tables(s, dir).documents, "text", "doc_id")
        .select("doc_id", "source", "digest")
        .orderBy("doc_id")
    },

    // Priority-keeper exact dedup (d26): the same content arriving
    // from several sources keeps the BEST-ranked copy — curated beats
    // the original crawl beats a mirror — with id as tiebreak. The
    // corpus has no cross-source exact dups, so the query plants them
    // (the d22/d15 synthesis discipline): every 4th doc gains a
    // mirror copy, every 8th a curated copy. Keeper selection is one
    // partial-agg min(struct(priority, id, …)) per digest — the d01
    // shuffle shape, so mirrored boilerplate collapses map-side.
    "d26_priority_dedup" -> Q(
      """WITH base AS (
        |  SELECT doc_id, source, text, 1 AS prio FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'zmirror', text, 2 FROM documents
        |  WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, 'curated', text, 0 FROM documents
        |  WHERE doc_id % 8 = 0),
        |r AS (
        |  SELECT doc_id, source, md5(text) AS digest,
        |    row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY prio, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
        |  FROM base)
        |SELECT doc_id, source, n_copies, digest FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents.select("doc_id", "source", "text")
      val mirror = docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          lit("zmirror").as("source"), col("text"))
      val curated = docs.filter(col("doc_id") % 8 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          lit("curated").as("source"), col("text"))
      val ranked = docs.unionByName(mirror).unionByName(curated)
        .withColumn("prio",
          when(col("source") === "curated", 0)
            .when(col("source") === "zmirror", 2)
            .otherwise(1))
      Dedup.exactByPriority(ranked, "text", "doc_id", "prio")
        .select("doc_id", "source", "n_copies", "digest")
        .orderBy("doc_id")
    },

    // Sub-document chunk dedup with reassembly (CCNet's paragraph
    // pass over fixed 16-word windows — no newline structure in this
    // corpus): every chunk keeps its globally-first (doc_id, pos)
    // occurrence, docs are rebuilt from surviving chunks in order.
    // Keeper selection is a partial-agg min(struct) per chunk hash —
    // zero joins on the hash, so boilerplate chunks collapse
    // map-side (see Dedup.chunkDedup).
    "d24_chunk_dedup" -> Q(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |ch AS (
        |  SELECT doc_id, CAST(i AS INT) AS pos,
        |    array_to_string(list_slice(words, i*16 + 1, i*16 + 16), ' ') AS txt
        |  FROM w, UNNEST(range(CAST(ceil(len(words)/16.0) AS BIGINT))) AS t(i)),
        |k AS (
        |  SELECT doc_id, pos, txt,
        |    row_number() OVER (PARTITION BY md5(txt) ORDER BY doc_id, pos) AS rn
        |  FROM ch),
        |r AS (
        |  SELECT doc_id, string_agg(txt, ' ' ORDER BY pos) AS clean_text,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept
        |  FROM k WHERE rn = 1 GROUP BY doc_id),
        |n AS (
        |  SELECT doc_id,
        |    CAST(ceil(len(string_split(text, ' '))/16.0) AS INT) AS n_chunks
        |  FROM documents)
        |SELECT n.doc_id, COALESCE(r.clean_text, '') AS clean_text,
        |  n.n_chunks, COALESCE(r.n_kept, 0) AS n_kept
        |FROM n LEFT JOIN r ON n.doc_id = r.doc_id
        |ORDER BY n.doc_id""".stripMargin) { (s, dir) =>
      Dedup.chunkDedup(Tables(s, dir).documents, "doc_id", "text", 16)
        .orderBy("doc_id")
    },

    // Duplicated-substring removal with reassembly (Lee et al. 2022
    // exact-substring dedup): every 8-word span that occurs elsewhere
    // in the corpus keeps only its globally-first (doc, pos)
    // occurrence; later occurrences' tokens are cut and docs rebuilt
    // from the survivors. First-occurrence selection is a partial-agg
    // min(struct) per span hash; coverage union + anti-join does the
    // removal (see Dedup.substringDedup).
    "d25_substring_dedup" -> Q(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |occ AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS p,
        |    md5(array_to_string(list_slice(words, i, i + 7), ' ')) AS h
        |  FROM w, UNNEST(range(1, len(words) - 6)) AS t(i)),
        |d AS (
        |  SELECT doc_id, p,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
        |  FROM occ),
        |cov AS (
        |  SELECT DISTINCT doc_id, CAST(p + j AS INT) AS tp
        |  FROM d, UNNEST(range(8)) AS u(j) WHERE rn > 1),
        |tok AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS tp, words[i] AS wd
        |  FROM w, UNNEST(range(1, len(words) + 1)) AS t(i)),
        |kept AS (
        |  SELECT tok.doc_id, tok.tp, tok.wd FROM tok
        |  ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp),
        |r AS (
        |  SELECT doc_id, string_agg(wd, ' ' ORDER BY tp) AS clean_text,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept
        |  FROM kept GROUP BY doc_id),
        |n AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT n.doc_id, COALESCE(r.clean_text, '') AS clean_text,
        |  n.n_tokens, n.n_tokens - COALESCE(r.n_kept, 0) AS n_removed
        |FROM n LEFT JOIN r ON n.doc_id = r.doc_id
        |ORDER BY n.doc_id""".stripMargin) { (s, dir) =>
      Dedup.substringDedup(fanOut(Tables(s, dir).documents), "doc_id", "text", 8)
        .orderBy("doc_id")
    },

    // URL-canonicalization dedup — the web-corpus FIRST dedup pass
    // (CommonCrawl-style): normalize scheme noise (case, www.,
    // trailing slash, utm_* tracking params) to a canonical key,
    // keep the min doc per key. Pure hash-groupBy on the canonical
    // string — map-side combining, one shuffle; the noisy URL
    // synthesis plants 4 collision classes per (source, lang, id%10)
    // so the dedup rule is actually exercised.
    "d22_url_dedup" -> Q(
      """WITH u AS (
        |  SELECT doc_id,
        |    concat(CASE WHEN doc_id % 3 = 0 THEN 'https://WWW.'
        |                ELSE 'https://' END,
        |      source, '.Example.com/docs/', lang,
        |      CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
        |      CASE WHEN doc_id % 4 = 0
        |        THEN '?utm_source=x&id=' || CAST(doc_id % 10 AS VARCHAR)
        |        ELSE '?id=' || CAST(doc_id % 10 AS VARCHAR) END) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(regexp_extract(url, '://([^/?]+)', 1)),
        |      '^www\.', '')
        |    || rtrim(regexp_extract(url, '://[^/?]+(/[^?]*)', 1), '/')
        |    || CASE WHEN array_to_string(list_filter(
        |           string_split(regexp_extract(url, '\?(.*)$', 1), '&'),
        |           p -> NOT starts_with(p, 'utm_')), '&') = '' THEN ''
        |         ELSE '?' || array_to_string(list_filter(
        |           string_split(regexp_extract(url, '\?(.*)$', 1), '&'),
        |           p -> NOT starts_with(p, 'utm_')), '&') END AS canon
        |  FROM u)
        |SELECT canon, MIN(doc_id) AS keep_doc,
        |  CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM c GROUP BY canon ORDER BY canon""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .selectExpr("doc_id",
          """concat(CASE WHEN doc_id % 3 = 0 THEN 'https://WWW.'
            |            ELSE 'https://' END,
            |  source, '.Example.com/docs/', lang,
            |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
            |  CASE WHEN doc_id % 4 = 0
            |    THEN concat('?utm_source=x&id=', CAST(doc_id % 10 AS STRING))
            |    ELSE concat('?id=', CAST(doc_id % 10 AS STRING)) END)
            |AS url""".stripMargin)
        .selectExpr("doc_id",
          """concat(
            |  regexp_replace(lower(regexp_extract(url, '://([^/?]+)', 1)),
            |    '^www\\.', ''),
            |  rtrim('/', regexp_extract(url, '://[^/?]+(/[^?]*)', 1)),
            |  CASE WHEN array_join(filter(
            |      split(regexp_extract(url, '\\?(.*)$', 1), '&'),
            |      p -> NOT startswith(p, 'utm_')), '&') = '' THEN ''
            |    ELSE concat('?', array_join(filter(
            |      split(regexp_extract(url, '\\?(.*)$', 1), '&'),
            |      p -> NOT startswith(p, 'utm_')), '&')) END)
            |AS canon""".stripMargin)
        .groupBy("canon")
        .agg(min("doc_id").as("keep_doc"),
          count(lit(1)).as("n_dups"))
        .orderBy("canon")
    },

    // MinHash+LSH candidates at est Jaccard ≥ 0.5: recovers the
    // planted near-dup pairs without any O(n²) comparison.
    // MinHash + LSH near-dup (d02): upgraded from rows-only to a
    // hash-exact oracle — the native minhash64 kernel is md5-base +
    // splitmix64 permutations, and splitmix64's wrapping 64-bit
    // arithmetic is emulated in DuckDB with HUGEINT limb
    // decomposition (x·C mod 2⁶⁴ = (x_lo·C + ((x_hi·C) mod 2³²)·2³²)
    // mod 2⁶⁴ — every intermediate < 2⁹⁷ fits HUGEINT), validated
    // bit-for-bit against the kernel. The kernel's mins compare as
    // SIGNED longs, so hashes convert to BIGINT before MIN. Bands
    // bucket on the slice VALUES where Spark buckets on
    // xxhash64(slice) — candidate-equivalent (hash-equal ⟺
    // value-equal, modulo 2⁻⁶⁴ collisions); the [2, maxBucket] bound
    // and the est-Jaccard ≥ 0.5 verify are mirrored exactly.
    "d02_minhash_lsh" -> Q(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |      FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)),
        |b0 AS (SELECT doc_id, CAST('0x' || substr(md5(g), 1, 16) AS UBIGINT) AS base FROM g),
        |pj AS (SELECT doc_id, base, j FROM b0 CROSS JOIN (SELECT unnest(range(64)) AS j) p),
        |s0 AS (SELECT doc_id, j, CAST((CAST(base AS HUGEINT) + j + 11400714819323198485)
        |        % 18446744073709551616 AS UBIGINT) AS z0 FROM pj),
        |s1 AS (SELECT doc_id, j, xor(z0, z0 >> 30) AS x1 FROM s0),
        |s2 AS (SELECT doc_id, j, CAST((CAST(x1 % 4294967296 AS HUGEINT) * 13787848793156543929
        |        + ((CAST(x1 // 4294967296 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296)
        |        % 18446744073709551616 AS UBIGINT) AS z1 FROM s1),
        |s3 AS (SELECT doc_id, j, xor(z1, z1 >> 27) AS x2 FROM s2),
        |s4 AS (SELECT doc_id, j, CAST((CAST(x2 % 4294967296 AS HUGEINT) * 10723151780598845931
        |        + ((CAST(x2 // 4294967296 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296)
        |        % 18446744073709551616 AS UBIGINT) AS z2 FROM s3),
        |hu AS (SELECT doc_id, j, xor(z2, z2 >> 31) AS hu FROM s4),
        |hs AS (SELECT doc_id, j, CAST(CAST(hu AS HUGEINT)
        |        - CASE WHEN hu >= 9223372036854775808 THEN CAST(18446744073709551616 AS HUGEINT)
        |               ELSE 0 END AS BIGINT) AS h FROM hu),
        |sig AS (SELECT doc_id, j, MIN(h) AS m FROM hs GROUP BY doc_id, j),
        |bands AS (SELECT doc_id, CAST(j // 2 AS INT) AS band,
        |           MIN(CASE WHEN j % 2 = 0 THEN m END) AS k1,
        |           MIN(CASE WHEN j % 2 = 1 THEN m END) AS k2
        |          FROM sig GROUP BY doc_id, j // 2),
        |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY band, k1, k2) AS bs FROM bands),
        |p AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |      FROM sized a JOIN sized b
        |        ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2 AND a.doc_id < b.doc_id
        |      WHERE a.bs BETWEEN 2 AND 100),
        |est AS (SELECT p.id1, p.id2,
        |         SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / 64.0 AS ej
        |        FROM p JOIN sig sa ON sa.doc_id = p.id1
        |               JOIN sig sb ON sb.doc_id = p.id2 AND sb.j = sa.j
        |        GROUP BY p.id1, p.id2)
        |SELECT id1, id2, ROUND(ej, 4) AS est_jaccard FROM est WHERE ej >= 0.5
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      Dedup.minHashLsh(fanOut(Tables(s, dir).documents), "doc_id", "text",
          numHashes = 64, bandRows = 2, minEstJaccard = 0.5)
        .select(col("id1"), col("id2"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("id1", "id2")
    },

    // SimHash banding + exact Hamming verify (≤ 4 bits of 64).
    // SimHash banding near-dup (d03): the native simhash64 kernel is
    // md5-derived, so the oracle rebuilds the WHOLE pipeline in pure
    // SQL (the f09 reconstruction: per-token 64-bit md5 prefix →
    // per-bit majority → bit_or), then mirrors the 16-bit banding,
    // the [2, maxBucket] bucket bound, candidate pairing, and the
    // exact hamming verify — upgraded from rows-only to hash-exact.
    "d03_simhash" -> Q(
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text,' '), w -> w <> '')) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, CAST('0x'||substr(md5(w),1,16) AS UBIGINT) AS hv FROM toks),
        |bits AS (
        |  SELECT doc_id, i, SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
        |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS i) g GROUP BY doc_id, i),
        |sim AS (
        |  SELECT doc_id, bit_or(CASE WHEN acc > 0 THEN (CAST(1 AS UBIGINT) << i)
        |                        ELSE CAST(0 AS UBIGINT) END) AS sh
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, (sh >> CAST(b.i * 16 AS INT)) & 65535 AS key, b.i AS band
        |  FROM sim CROSS JOIN (SELECT unnest(range(4)) AS i) b),
        |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY band, key) AS bs FROM bands),
        |p AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM sized a JOIN sized b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        |  WHERE a.bs BETWEEN 2 AND 1000),
        |j AS (
        |  SELECT p.id1, p.id2,
        |    CAST(bit_count(xor(s1.sh, s2.sh)) AS INT) AS hamming
        |  FROM p JOIN sim s1 ON s1.doc_id = p.id1
        |         JOIN sim s2 ON s2.doc_id = p.id2)
        |SELECT id1, id2, hamming FROM j WHERE hamming <= 4
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      Dedup.simHashNearDup(Tables(s, dir).documents, "doc_id", "text",
          bandBits = 16, maxHamming = 4)
        .orderBy("id1", "id2")
    },

    // Exact trigram Jaccard ≥ 0.5 on lang-blocked pairs — DuckDB
    // mirrors the gram construction with a list comprehension, so the
    // Jaccard doubles match exactly (same int counts, one division).
    // Trigrams, not bigrams: the shingle universe is |vocab|³, so the
    // per-gram document frequency (which drives the sparse self-join's
    // cost quadratically) stays tiny even on a narrow vocabulary —
    // same reason real dedup pipelines shingle at n=3..5.
    // The gram document-frequency cap (df ≤ 1000 within a block) is
    // mirrored in the oracle: both engines drop the same
    // carries-no-signal boilerplate grams before the join, so the
    // Jaccard doubles still match exactly. Set sizes sz stay UNCAPPED
    // on both sides.
    // The composed curation funnel (lang-ID → quality gate → exact
    // dedup → trigram near-dup removal → stats): the whole
    // training-data pipeline as ONE plan, every stage's arithmetic
    // identical to its standalone key (t01/t02/t04/d04), end-to-end
    // DuckDB-oracled.
    "d09_curate_pipeline" -> Q(
      s"""WITH s0 AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |s1 AS (
        |  SELECT doc_id, text, ws,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("de")}))) AS s_de,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("en")}))) AS s_en,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("es")}))) AS s_es,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("fr")}))) AS s_fr,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("zh")}))) AS s_zh
        |  FROM s0),
        |s2 AS (
        |  SELECT doc_id, text,
        |    CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
        |         WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        |         WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es'
        |         WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
        |         ELSE 'de' END AS predicted,
        |    ROUND(least(len(ws) / 100.0, 1.0) * 0.3
        |      + (len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("en")})))
        |         / CAST(len(ws) AS DOUBLE)) * 0.4
        |      + (1.0 - length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
        |               / CAST(length(text) AS DOUBLE)) * 0.3, 6) AS quality,
        |    len(ws) AS n_tokens,
        |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        |  FROM s1),
        |kept AS (SELECT * FROM s2 WHERE predicted = 'en' AND quality >= 0.45),
        |ex AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM kept) WHERE rn = 1),
        |g AS (
        |  SELECT doc_id, len(gs) AS sz, unnest(gs) AS g FROM (
        |    SELECT doc_id,
        |      list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS gs
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM ex))),
        |gf AS (
        |  SELECT doc_id, sz, g FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY g) AS df FROM g)
        |  WHERE df <= 1000),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter,
        |         MIN(a.sz) AS sa, MIN(b.sz) AS sb
        |  FROM gf a JOIN gf b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dropd AS (SELECT DISTINCT id2 FROM p
        |  WHERE CAST(inter AS DOUBLE) / (sa + sb - inter) >= 0.5)
        |SELECT doc_id, predicted, quality, n_tokens FROM ex
        |WHERE doc_id NOT IN (SELECT id2 FROM dropd)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Curate.funnel(Tables(s, dir).documents, "doc_id", "text",
          fanScore = fanOut)
        .orderBy("doc_id")
    },

    // Benchmark decontamination: corpus docs sharing ≥5 distinct
    // trigrams with ANY benchmark doc (here: the deterministic 1%
    // doc_id % 97 slice plays the eval suite) are flagged. The
    // benchmark gram set broadcasts — no corpus×benchmark blowup; the
    // oracle recomputes the overlap counts exactly.
    "d10_decontaminate" -> Q(
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)])) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
        |hits AS (
        |  SELECT doc_id, COUNT(*) AS n_hits
        |  FROM (SELECT * FROM g WHERE doc_id % 97 <> 0) c JOIN bg USING (g)
        |  GROUP BY 1)
        |SELECT d.doc_id AS doc_id, COALESCE(h.n_hits, 0) AS n_hits,
        |       COALESCE(h.n_hits, 0) >= 5 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 97 <> 0
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      Dedup.decontaminate(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text")
        .select("doc_id", "n_hits", "contaminated")
        .orderBy("doc_id")
    },

    // Duplicated-span coverage (d16): fraction of each doc's trigram
    // positions whose span also occurs in another doc. The planted
    // near-dup pairs share nearly all their spans, so they flag; the
    // rest of the corpus sits near zero.
    "d16_span_dedup" -> Q(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS g
        |  FROM w),
        |pg AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
        |gs AS (SELECT g, MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM pg GROUP BY 1),
        |dup AS (
        |  SELECT pg.doc_id, CAST(SUM(pg.cnt) AS BIGINT) AS dup_spans
        |  FROM pg JOIN gs USING (g) WHERE gs.mn <> gs.mx GROUP BY 1)
        |SELECT w.doc_id AS doc_id,
        |  CAST(GREATEST(len(w.w) - 2, 0) AS BIGINT) AS n_spans,
        |  COALESCE(dup.dup_spans, 0) AS dup_spans,
        |  ROUND(COALESCE(dup.dup_spans, 0) * 1.0
        |        / GREATEST(len(w.w) - 2, 1), 6) AS dup_frac,
        |  COALESCE(dup.dup_spans, 0) * 1.0
        |        / GREATEST(len(w.w) - 2, 1) >= 0.2 AS flagged
        |FROM w LEFT JOIN dup ON w.doc_id = dup.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.spanCoverage(Tables(s, dir).documents, "doc_id", "text",
          n = 3, minCoverage = 0.2)
        .orderBy("doc_id")
    },

    // Incremental (cross-run) dedup: the batch is every corpus doc
    // re-keyed and re-formatted (upper-cased, padded — the normalized
    // fingerprint survives both), while the standing corpus holds only
    // the doc_id % 5 <> 0 slice. The operator must drop the 4/5 of
    // the batch the corpus has already seen and keep the genuinely
    // new 1/5. Bloom prefilter + exact verify ⇒ output identical to
    // the oracle's plain NOT IN.
    "d11_incremental_dedup" -> Q(
      """WITH corpus AS (
        |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 5 <> 0),
        |b AS (
        |  SELECT doc_id + 1000000 AS doc_id, source,
        |         '  ' || upper(text) || '  ' AS text
        |  FROM documents),
        |bf AS (
        |  SELECT doc_id, source,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM b)
        |SELECT doc_id, source FROM bf
        |WHERE fp NOT IN (SELECT fp FROM corpus)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.select((col("doc_id") + 1000000).as("doc_id"),
        col("source"), concat(lit("  "), upper(col("text")), lit("  ")).as("text"))
      // sketch sized to the corpus cardinality (the bloom literal is
      // embedded in every task's plan — a 1M-item default costs ~1 MB
      // per plan ship where ~64 KB covers this corpus; oversizing only
      // wastes bytes, undersizing only raises the FP rate the exact
      // verify join clears anyway)
      Dedup.incremental(corpus, batch, "doc_id", "text",
          expectedItems = 1L << 16)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // Incremental NEAR-dup (d15, the cross-run twin of d02): the batch
    // is a simulated re-crawl — corpus docs re-keyed with a boilerplate
    // footer appended (high shingle overlap, but a DIFFERENT exact
    // fingerprint, so d11's exact index would keep every one) plus
    // word-reversed docs at new ids (disjoint shingle sets — genuinely
    // new). The prebuilt index must drop the footered re-crawls and
    // keep the new docs. Upgraded from rows-only: the oracle rebuilds
    // both sides' MinHash signatures with d02's splitmix64 HUGEINT
    // emulation, mirrors the index's per-bucket row_number ≤ 100 cap
    // (value-bucketed — candidate-equivalent to the xxhash64 bucket
    // keys), the agreement ≥ 0.5 verify, and the anti-join.
    "d15_incremental_neardup" -> Q(
      """WITH batch AS (
        |  SELECT doc_id + 2000000 AS doc_id, source,
        |    text || ' footer boilerplate appended by the recrawl pipeline' AS text
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, source,
        |    array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |  FROM documents WHERE doc_id % 7 = 0),
        |alls AS (
        |  SELECT 'c' AS side, doc_id, text FROM documents
        |  UNION ALL SELECT 'b', doc_id, text FROM batch),
        |w AS (SELECT side, doc_id, string_split(text, ' ') AS ws FROM alls),
        |g AS (SELECT DISTINCT side, doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |      FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)),
        |b0 AS (SELECT side, doc_id, CAST('0x' || substr(md5(g), 1, 16) AS UBIGINT) AS base FROM g),
        |pj AS (SELECT side, doc_id, base, j FROM b0 CROSS JOIN (SELECT unnest(range(64)) AS j) p),
        |s0 AS (SELECT side, doc_id, j, CAST((CAST(base AS HUGEINT) + j + 11400714819323198485)
        |        % 18446744073709551616 AS UBIGINT) AS z0 FROM pj),
        |s1 AS (SELECT side, doc_id, j, xor(z0, z0 >> 30) AS x1 FROM s0),
        |s2 AS (SELECT side, doc_id, j, CAST((CAST(x1 % 4294967296 AS HUGEINT) * 13787848793156543929
        |        + ((CAST(x1 // 4294967296 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296)
        |        % 18446744073709551616 AS UBIGINT) AS z1 FROM s1),
        |s3 AS (SELECT side, doc_id, j, xor(z1, z1 >> 27) AS x2 FROM s2),
        |s4 AS (SELECT side, doc_id, j, CAST((CAST(x2 % 4294967296 AS HUGEINT) * 10723151780598845931
        |        + ((CAST(x2 // 4294967296 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296)
        |        % 18446744073709551616 AS UBIGINT) AS z2 FROM s3),
        |hu AS (SELECT side, doc_id, j, xor(z2, z2 >> 31) AS hu FROM s4),
        |hs AS (SELECT side, doc_id, j, CAST(CAST(hu AS HUGEINT)
        |        - CASE WHEN hu >= 9223372036854775808 THEN CAST(18446744073709551616 AS HUGEINT)
        |               ELSE 0 END AS BIGINT) AS h FROM hu),
        |sig AS (SELECT side, doc_id, j, MIN(h) AS m FROM hs GROUP BY side, doc_id, j),
        |bands AS (SELECT side, doc_id, CAST(j // 2 AS INT) AS band,
        |           MIN(CASE WHEN j % 2 = 0 THEN m END) AS k1,
        |           MIN(CASE WHEN j % 2 = 1 THEN m END) AS k2
        |          FROM sig GROUP BY side, doc_id, j // 2),
        |idx AS (SELECT * FROM (
        |    SELECT doc_id AS corpus_id, band, k1, k2,
        |      row_number() OVER (PARTITION BY band, k1, k2 ORDER BY doc_id) AS rn
        |    FROM bands WHERE side = 'c') WHERE rn <= 100),
        |cand AS (SELECT DISTINCT b.doc_id AS batch_id, idx.corpus_id
        |         FROM bands b JOIN idx ON b.band = idx.band AND b.k1 = idx.k1 AND b.k2 = idx.k2
        |         WHERE b.side = 'b'),
        |agree AS (SELECT c.batch_id, c.corpus_id,
        |           SUM(CASE WHEN sb.m = sc.m THEN 1 ELSE 0 END) / 64.0 AS a
        |          FROM cand c
        |          JOIN sig sb ON sb.side = 'b' AND sb.doc_id = c.batch_id
        |          JOIN sig sc ON sc.side = 'c' AND sc.doc_id = c.corpus_id AND sc.j = sb.j
        |          GROUP BY c.batch_id, c.corpus_id),
        |dup AS (SELECT DISTINCT batch_id FROM agree WHERE a >= 0.5)
        |SELECT b.doc_id, b.source FROM batch b
        |ANTI JOIN dup ON b.doc_id = dup.batch_id
        |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val recrawl = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"), col("source"),
          concat(col("text"),
            lit(" footer boilerplate appended by the recrawl pipeline")).as("text"))
      val fresh = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"), col("source"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
      val idx = NearDupIndex.build(docs, "doc_id", "text")
      Dedup.incrementalNearDup(idx, recrawl.unionByName(fresh),
          "doc_id", "text")
        .select("doc_id", "source")
        .orderBy("doc_id")
      // the index stays cached for the plan's consumers; Verify/Bench
      // clearCache() between keys, the long-lived-session release is
      // idx.release()
    },

    // The end-to-end pretraining corpus build: curation funnel over
    // the non-benchmark corpus (d09's exact arithmetic), benchmark
    // decontamination of the survivors (d10's), stratified mixing
    // sample (t05's) — one composed plan, oracled end to end.
    "d13_pretrain_e2e" -> Q(
      s"""WITH s0 AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id % 97 <> 0),
        |s1 AS (
        |  SELECT doc_id, text, ws,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("de")}))) AS s_de,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("en")}))) AS s_en,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("es")}))) AS s_es,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("fr")}))) AS s_fr,
        |    len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("zh")}))) AS s_zh
        |  FROM s0),
        |s2 AS (
        |  SELECT doc_id, text,
        |    CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
        |         WHEN s_fr >= s_zh AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        |         WHEN s_es >= s_zh AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es'
        |         WHEN s_en >= s_zh AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
        |         ELSE 'de' END AS predicted,
        |    ROUND(least(len(ws) / 100.0, 1.0) * 0.3
        |      + (len(list_filter(ws, x -> x IN (${TextQueries.dictSqlPub("en")})))
        |         / CAST(len(ws) AS DOUBLE)) * 0.4
        |      + (1.0 - length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
        |               / CAST(length(text) AS DOUBLE)) * 0.3, 6) AS quality,
        |    len(ws) AS n_tokens,
        |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        |  FROM s1),
        |kept AS (SELECT * FROM s2 WHERE predicted = 'en' AND quality >= 0.45),
        |ex AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM kept) WHERE rn = 1),
        |g AS (
        |  SELECT doc_id, len(gs) AS sz, unnest(gs) AS g FROM (
        |    SELECT doc_id,
        |      list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS gs
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM ex))),
        |gf AS (
        |  SELECT doc_id, sz, g FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY g) AS df FROM g)
        |  WHERE df <= 1000),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter,
        |         MIN(a.sz) AS sa, MIN(b.sz) AS sb
        |  FROM gf a JOIN gf b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dropd AS (SELECT DISTINCT id2 FROM p
        |  WHERE CAST(inter AS DOUBLE) / (sa + sb - inter) >= 0.5),
        |surv AS (SELECT doc_id, predicted, quality, n_tokens FROM ex
        |  WHERE doc_id NOT IN (SELECT id2 FROM dropd)),
        |sg AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)])) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |        WHERE doc_id IN (SELECT doc_id FROM surv))),
        |bg AS (
        |  SELECT DISTINCT unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)])) AS g
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0)),
        |hits AS (
        |  SELECT doc_id, COUNT(*) AS n_hits FROM sg JOIN bg USING (g) GROUP BY 1),
        |clean AS (
        |  SELECT s.doc_id, d.source, s.predicted, s.quality, s.n_tokens
        |  FROM surv s JOIN documents d USING (doc_id)
        |  LEFT JOIN hits h USING (doc_id)
        |  WHERE COALESCE(h.n_hits, 0) < 5)
        |SELECT doc_id, source, predicted, quality, n_tokens, pick FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
        |  FROM clean)
        |WHERE pick <= CASE WHEN source IN ('src0', 'src1', 'src2') THEN 12
        |                   WHEN source = 'src3' THEN 0 ELSE 5 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Curate.pretrain(Tables(s, dir).documents,
          "doc_id", "text", "source", isBench = col("doc_id") % 97 === 0,
          caps = Map("src0" -> 12, "src1" -> 12, "src2" -> 12, "src3" -> 0),
          defaultCap = 5)
        .select("doc_id", "source", "predicted", "quality", "n_tokens", "pick")
        .orderBy("doc_id")
    },

    // Duplicate clustering: connected components over d04's near-dup
    // pairs — transitive closure turns pairwise matches into keep/drop
    // groups (cluster_id = min doc id of the component). The oracle
    // recomputes the same pairs, then closes them with a recursive
    // CTE; Spark runs Pregel-style min-label propagation.
    "d12_dup_clusters" -> Q(
      """WITH RECURSIVE g AS (
        |  SELECT doc_id, lang, len(gs) AS sz, unnest(gs) AS g FROM (
        |    SELECT doc_id, lang,
        |      list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS gs
        |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))),
        |gf AS (
        |  SELECT doc_id, lang, sz, g FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY lang, g) AS df FROM g)
        |  WHERE df <= 1000),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter,
        |         MIN(a.sz) AS sa, MIN(b.sz) AS sb
        |  FROM gf a JOIN gf b
        |    ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pr AS (SELECT id1, id2 FROM p
        |  WHERE CAST(inter AS DOUBLE)/(sa + sb - inter) >= 0.5),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pr
        |  UNION SELECT id2, id1 FROM pr),
        |reach(src, dst) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
        |SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach
        |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val pairs = Dedup.ngramJaccard(fanOut(Tables(s, dir).documents),
        "doc_id", "text", "lang", n = 3, minJaccard = 0.5, maxGramDf = 1000)
      // dupClusters' loop has fully consumed pairs (edges are
      // persisted on their own) by the time it returns — release the
      // pair cache here so only the labels handle stays live
      val clusters = Dedup.dupClusters(pairs)
      pairs.unpersist(blocking = false)
      clusters
        .select(col("id1").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    },

    // n-gram CONTAINMENT near-dup (d27): |A∩B| / min(|A|,|B|) — the
    // subset-duplication catcher (tweet pasted into a 10k-word page
    // scores Jaccard ≈ 0 but containment 1.0). Same blocked core as
    // d04 WITHOUT the size-ratio prune (containment lives exactly in
    // the |A| ≪ |B| regime); join bounded by the df cap alone. The
    // oracle recomputes the same capped pairs and the single-division
    // metric.
    "d27_containment_dedup" -> Q(
      """WITH g AS (
        |  SELECT doc_id, lang, len(gs) AS sz, unnest(gs) AS g FROM (
        |    SELECT doc_id, lang,
        |      list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS gs
        |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))),
        |gf AS (
        |  SELECT doc_id, lang, sz, g FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY lang, g) AS df FROM g)
        |  WHERE df <= 1000),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter,
        |         MIN(a.sz) AS sa, MIN(b.sz) AS sb
        |  FROM gf a JOIN gf b
        |    ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  ROUND(CAST(inter AS DOUBLE) / LEAST(sa, sb), 6) AS containment
        |FROM p WHERE CAST(inter AS DOUBLE) / LEAST(sa, sb) >= 0.8
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      val pairs = Dedup.ngramContainment(fanOut(Tables(s, dir).documents),
        "doc_id", "text", "lang", n = 3, minContainment = 0.8, maxGramDf = 1000)
      pairs
        .select(col("id1"), col("id2"),
          round(col("containment"), 6).as("containment"))
        .orderBy("id1", "id2")
    },

    "d04_ngram_jaccard" -> Q(
      """WITH g AS (
        |  SELECT doc_id, lang, len(gs) AS sz, unnest(gs) AS g FROM (
        |    SELECT doc_id, lang,
        |      list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)]) AS gs
        |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))),
        |gf AS (
        |  SELECT doc_id, lang, sz, g FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY lang, g) AS df FROM g)
        |  WHERE df <= 1000),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter,
        |         MIN(a.sz) AS sa, MIN(b.sz) AS sb
        |  FROM gf a JOIN gf b
        |    ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, CAST(inter AS DOUBLE)/(sa + sb - inter) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE)/(sa + sb - inter) >= 0.5
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccard(fanOut(Tables(s, dir).documents), "doc_id", "text", "lang",
          n = 3, minJaccard = 0.5, maxGramDf = 1000)
        .orderBy("id1", "id2")
    }
  )
}
