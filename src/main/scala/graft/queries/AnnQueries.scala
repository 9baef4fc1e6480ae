package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Ann

/** Similarity search coverage (SURVEY §2 d05–d06) over `embeddings`
  * (64-dim float vectors). d05 is DuckDB-oracled — the cosine is an
  * identical IEEE op sequence on both engines (per-element double
  * cast, sequential sum, one division), so even rank ties agree.
  * d06/d07 (r10): the hyperplane-LSH pipeline is ALSO oracled — the
  * kernel's ±1 planes are splitmix64-derived (HUGEINT emulation, see
  * d02) and its per-plane dot product is an in-order double fold,
  * which DuckDB's list_reduce reproduces bit-for-bit (list_transform/
  * list_reduce preserve element order; 0.0 + x₁ ≡ x₁ in IEEE, so the
  * fold-from-first-element equals the kernel's zero-seeded loop).
  */
object AnnQueries {

  private val DIM = 64

  /** Shared oracle CTE block: per-(vec, table) hyperplane bucket codes
    * — the exact SQL twin of the HyperplaneCode kernel. `bitsExpr` is
    * a SQL expression for the code width (literal for d06, the
    * corpus-sized auto formula for d07). Emits CTEs ending in
    * `codes(vec_id, t, code)`. */
  private def lshCodesSql(bitsExpr: String): String =
    s"""dims AS (SELECT len(embedding) AS nd FROM embeddings LIMIT 1),
       |pd AS (SELECT t, b, d, (t*64 + b)::HUGEINT * 4294967296 + d AS seed
       |       FROM (SELECT unnest(range(8)) t),
       |            (SELECT unnest(range($bitsExpr)) b),
       |            (SELECT unnest(range((SELECT nd FROM dims))) d)),
       |s0 AS (SELECT t, b, d, CAST((seed + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z0 FROM pd),
       |s1 AS (SELECT t, b, d, xor(z0, z0 >> 30) AS x1 FROM s0),
       |s2 AS (SELECT t, b, d, CAST((CAST(x1 % 4294967296 AS HUGEINT) * 13787848793156543929
       |        + ((CAST(x1 // 4294967296 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296)
       |        % 18446744073709551616 AS UBIGINT) AS z1 FROM s1),
       |s3 AS (SELECT t, b, d, xor(z1, z1 >> 27) AS x2 FROM s2),
       |s4 AS (SELECT t, b, d, CAST((CAST(x2 % 4294967296 AS HUGEINT) * 10723151780598845931
       |        + ((CAST(x2 // 4294967296 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296)
       |        % 18446744073709551616 AS UBIGINT) AS z2 FROM s3),
       |sg AS (SELECT t, b, d,
       |        CASE WHEN (xor(z2, z2 >> 31) & 1) = 0 THEN 1.0 ELSE -1.0 END AS sgn FROM s4),
       |sgl AS (SELECT t, b, list(CAST(sgn AS DOUBLE) ORDER BY d) AS sl FROM sg GROUP BY t, b),
       |codes AS (
       |  SELECT e.vec_id, s.t,
       |    SUM(CASE WHEN list_reduce(
       |          list_transform(list_zip(e.embedding, s.sl),
       |            z -> CAST(z[1] AS DOUBLE) * z[2]),
       |          (a, c) -> a + c) > 0
       |        THEN CAST(1 AS BIGINT) << s.b ELSE 0 END) AS code
       |  FROM embeddings e CROSS JOIN sgl s
       |  GROUP BY e.vec_id, s.t)""".stripMargin

  // ---- fitted-model oracle machinery (r10 verdict item 1) ----------
  // The k-means FIT has no portable ANSI spelling (rows-only forever,
  // spec-verified), but everything downstream of the fitted centroids
  // is pure IEEE-ordered arithmetic. Q.dynamic splices the fitted
  // matrix into the SQL as literals, so quantize codes, ADC scores and
  // probed searches hash-verify against DuckDB exactly like d14/d23.

  /** Centroid matrix as a DuckDB literal. Double.toString round-trips
    * (shortest repr, correctly-rounded parse on DuckDB's side); the
    * outer CAST pins DOUBLE[][] against DECIMAL literal inference. */
  private def sqlMat(m: Array[Array[Double]]): String =
    m.map(_.mkString("[", ", ", "]"))
      .mkString("CAST([", ", ", "] AS DOUBLE[][])")

  /** DuckDB twin of the native cell_distances kernel (functions/
    * CellDistances.scala): squared-L2 from `vecSlice` to every row of
    * `cents`, accumulated in index order (list_reduce fold ≡ the
    * kernel's zero-seeded loop), each distance rounded to 1e-9 exactly
    * like the kernel — Math.round(s·1e9) = FLOOR(s·1e9 + 0.5), every
    * intermediate < 2^53 so the long↔double round-trip is exact. */
  private def cellDistsSql(cents: String, vecSlice: String): String =
    s"""list_transform($cents, cc -> FLOOR(list_reduce(
       |      list_transform(list_zip($vecSlice, cc),
       |        z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])),
       |      (a, x) -> a + x) * 1e9 + 0.5) / 1e9)""".stripMargin

  /** Per-subspace PQ distance columns d0..dM-1 (the SQL twin of
    * Pq.distCols on either the corpus or the query side). */
  private def pqDistCols(m: graft.operators.Pq.Model): String =
    m.sub.indices.map { i =>
      val lo = i * m.subDim + 1
      val hi = i * m.subDim + m.subDim
      s"${cellDistsSql(sqlMat(m.sub(i).centroids), s"embedding[$lo:$hi]")} AS d$i"
    }.mkString(",\n    ")

  /** Argmin code list (ties → first index, = array_position of min). */
  private def pqCodesExpr(m: graft.operators.Pq.Model): String =
    m.sub.indices.map(i => s"list_position(d$i, list_min(d$i)) - 1")
      .mkString("[", ", ", "]")

  /** ADC estimate — M lookup-adds in Pq.searchAdc's reduce order
    * (((l0+l1)+l2)+l3. */
  private def adcEstExpr(m: graft.operators.Pq.Model): String =
    m.sub.indices.map(i => s"l$i[c[${i + 1}] + 1]")
      .reduce((a, b) => s"($a + $b)")

  /** Shared d19/d20 tail: rank candidates per query by (est_dist,
    * neighbor_id) — Spark ranks sim = −est_dist DESC — and keep k. */
  private def adcRankSql(k: Int): String =
    s"""r AS (
       |  SELECT query_id, neighbor_id, est_dist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY est_dist, neighbor_id) AS INT) AS rank
       |  FROM est)
       |SELECT query_id, neighbor_id, est_dist, rank
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** In-order cosine folds — the CosineSim kernel's IEEE sequence. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a.embedding, $b.embedding),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (a, c) -> a + c)
       |    / (sqrt(list_reduce(list_transform($a.embedding,
       |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, c) -> a + c))
       |     * sqrt(list_reduce(list_transform($b.embedding,
       |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, c) -> a + c)))""".stripMargin

  val defs: Map[String, Q] = Map(

    // Exact top-5 cosine neighbours of the first 10 vectors.
    "d05_knn_brute" -> Q(
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, 65),
        |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, 65),
        |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS sim,
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim, rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Ann.bruteTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // LSH-bucketed approximate top-5 for the same queries — oracled:
    // the oracle rebuilds the hyperplane codes, the 1-bit multi-probe
    // fan-out, the bucket-value candidate join, and the exact cosine
    // rerank.
    "d06_ann_lsh" -> Q(
      s"""WITH ${lshCodesSql("4")},
        |qprobe AS (
        |  SELECT vec_id AS query_id, t,
        |    unnest([code, xor(code, 1), xor(code, 2), xor(code, 4), xor(code, 8)]) AS code
        |  FROM codes WHERE vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
        |  FROM qprobe q JOIN codes c ON q.t = c.t AND q.code = c.code
        |  WHERE c.vec_id <> q.query_id),
        |scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    ${cosSql("qe", "ce")} AS sim
        |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id
        |            JOIN embeddings ce ON ce.vec_id = cand.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim, rank
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      Ann.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, dim = DIM)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // IVF-probed approximate top-5: coarse k-means cells (k=16,
    // deterministic training), nprobe=4 → ~25% of the corpus scored
    // per query. ONE-SHOT search on purpose: AnnScaleProbe measured
    // the in-memory prebuilt index LOSING to recompute (float-array
    // cache deserialization > assignment flops); the prebuilt layout
    // that wins at scale is the DISK index partitioned by cell
    // (Ivf.buildIndexOnDisk — file-level pruning), overkill for a
    // bench-scale corpus. Recall pinned by AnnSpec; since r11 the
    // SEARCH half (assignment, probing, cosine rerank) is hash-exact
    // against DuckDB over the fitted centroids as literals.
    "d08_ann_ivf" -> Q.dynamic { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val m = graft.operators.Ivf.fit(e, "vec_id", "embedding", k = 16)
      s"""WITH iv AS (
         |  SELECT vec_id, ${cellDistsSql(sqlMat(m.centroids), "embedding")} AS il
         |  FROM embeddings),
         |cells AS (
         |  SELECT vec_id, list_position(il, list_min(il)) - 1 AS cell FROM iv),
         |qc AS (
         |  SELECT vec_id AS query_id, CAST(i AS INT) - 1 AS cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY il[i], i) AS rn
         |  FROM iv CROSS JOIN (SELECT unnest(range(1, ${m.k + 1})) AS i)
         |  WHERE vec_id < 10),
         |probed AS (SELECT query_id, cell FROM qc WHERE rn <= 4),
         |scored AS (
         |  SELECT p.query_id, c.vec_id AS neighbor_id,
         |    ${cosSql("qe", "ce")} AS sim
         |  FROM cells c JOIN probed p ON c.cell = p.cell
         |  JOIN embeddings ce ON ce.vec_id = c.vec_id
         |  JOIN embeddings qe ON qe.vec_id = p.query_id
         |  WHERE c.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim, rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    } { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val model = graft.operators.Ivf.fit(e, "vec_id", "embedding", k = 16)
      graft.operators.Ivf.search(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", model, k = 5, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Symmetric int8 quantization of the whole embedding corpus:
    // per-vector absmax scale, clamped round-half-up codes, and the
    // reconstruction MSE — scale, codes and MSE all hash-compare
    // exactly (identical IEEE double sequence on both engines).
    "d14_embed_quantize" -> Q(
      """WITH t AS (
        |  SELECT vec_id, embedding AS v,
        |    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS am
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, v, CASE WHEN am = 0 THEN 1.0 ELSE am / 127.0 END AS scale FROM t),
        |q AS (
        |  SELECT vec_id, v, scale,
        |    [CAST(greatest(-127, least(127, floor(CAST(x AS DOUBLE) / scale + 0.5))) AS INT) for x in v] AS qv
        |  FROM s)
        |SELECT vec_id, scale,
        |  array_to_string(qv, ',') AS q,
        |  list_sum([(CAST(v[i] AS DOUBLE) - qv[i] * scale) * (CAST(v[i] AS DOUBLE) - qv[i] * scale)
        |            for i in range(1, len(v)+1)]) / len(v) AS mse
        |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Ann.quantizeInt8(Tables(s, dir).embeddings, "vec_id", "embedding")
        .orderBy("vec_id")
    },

    // Product quantization (d18): M=4 subspaces × K=16 codes over the
    // embedding corpus — deterministic per-subspace k-means fit (Ivf
    // discipline), scan-speed code assignment, reconstruction MSE.
    // The fit stays spec-verified (iterative k-means has no portable
    // ANSI spelling) but the QUANTIZE half — per-subspace distances,
    // argmin codes, MSE — is hash-exact over the fitted codebook as
    // literals (Q.dynamic). AnnSpec additionally pins determinism and
    // the beats-mean-quantizer property.
    "d18_pq_quantize" -> Q.dynamic { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val m = graft.operators.Pq.fit(e, "vec_id", "embedding")
      val sse = m.sub.indices.map(i => s"list_min(d$i)")
        .reduce((a, b) => s"($a + $b)")
      s"""WITH ds AS (SELECT vec_id,
         |    ${pqDistCols(m)}
         |  FROM embeddings)
         |SELECT vec_id, array_to_string(${pqCodesExpr(m)}, ',') AS codes,
         |  ROUND($sse / ${m.subDim.toDouble * m.sub.size}, 6) AS mse
         |FROM ds ORDER BY vec_id""".stripMargin
    } { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val model = graft.operators.Pq.fit(e, "vec_id", "embedding")
      graft.operators.Pq.quantize(e, "vec_id", "embedding", model)
        .select(col("vec_id"),
          concat_ws(",", col("codes")).as("codes"), col("mse"))
        .orderBy("vec_id")
    },

    // ADC search over PQ codes (d19): the corpus side of the join
    // carries codes only (no float vectors); per-query K-entry lookup
    // tables broadcast; est distance = M lookup-adds. The scoring is
    // hash-exact over codebook literals (Q.dynamic — the lookup
    // tables ARE the d18 distance arrays); AnnSpec pins recall vs the
    // exact baseline.
    "d19_pq_search" -> Q.dynamic { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val m = graft.operators.Pq.fit(e, "vec_id", "embedding")
      val luts = m.sub.indices.map(i => s"d$i AS l$i").mkString(", ")
      s"""WITH ds AS (SELECT vec_id,
         |    ${pqDistCols(m)}
         |  FROM embeddings),
         |codes AS (SELECT vec_id AS neighbor_id, ${pqCodesExpr(m)} AS c FROM ds),
         |q AS (SELECT vec_id AS query_id, $luts FROM ds WHERE vec_id < 10),
         |est AS (
         |  SELECT q.query_id, codes.neighbor_id,
         |    ROUND(${adcEstExpr(m)}, 6) AS est_dist
         |  FROM codes CROSS JOIN q WHERE codes.neighbor_id <> q.query_id),
         |${adcRankSql(5)}""".stripMargin
    } { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val model = graft.operators.Pq.fit(e, "vec_id", "embedding")
      graft.operators.Pq.searchAdc(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", model, k = 5)
        .orderBy("query_id", "rank")
    },

    // IVF-PQ search (d20): coarse cells bound the candidate set,
    // ADC scores from codes — equi join on cell id, query side
    // broadcast. Assignment + probing + ADC scoring hash-exact over
    // both fitted models as literals (Q.dynamic); AnnSpec pins the
    // candidates-are-a-subset relation vs plain ADC, and recall.
    "d20_ivfpq_search" -> Q.dynamic { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val ivf = graft.operators.Ivf.fit(e, "vec_id", "embedding", k = 16)
      val m = graft.operators.Pq.fit(e, "vec_id", "embedding")
      val luts = m.sub.indices.map(i => s"d$i AS l$i").mkString(", ")
      s"""WITH ds AS (SELECT vec_id,
         |    ${pqDistCols(m)}
         |  FROM embeddings),
         |iv AS (
         |  SELECT vec_id, ${cellDistsSql(sqlMat(ivf.centroids), "embedding")} AS il
         |  FROM embeddings),
         |cells AS (
         |  SELECT vec_id, list_position(il, list_min(il)) - 1 AS cell FROM iv),
         |codes AS (
         |  SELECT ds.vec_id AS neighbor_id, cells.cell, ${pqCodesExpr(m)} AS c
         |  FROM ds JOIN cells ON ds.vec_id = cells.vec_id),
         |qc AS (
         |  SELECT vec_id AS query_id, CAST(i AS INT) - 1 AS cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY il[i], i) AS rn
         |  FROM iv CROSS JOIN (SELECT unnest(range(1, ${ivf.k + 1})) AS i)
         |  WHERE vec_id < 10),
         |probed AS (SELECT query_id, cell FROM qc WHERE rn <= 4),
         |q AS (SELECT vec_id AS query_id, $luts FROM ds WHERE vec_id < 10),
         |est AS (
         |  SELECT p.query_id, codes.neighbor_id,
         |    ROUND(${adcEstExpr(m)}, 6) AS est_dist
         |  FROM codes JOIN probed p ON codes.cell = p.cell
         |  JOIN q ON q.query_id = p.query_id
         |  WHERE codes.neighbor_id <> p.query_id),
         |${adcRankSql(5)}""".stripMargin
    } { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val ivf = graft.operators.Ivf.fit(e, "vec_id", "embedding", k = 16)
      val pq = graft.operators.Pq.fit(e, "vec_id", "embedding")
      graft.operators.Pq.searchIvfAdc(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", ivf, pq, k = 5, nprobe = 4)
        .orderBy("query_id", "rank")
    },

    // Semantic dedup (d21, SemDeDup): coarse k-means cells bound the
    // pairwise work, cosine-threshold groups collapse to their lowest
    // id via the audited component pass. Rows-only (k-means fit has
    // no ANSI spelling); DedupSpec pins planted-duplicate semantics.
    // Johnson–Lindenstrauss random projection (d23): 64 → 8 dims with
    // a Rademacher matrix derived from md5(seed:row:col) — the oracle
    // rebuilds the identical matrix from DuckDB's md5, and each
    // coordinate is the same sequential double fold on both engines
    // (the d05 discipline), rounded to 6 dp.
    "d23_random_projection" -> Q(
      """SELECT vec_id,
        |""".stripMargin +
        (0 until 8).map { j =>
          s"""  ROUND(list_sum(list_transform(range(1, 65),
             |    i -> CAST(embedding[i] AS DOUBLE) *
             |      (CASE WHEN substr(md5('rp:$j:' || (i-1)), 1, 1)
             |            BETWEEN '0' AND '7'
             |       THEN 1.0 ELSE -1.0 END)))
             |    / sqrt(8), 6) AS p$j""".stripMargin
        }.mkString(",\n") +
        "\nFROM embeddings WHERE vec_id < 200 ORDER BY vec_id") { (s, dir) =>
      val e = Tables(s, dir).embeddings.filter(col("vec_id") < 200)
      val proj = e.withColumn("__p",
        Ann.randomProject(e, "embedding", outDim = 8, dim = DIM))
      proj.select(col("vec_id") +:
          (0 until 8).map(j =>
            round(element_at(col("__p"), j + 1), 6).as(s"p$j")): _*)
        .orderBy("vec_id")
    },

    // minCosine 0.9 = SemDeDup's "cosine-near-identical" contract
    // (Abbas et al. 2023). A looser 0.4 chained whole IVF cells
    // into one component — diameter-many Pregel rounds put this
    // key at 80+ s/pass at sf0.1 while claiming a threshold the
    // paper never uses. Since r11 the whole post-fit pipeline is
    // hash-exact (Q.dynamic): cells over the fitted centroids as
    // literals, bit-exact in-cell cosine pairs, and the transitive
    // keep/drop closed by the d12 recursive-CTE technique.
    "d21_semantic_dedup" -> Q.dynamic { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val m = graft.operators.Ivf.fit(e, "vec_id", "embedding", k = 16)
      s"""WITH RECURSIVE iv AS (
         |  SELECT vec_id, ${cellDistsSql(sqlMat(m.centroids), "embedding")} AS il
         |  FROM embeddings),
         |cells AS (
         |  SELECT vec_id, list_position(il, list_min(il)) - 1 AS cell FROM iv),
         |p AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN embeddings ae ON ae.vec_id = a.vec_id
         |  JOIN embeddings be ON be.vec_id = b.vec_id
         |  WHERE ${cosSql("ae", "be")} >= 0.9),
         |edges AS (SELECT id1 AS a, id2 AS b FROM p
         |  UNION SELECT id2, id1 FROM p),
         |reach(src, dst) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |cl AS (SELECT src AS vec_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1)
         |SELECT e.vec_id,
         |  COALESCE(cl.cluster_id, e.vec_id) AS cluster_id,
         |  (cl.cluster_id IS NULL OR cl.cluster_id = e.vec_id) AS keep
         |FROM embeddings e LEFT JOIN cl USING (vec_id)
         |ORDER BY e.vec_id""".stripMargin
    } { (s, dir) =>
      graft.operators.Dedup.semanticDedup(Tables(s, dir).embeddings,
          "vec_id", "embedding", k = 16, minCosine = 0.9)
        .orderBy("vec_id")
    },

    // Nearest-class-centroid assignment (d17): fit = per-(label, pos)
    // rounded mean (the one cross-row double agg — round-6 bridges
    // engine sum order, the a06 discipline); everything downstream is
    // an index-order fold over the SAME rounded literals, so dist,
    // argmin and the correct flag hash-compare exactly.
    "d17_centroid_assign" -> Q(
      """WITH c AS (
        |  SELECT CAST(label AS INT) AS clabel, i,
        |    ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS c
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
        |  GROUP BY 1, 2),
        |cl AS (SELECT clabel, list(c ORDER BY i) AS cent FROM c GROUP BY 1),
        |d AS (
        |  SELECT e.vec_id, CAST(e.label AS INT) AS label, cl.clabel,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - cent[i])
        |         * (CAST(e.embedding[i] AS DOUBLE) - cent[i]))) AS dist
        |  FROM embeddings e CROSS JOIN cl),
        |r AS (
        |  SELECT vec_id, label, clabel, dist,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rn
        |  FROM d)
        |SELECT vec_id, label, clabel AS assigned, ROUND(dist, 6) AS dist,
        |  clabel = label AS correct
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Ann.centroidAssign(Tables(s, dir).embeddings, "vec_id", "embedding", "label")
        .orderBy("vec_id")
    },

    // Whole-corpus embedding-cosine near-dup pairs (LSH candidates,
    // exact verify). Recall pinned by AnnSpec.
    "d07_embed_neardup" -> Q(
      s"""WITH ${lshCodesSql(
          // integer twin of the kernel's auto width: smallest b with
          // 32·2^b ≥ n ≡ ceil(log2(n/32)) — no libm on either side.
          // b caps at 56 (DuckDB raises on BIGINT shift overflow and
          // evaluates the shift eagerly; 2^61 rows is beyond any corpus)
          "(SELECT GREATEST(2, CAST(MIN(b) AS INT)) FROM range(1, 57) t(b) " +
          "WHERE (CAST(32 AS BIGINT) << b) >= (SELECT GREATEST(COUNT(*), 64) FROM embeddings))")},
        |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY t, code) AS bs FROM codes),
        |p AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |      FROM sized a JOIN sized b ON a.t = b.t AND a.code = b.code AND a.vec_id < b.vec_id
        |      WHERE a.bs BETWEEN 2 AND 200),
        |scored AS (
        |  SELECT p.id1, p.id2,
        |    ${cosSql("ae", "be")} AS sim
        |  FROM p JOIN embeddings ae ON ae.vec_id = p.id1
        |         JOIN embeddings be ON be.vec_id = p.id2)
        |SELECT id1, id2, ROUND(sim, 6) AS sim FROM scored WHERE sim >= 0.4
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      Ann.embedNearDupPairs(Tables(s, dir).embeddings, "vec_id", "embedding",
          minCosine = 0.4, dim = DIM)
        .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
        .orderBy("id1", "id2")
    }
  )
}
