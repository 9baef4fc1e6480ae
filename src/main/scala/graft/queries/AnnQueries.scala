package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Ann

/** Similarity search coverage (SURVEY §2 d05–d06) over `embeddings`
  * (64-dim float vectors). d05 is DuckDB-oracled — the cosine is an
  * identical IEEE op sequence on both engines (per-element double
  * cast, sequential sum, one division), so even rank ties agree.
  * d06's hyperplane buckets are Spark-side arithmetic DuckDB has no
  * business reproducing → rows-only, recall pinned by AnnSpec.
  */
object AnnQueries {

  private val DIM = 64

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

    // LSH-bucketed approximate top-5 for the same queries.
    "d06_ann_lsh" -> Q.rowsOnly { (s, dir) =>
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
    // bench-scale corpus. Recall pinned by AnnSpec.
    "d08_ann_ivf" -> Q.rowsOnly { (s, dir) =>
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
    // Rows-only by design (iterative k-means centroids have no
    // portable ANSI spelling); AnnSpec pins shape, determinism, MSE
    // consistency and the beats-mean-quantizer property.
    "d18_pq_quantize" -> Q.rowsOnly { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val model = graft.operators.Pq.fit(e, "vec_id", "embedding")
      graft.operators.Pq.quantize(e, "vec_id", "embedding", model)
        .select(col("vec_id"),
          concat_ws(",", col("codes")).as("codes"), col("mse"))
        .orderBy("vec_id")
    },

    // ADC search over PQ codes (d19): the corpus side of the join
    // carries codes only (no float vectors); per-query K-entry lookup
    // tables broadcast; est distance = M lookup-adds. Rows-only;
    // AnnSpec pins determinism + recall vs the exact baseline.
    "d19_pq_search" -> Q.rowsOnly { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val model = graft.operators.Pq.fit(e, "vec_id", "embedding")
      graft.operators.Pq.searchAdc(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", model, k = 5)
        .orderBy("query_id", "rank")
    },

    // IVF-PQ search (d20): coarse cells bound the candidate set,
    // ADC scores from codes — equi join on cell id, query side
    // broadcast. Rows-only; AnnSpec pins determinism, the
    // candidates-are-a-subset relation vs plain ADC, and recall.
    "d20_ivfpq_search" -> Q.rowsOnly { (s, dir) =>
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

    "d21_semantic_dedup" -> Q.rowsOnly { (s, dir) =>
      // minCosine 0.9 = SemDeDup's "cosine-near-identical" contract
      // (Abbas et al. 2023). A looser 0.4 chained whole IVF cells
      // into one component — diameter-many Pregel rounds put this
      // key at 80+ s/pass at sf0.1 while claiming a threshold the
      // paper never uses.
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
    "d07_embed_neardup" -> Q.rowsOnly { (s, dir) =>
      Ann.embedNearDupPairs(Tables(s, dir).embeddings, "vec_id", "embedding",
          minCosine = 0.4, dim = DIM)
        .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
        .orderBy("id1", "id2")
    }
  )
}
