package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2 d05–d06).
  *
  * d05 brute force is the exact baseline: broadcast the (small) query
  * set, one streaming pass over the corpus, and a TWO-PHASE top-k —
  * per-shuffle-partition top-k first, then top-k of the ≤ parts·k
  * survivors — so no single partition ever sees the whole corpus, and
  * the full (query × corpus) score set is never shuffled. That is the
  * 100 TB shape; correctness is DuckDB-oracled.
  *
  * d06 is the scale path: random-hyperplane LSH (Charikar 2002).
  * Deterministic ±1 hyperplanes derived from splitmix64 — no RNG
  * state, same buckets on every run and every cluster size. Multiple
  * independent tables raise recall; candidates are only scored within
  * matching buckets, so cost is corpus-linear.
  */
object Ann {

  /** Sequential double-precision dot product — element-wise cast to
    * double BEFORE multiplying, so DuckDB's
    * list_sum(list_transform(...)) reproduces the exact IEEE sequence
    * bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def l2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, x) => acc + x))

  /** Composed (3-pass) cosine — kept as the readable reference and
    * used by CosineSimSpec to pin bit-equality with the native form. */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** One-pass native cosine (functions.CosineSim) — same IEEE
    * sequence as the composed form, bit-identical results. Callers
    * must have GraftFunctions registered (every operator entry point
    * here does). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** d17: nearest-class-centroid assignment — the centroid-classifier
    * scoring pass (and the evaluation shape for "is this embedding
    * space linearly separable by class"). Two phases, the Ivf
    * discipline:
    *
    *  1. FIT: per-(label, position) mean over the corpus — explode +
    *     one hash aggregate, partial-agg friendly; components rounded
    *     to 6 (the a06 cross-row double-aggregate discipline). The
    *     k×dim result is MODEL-scale and collects to the driver
    *     (sanctioned, same as Ivf.fit).
    *  2. ASSIGN: centroids become plan literals; each row's squared
    *     L2 to every centroid is an index-order fold, argmin picked by
    *     a when-chain (ties → smallest label). Scan speed, zero
    *     shuffle — at 100 TB the scoring pass rides the ingest scan.
    */
  def centroidAssign(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val cents: Map[Int, Seq[Double]] = emb
      .select(col(labelCol).cast("int").as("__l"),
        posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .groupBy("__l", "__p").agg(round(avg(col("__v").cast("double")), 6).as("__c"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    val labels = cents.keys.toSeq.sorted
    def distTo(l: Int): Column = {
      val cent = array(cents(l).map(lit): _*)
      aggregate(
        zip_with(col(vecCol), cent,
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0d), (acc, x) => acc + x)
    }
    val withD = emb.select(col(idCol) +:
      col(labelCol).cast("int").as(labelCol) +:
      labels.map(l => distTo(l).as(s"__d$l")): _*)
    // argmin when-chain in label order: strict < against every other
    // distance wins; ties fall through to the SMALLEST label
    val assigned = labels.init.foldRight(lit(labels.last)) { (l, acc) =>
      val others = labels.filter(_ != l)
      when(others.map(o => col(s"__d$l") <= col(s"__d$o"))
        .reduce(_ && _), lit(l)).otherwise(acc)
    }
    withD
      .withColumn("assigned", assigned)
      .withColumn("dist",
        round(labels.map(l => col(s"__d$l")).reduce(least(_, _)), 6))
      .withColumn("correct", col("assigned") === col(labelCol))
      .drop(labels.map(l => s"__d$l"): _*)
  }

  /** Exact cosine top-k neighbours for each query row. `queries` must
    * be broadcast-small (it is crossed with the corpus). */
  def bruteTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "sim")
    topKPerQuery(scored, k)
  }

  /** Two-phase distributed top-k: local winners per input partition,
    * then global winners among parts·k rows. Both windows are
    * partitioned (never a global sort); ties broken by neighbor id.
    * Shared with the IVF search path. */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val order = Seq(col("sim").desc, col("neighbor_id").asc)
    val local = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(order: _*)
    val global = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored
      .withColumn("__lrn", row_number().over(local)).filter(col("__lrn") <= k)
      .withColumn("__rn", row_number().over(global)).filter(col("__rn") <= k)
      .withColumnRenamed("__rn", "rank").drop("__lrn")
  }

  /** LSH code array — one `bits`-bit bucket code per table, from the
    * native HyperplaneCode expression (deterministic ±1 splitmix64
    * planes; one pass over the vector per bit, no literal plane
    * arrays in the plan). */
  private def codeArray(df: DataFrame, vec: Column, tables: Int, bits: Int): Column = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    call_function("hyperplane_lsh", vec, lit(tables), lit(bits))
  }

  /** d06: approximate top-k — score only corpus rows sharing an LSH
    * bucket with the query in ANY table. Recall grows with `tables`,
    * candidate count shrinks with `bits`; both are knobs per corpus
    * density. Output matches bruteTopK's shape (plus it is a subset
    * ranking, so recall@k against d05 is the quality metric — pinned
    * in AnnSpec).
    *
    * Default (8 tables × 4 bits) is tuned for the synthetic test
    * embeddings, which are near-ISOTROPIC (no cluster structure —
    * measured: top-1 neighbour shares the row's label 2/20 times), the
    * hardest case for any ANN index: recall@5 = 0.78 at a ~40%
    * candidate fraction. On real embedding corpora (clustered by
    * semantics) raise `bits` to cut the candidate fraction by orders
    * of magnitude at equal recall — same plan shape either way. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, tables: Int = 8, bits: Int = 4,
      probeRadius: Int = 1): DataFrame = {
    // the bucket-join relations carry IDS + CODES ONLY — embedding
    // vectors never enter the candidate join or the dedup shuffle
    def coded(df: DataFrame, role: String) =
      df.select(col(idCol).as(s"${role}_id"),
        posexplode(codeArray(df, col(vecCol), tables, bits))
          .as(Seq("__table", "__code")))
    // multi-probe: the QUERY side also visits buckets within Hamming
    // `probeRadius` of its code (a near-boundary projection flips one
    // sign) — recall rises without touching the corpus-side index or
    // its one-bucket-per-table cost; only the broadcast-small query
    // relation fans out ×(1+bits).
    val qCoded = coded(queries, "query")
    val qProbed =
      if (probeRadius <= 0) qCoded
      else qCoded.withColumn("__code", explode(array(
        col("__code") +: (0 until bits).map(b =>
          col("__code").bitwiseXOR(lit(1L << b))): _*)))
    val qb = broadcast(qProbed)
    // a pair may collide in several tables/probes — dedup on the id
    // pair (what actually determines it), THEN join vectors back:
    // the corpus vectors are shuffled once per surviving pair, not
    // hashed per raw collision
    val cand = coded(corpus, "neighbor")
      .join(qb, Seq("__table", "__code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")), "neighbor_id")
      .join(qv, "query_id")
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "sim")
    topKPerQuery(scored, k)
  }

  /** d14: symmetric int8 quantization of the embedding column — the
    * storage form a 100 TB vector corpus actually ships (4× smaller
    * than float32; int8 dot products stay SIMD-friendly downstream).
    * Per-vector absmax scaling: scale = max|x|/127,
    * q_i = clamp(⌊x_i/scale + 0.5⌋, ±127). Everything is scan-speed
    * column arithmetic — no shuffle, no UDF — and every op (abs, max,
    * floor, the error fold) is the same IEEE double sequence DuckDB
    * runs, so scale, codes AND the reconstruction MSE (the number a
    * pipeline thresholds on before switching storage) hash-compare
    * exactly, like d05's cosine. */
  def quantizeInt8(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus
      .withColumn("__absmax",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))))
      .withColumn("scale",
        when(col("__absmax") === 0.0d, 1.0d).otherwise(col("__absmax") / 127.0d))
      .withColumn("q", transform(col(vecCol), x =>
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / col("scale") + 0.5d))).cast("int")))
      .withColumn("mse",
        aggregate(
          zip_with(col(vecCol), col("q"), (x, qi) => {
            val d = x.cast("double") - qi.cast("double") * col("scale")
            d * d
          }),
          lit(0.0d), (acc, e) => acc + e) / size(col(vecCol)))
      .select(col(idCol), col("scale"),
        array_join(transform(col("q"), _.cast("string")), ",").as("q"),
        col("mse"))

  /** d07: embedding-cosine near-dup over the WHOLE corpus (brief's
    * fifth dedup mode): LSH buckets generate candidate pairs (same
    * capped-bucket machinery as MinHash dedup — corpus-linear), exact
    * cosine verifies. Precision is 1.0 by construction (every emitted
    * pair is exactly scored); recall is the LSH knob, pinned in
    * AnnSpec against a brute-force ground truth. */
  def embedNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String, minCosine: Double,
      dim: Int, tables: Int = 8, bits: Int = -1, maxBucket: Int = 200): DataFrame = {
    // NOT persisted (the funnel's trade): the three consumers re-derive
    // from lineage rather than caching a corpus-of-vectors intermediate
    // that would spill at scale and leak in a long-lived session. The
    // sizing count() runs on the RAW corpus — for a parquet source
    // that's footer metadata, no data scan.
    val vecs = corpus.select(col(idCol), col(vecCol).as("__v"))
    // auto-size the code width to the corpus: ~32 vectors per bucket
    // keeps in-bucket pair generation constant-cost as the corpus
    // grows (fixed bits would either blow the bucket cap at scale or
    // over-fragment a small corpus). Genuine near-dups (cos ≳ 0.9)
    // collide at ≳ 0.95^bits per table, so recall stays high at any
    // corpus size.
    // auto width = ceil(log2(n/32)) computed as "smallest b with
    // 32·2^b ≥ n" — pure integer arithmetic, so the DuckDB oracle's
    // twin can never desync by a libm ulp at exact-boundary corpus
    // sizes (r10 advice: CEIL(LN/LN) differs per libm at n = 32·2^k)
    val effBits =
      if (bits > 0) bits
      else {
        val n = math.max(corpus.count(), 64L)
        math.max(2, Iterator.from(1).find(b => (32L << b) >= n).get)
      }
    val bucketed = vecs.select(col(idCol),
      posexplode(codeArray(corpus, col("__v"), tables, effBits))
        .as(Seq("__table", "__code")))
    val pairs = Dedup.bucketPairs(bucketed, Seq("__table", "__code"), idCol, maxBucket)
    pairs
      .join(vecs.select(col(idCol).as("id1"), col("__v").as("__v1")), "id1")
      .join(vecs.select(col(idCol).as("id2"), col("__v").as("__v2")), "id2")
      .withColumn("sim", cosine(col("__v1"), col("__v2")))
      .filter(col("sim") >= minCosine)
      .select("id1", "id2", "sim")
  }

  /** Johnson–Lindenstrauss random projection: dim → outDim with a
    * Rademacher (±1/√outDim) matrix, the standard embedding-column
    * dimensionality reducer ahead of ANN / clustering at corpus
    * scale. Map-only: the outDim×dim sign matrix is derived
    * deterministically from md5(seed:row:col) (no RNG state, same
    * matrix on every executor and every engine — the DuckDB oracle
    * rebuilds it the same way), travels as one literal, and each
    * output coordinate is a sequential zip_with/aggregate fold, so
    * the op is scan-speed with zero shuffle and the projected table
    * feeds bruteTopK/lshTopK at outDim/dim of the original cost. */
  def projectionSigns(seed: String, outDim: Int, dim: Int): Seq[Seq[Double]] =
    (0 until outDim).map { j =>
      (0 until dim).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$j:$i".getBytes("UTF-8"))
        // top bit of the first md5 byte = first hex char in 0..7 ⇒ +1
        if ((h(0) & 0x80) == 0) 1.0 else -1.0
      }
    }

  def randomProject(df: DataFrame, vecCol: String, outDim: Int,
      dim: Int, seed: String = "rp"): Column = {
    val rows = typedLit(projectionSigns(seed, outDim, dim))
    transform(rows, r =>
      aggregate(
        zip_with(col(vecCol), r,
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v) / math.sqrt(outDim.toDouble))
  }
}
