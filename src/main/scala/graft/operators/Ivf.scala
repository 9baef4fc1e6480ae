package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the second scale path the brief
  * names next to hyperplane LSH: a coarse k-means quantizer splits the
  * corpus into cells, queries probe only the `nprobe` nearest cells,
  * so search cost is corpus_fraction ≈ nprobe/k instead of 1.
  *
  * Everything is deterministic and cluster-size independent:
  *  - init centroids = the k lowest-id vectors (no RNG);
  *  - Lloyd iterations assign via broadcast centroid literals and
  *    re-average per (cell, dimension) — a narrow groupBy, never a
  *    driver-side pass over the corpus; only the k×dim centroid
  *    matrix (a few KB) ever reaches the driver;
  *  - centroid coordinates are rounded each iteration so float
  *    summation order can't drift assignments between runs.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** All centroid distances in one native-expression pass (the
    * composed k×dim-literal form re-codegens megabytes per k-means
    * iteration); centroids travel as a single literal. */
  private[operators] def distances(df: DataFrame, vec: Column, m: Model): Column = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    call_function("cell_distances", vec, typedLit(m.centroids.map(_.toSeq).toSeq))
  }

  /** Index of the nearest centroid (ties → lowest index). */
  private[operators] def nearestCell(df: DataFrame, vec: Column, m: Model): Column = {
    val d = distances(df, vec, m)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Fitted models keyed by (plan identity, row count, params): an
    * IVF index is trained ONCE and reused across every query against
    * the same corpus — re-running Lloyd per search would be re-building
    * the index per query. The row count in the key catches in-place
    * overwrites the plan hash can't see. */
  private val fitted =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long, String, Int, Int), Model]()

  /** Train the coarse quantizer — on a BOUNDED deterministic sample.
    * At corpus scale a full pass per Lloyd iteration would read the
    * whole table `iterations` times to produce a k×dim matrix of a
    * few KB; quantizer quality needs only a few hundred vectors per
    * centroid (train-sample bound, standard IVF practice), so the
    * sample is capped at `maxTrain` (default 256·k) rows chosen by a
    * deterministic id-hash — no RNG, same model on every run and any
    * cluster size — and persisted across the iterations. */
  def fit(train: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 5, maxTrain: Int = 0): Model = {
    val cap = if (maxTrain > 0) maxTrain else 256 * k
    val n = train.count()
    val key = (train.queryExecution.analyzed.semanticHash(),
      n, s"$idCol/$vecCol", k, iterations * 10000 + cap)
    fitted.computeIfAbsent(key, _ =>
      fitImpl(train, idCol, vecCol, k, iterations, cap, n))
  }

  private def fitImpl(train: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int, cap: Int, n: Long): Model = {
    val rate = math.max(1L, n / cap)
    val sample0 = train.select(col(idCol), col(vecCol))
    val sample = (if (rate == 1L) sample0
      else sample0.filter(pmod(xxhash64(col(idCol)), lit(rate)) === 0))
      .persist()
    try {
      val dim = sample.select(size(col(vecCol))).head().getInt(0)
      var model = Model(
        sample.orderBy(col(idCol)).limit(k)
          .select(col(vecCol)).collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray))
      for (_ <- 1 to iterations) {
        // assign → per-(cell, dim) mean → rebuild the k×dim matrix
        val means = sample
          .select(nearestCell(sample, col(vecCol), model).as("__cell"),
            posexplode(col(vecCol)).as(Seq("__dim", "__x")))
          .groupBy("__cell", "__dim")
          .agg(round(avg(col("__x").cast("double")), 6).as("__m"))
          .collect()
        val next = Array.tabulate(model.k, dim)((c, d) => model.centroids(c)(d))
        means.foreach { r =>
          next(r.getAs[Int]("__cell"))(r.getAs[Int]("__dim")) = r.getAs[Double]("__m")
        }
        model = Model(next)
      }
      model
    } finally sample.unpersist(blocking = false)
  }

  /** Approximate top-k: probe the `nprobe` nearest cells per query,
    * exact cosine within the probed fraction. Assignment and probing
    * are pure column arithmetic against broadcast centroid literals —
    * the corpus is read once, shuffled once (on cell). */
  def search(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      model: Model, k: Int, nprobe: Int = 2): DataFrame = {
    val cells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      nearestCell(corpus, col(vecCol), model).as("__cell"))
    // per-query probed cells: indices of the nprobe smallest distances
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__dists", distances(queries, col("__qv"), model))
      .withColumn("__cell", explode(transform(
        slice(array_sort(zip_with(col("__dists"),
          sequence(lit(0), lit(model.k - 1)),
          (d, i) => struct(d.as("d"), i.as("i")))), 1, nprobe),
        s => s.getField("i").cast("int"))))
    val cand = cells.join(broadcast(probed), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Ann.cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "sim")
    Ann.topKPerQuery(cand, k)
  }

  /** Prebuilt IVF index: the corpus assigned to cells ONCE, stored
    * partitioned by cell, searched many times. Two realizations, both
    * result-identical to the one-shot `search` (AnnSpec):
    *
    *  - `buildIndex` persists the assignment in memory. MEASURED
    *    CAVEAT (dev/scale_probe_r10.txt): on a 400k×32-float corpus
    *    the cached path LOSES to one-shot recompute — deserializing
    *    float arrays from the columnar cache costs more than the k
    *    centroid distances it saves. Use only when assignment is
    *    genuinely expensive (large k) or the source scan is remote.
    *  - `buildIndexOnDisk` writes a parquet table PARTITIONED BY the
    *    cell id — the layout a 100 TB system actually ships: the
    *    probed-cell IN filter prunes at the FILE level, so a search
    *    reads ~nprobe/k of the corpus bytes (the p10 partitioned-
    *    layout discipline applied to vectors). */
  final case class Index private[operators] (cells: DataFrame, model: Model) {
    /** Complete release (the NearDupIndex discipline); no-op for the
      * disk-backed form. */
    def release(): Unit = cells.unpersist(blocking = false)
  }

  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): Index = {
    val cells = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"),
        nearestCell(corpus, col(vecCol), model).as("__cell"))
      .repartition(col("__cell"))
      .persist()
    cells.count()
    Index(cells, model)
  }

  def buildIndexOnDisk(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model, path: String): Index = {
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        nearestCell(corpus, col(vecCol), model).as("__cell"))
      .write.mode("overwrite").partitionBy("__cell").parquet(path)
    Index(corpus.sparkSession.read.parquet(path), model)
  }

  /** Search a prebuilt index: only the probed cells are read. The
    * probed-cell id set is ≤ model.k ints — collected to the driver
    * (model-scale, like the centroids themselves) and planted as an
    * IN filter so the cached cell partitions prune on batch stats. */
  def searchIndexed(index: Index, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val m = index.model
    val probed = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__dists", distances(queries, col("__qv"), m))
      .withColumn("__cell", explode(transform(
        slice(array_sort(zip_with(col("__dists"),
          sequence(lit(0), lit(m.k - 1)),
          (d, i) => struct(d.as("d"), i.as("i")))), 1, nprobe),
        s => s.getField("i").cast("int"))))
    val cellIds = probed.select("__cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val cand = index.cells
      .filter(col("__cell").isin(cellIds: _*))
      .join(broadcast(probed), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Ann.cosine(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "sim")
    Ann.topKPerQuery(cand, k)
  }
}
