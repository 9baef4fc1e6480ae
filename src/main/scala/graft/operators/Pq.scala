package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", IEEE TPAMI 2011) — the embedding
  * compression form beyond d14's scalar int8: the vector splits into
  * M subvectors, each quantized to the nearest of K per-subspace
  * centroids, so a dim-d float vector stores as M small codes (M=4,
  * K=16 → one nibble per code) with far lower reconstruction error
  * than scalar quantization at the same bit rate — the standard
  * 100 TB embedding-corpus storage/search layout (IVF-PQ).
  *
  * Scale shape, the Ivf discipline end to end:
  *  - FIT reuses Ivf.fit per subspace: deterministic k-means on a
  *    capped id-hash sample; only M × K × subDim centroid doubles
  *    (model scale) ever reach the driver.
  *  - QUANTIZE is scan-speed arithmetic: per-subspace squared-L2 to
  *    broadcast centroid literals through the native cell_distances
  *    kernel, argmin by array_position — zero shuffle, no UDF; at
  *    100 TB the codes ride the ingest scan.
  */
object Pq {

  final case class Model(sub: Seq[Ivf.Model], subDim: Int)

  def fit(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, k: Int = 16): Model = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    Model((0 until m).map { i =>
      Ivf.fit(
        df.select(col(idCol),
          slice(col(vecCol), i * subDim + 1, subDim).as(vecCol)),
        idCol, vecCol, k)
    }, subDim)
  }

  /** Per-subspace squared-L2 distance arrays to all K centroids
    * (native cell_distances against broadcast literals), aliased
    * `<prefix>0..<prefix>M-1`. On the corpus side these pick the
    * codes; on the ADC query side the SAME arrays ARE the lookup
    * tables. */
  private def distCols(vecCol: String, model: Model,
      prefix: String): Seq[org.apache.spark.sql.Column] =
    model.sub.zipWithIndex.map { case (sm, i) =>
      call_function("cell_distances",
        slice(col(vecCol), i * model.subDim + 1, model.subDim),
        typedLit(sm.centroids.map(_.toSeq).toSeq)).as(s"$prefix$i")
    }

  private def codesFrom(model: Model, prefix: String): org.apache.spark.sql.Column =
    array(model.sub.indices.map(i =>
      (array_position(col(s"$prefix$i"), array_min(col(s"$prefix$i"))) - 1)
        .cast("int")): _*)

  /** Per-vector codes (one per subspace, ties → lowest index) and
    * reconstruction MSE (mean over all dim components, rounded 6). */
  def quantize(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df.select(col(idCol) +: distCols(vecCol, model, "__d"): _*)
    val sse = model.sub.indices.map(i => array_min(col(s"__d$i")))
      .reduce(_ + _)
    base.select(col(idCol), codesFrom(model, "__d").as("codes"),
      round(sse / lit(model.subDim.toDouble * model.sub.size), 6).as("mse"))
  }

  /** Asymmetric-distance (ADC) top-k search — the PQ query path: the
    * query stays full precision, the CORPUS is scanned as codes only
    * (M small ints instead of dim floats — at 100 TB that is the
    * whole point: the search scan reads ~16× fewer bytes and the
    * distance estimate is M lookup-adds per candidate, no float
    * vector math). Per query, one cell_distances call per subspace
    * builds the K-entry lookup table; tables broadcast with the query
    * set; estimated distance = Σ_m lut_m[code_m]. Same two-phase
    * top-k as d05 — never a global sort. Ties → lowest neighbor id.
    */
  def searchAdc(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val codes = quantize(corpus, idCol, vecCol, model)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id") +: distCols(vecCol, model, "__l"): _*))
    val est = model.sub.indices.map(i =>
        element_at(col(s"__l$i"), element_at(col("codes"), i + 1) + 1))
      .reduce(_ + _)
    val scored = codes.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("est_dist", round(est, 6))
      .withColumn("sim", -col("est_dist"))
      .select("query_id", "neighbor_id", "sim", "est_dist")
    Ann.topKPerQuery(scored, k).drop("sim")
  }

  /** d20: IVF-PQ search — THE canonical 100 TB ANN layout (Jégou et
    * al. 2011): the coarse IVF quantizer bounds the candidate set to
    * the query's `nprobe` nearest cells, and ADC scores those
    * candidates from PQ codes alone. The corpus projection carries
    * (cell, codes) — small ints, no float vectors; the probed-cell ⋈
    * corpus join is an EQUI join on the cell id with the query side
    * broadcast, so the scan streams corpus-linear with candidate work
    * ≈ nprobe/k of the corpus and M lookup-adds per candidate. */
  def searchIvfAdc(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, ivfModel: Ivf.Model, model: Model, k: Int,
      nprobe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val corpusSide = corpus
      .select(col(idCol).as("neighbor_id") +:
        Ivf.nearestCell(corpus, col(vecCol), ivfModel).as("__cell") +:
        distCols(vecCol, model, "__d"): _*)
      .select(col("neighbor_id"), col("__cell"),
        codesFrom(model, "__d").as("__codes"))
    val probedQ = queries
      .select(col(idCol).as("query_id") +:
        Ivf.distances(queries, col(vecCol), ivfModel).as("__cd") +:
        distCols(vecCol, model, "__l"): _*)
      .withColumn("__cell", explode(transform(
        slice(array_sort(zip_with(col("__cd"),
          sequence(lit(0), lit(ivfModel.k - 1)),
          (d, i) => struct(d.as("d"), i.as("i")))), 1, nprobe),
        s => s.getField("i").cast("int"))))
      .drop("__cd")
    val est = model.sub.indices.map(i =>
        element_at(col(s"__l$i"), element_at(col("__codes"), i + 1) + 1))
      .reduce(_ + _)
    val cand = corpusSide.join(broadcast(probedQ), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("est_dist", round(est, 6))
      .withColumn("sim", -col("est_dist"))
      .select("query_id", "neighbor_id", "sim", "est_dist")
    Ann.topKPerQuery(cand, k).drop("sim")
  }
}
