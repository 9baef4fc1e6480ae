package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.sources.Tables

/** Quality/determinism contract for the rows-only ANN path: recall@5
  * of LSH vs the exact brute-force baseline on the real embeddings. */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def topPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("LSH recall@5 against brute force is usable and deterministic") {
    val e = Tables(spark, sfDir).embeddings
    val q = e.filter(col("vec_id") < 20)
    val exact = topPairs(Ann.bruteTopK(e, q, "vec_id", "embedding", k = 5))
    val approx1 = topPairs(Ann.lshTopK(e, q, "vec_id", "embedding", k = 5, dim = 64))
    val approx2 = topPairs(Ann.lshTopK(e, q, "vec_id", "embedding", k = 5, dim = 64))
    assert(approx1 == approx2, "LSH must be run-to-run deterministic")
    // isotropic (clusterless) synthetic vectors are the ANN worst
    // case; 0.5 is the floor for the default knobs there (observed
    // 0.78, deterministic — fixed data and fixed hyperplanes)
    val recall = exact.intersect(approx1).size.toDouble / exact.size
    info(f"recall@5 = $recall%.3f (${approx1.size} approx pairs)")
    assert(recall >= 0.5, f"recall@5 $recall%.3f below floor")
  }

  test("brute-force top-1 equals a directly computed argmax") {
    val e = Tables(spark, sfDir).embeddings
    val vecs = e.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs.find(_._1 == 0L).get
    val expect = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q._2, v)) }
      .maxBy { case (id, s) => (s, -id) }._1
    val got = Ann.bruteTopK(e, e.filter(col("vec_id") === 0), "vec_id", "embedding", k = 1)
      .select("neighbor_id").as[Long].head()
    assert(got == expect)
  }
}
