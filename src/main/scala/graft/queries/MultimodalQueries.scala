package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** m01 (SURVEY §2): binary-column media plumbing + stub featurizer.
  * Rows-only — the featurizer runs through typed mapPartitions, which
  * has no SQL twin; MultimodalSpec pins the decode math and schema. */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(
    "m01_multimodal" -> Q.rowsOnly { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.featurize(media)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("n_bytes"), round(col("mean_byte"), 6).as("mean_byte"),
          round(col("std_byte"), 6).as("std_byte"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    }
  )
}
