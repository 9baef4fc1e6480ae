package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** m01 (SURVEY §2): binary-column media plumbing + stub featurizer.
  * Rows-only — the featurizer runs through typed mapPartitions, which
  * has no SQL twin; MultimodalSpec pins the decode math and schema. */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(

    // Frame sampling over the BINARY payload — every 2nd 32-byte
    // frame. Spark slices the binary column; the oracle slices the
    // (ASCII) varchar source, which is byte-identical, so even the
    // per-frame md5 is cross-engine checked.
    "m02_frame_sample" -> Q(
      """SELECT d.doc_id, i AS frame_idx,
        |  length(substring(d.text, CAST(i * 32 + 1 AS INT), 32)) AS frame_len,
        |  md5(substring(d.text, CAST(i * 32 + 1 AS INT), 32)) AS frame_md5
        |FROM documents d, range(0, 100) t(i)
        |WHERE i * 32 < length(d.text) AND i % 2 = 0
        |ORDER BY d.doc_id, frame_idx""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.sampleFrames(media, frameBytes = 32, every = 2)
        .orderBy("doc_id", "frame_idx")
    },

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
