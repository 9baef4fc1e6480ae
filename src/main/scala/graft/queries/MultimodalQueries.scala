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

    // Binary near-dup by frame fingerprints (m03): the oracle builds
    // the same decimated frame sets over the varchar twin of the
    // payload and replays the df-cap + set-Jaccard verify. The
    // documents corpus plants near-dup texts, so shared-prefix
    // payloads produce real matches.
    "m03_binary_neardup" -> Q(
      """WITH fr AS (
        |  SELECT doc_id, fm,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS sz
        |  FROM (
        |    SELECT DISTINCT d.doc_id,
        |      md5(substring(d.text, CAST(i * 32 + 1 AS INT), 32)) AS fm
        |    FROM documents d, range(0, 100) t(i)
        |    WHERE i * 32 < length(d.text) AND i % 2 = 0)),
        |ff AS (
        |  SELECT * FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY fm) AS df FROM fr)
        |  WHERE df <= 100),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter,
        |         MIN(a.sz) AS sa, MIN(b.sz) AS sb
        |  FROM ff a JOIN ff b ON a.fm = b.fm AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, CAST(inter AS DOUBLE)/(sa + sb - inter) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE)/(sa + sb - inter) >= 0.3
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.binaryNearDup(media, frameBytes = 32, every = 2,
          maxFrameDf = 100, minJaccard = 0.3)
        .orderBy("id1", "id2")
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
