package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Contract tests for the multimodal plumbing: schema, decode math,
  * determinism, and partition preservation. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media schema: binary content + typed metadata") {
    val media = Multimodal.asMedia(Tables(spark, sfDir).documents, "doc_id", "text")
    val f = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("content") == "binary")
    assert(f("doc_id") == "bigint" && f("width") == "int" && f("height") == "int")
  }

  test("stub decode matches a hand computation and featurize carries it through") {
    val bytes = "abcz".getBytes("UTF-8") // 97 98 99 122
    val (mean, std, feat) = Multimodal.decodeStub(bytes)
    assert(mean == (97 + 98 + 99 + 122) / 4.0)
    val m = (97 + 98 + 99 + 122) / 4.0
    val v = (97.0 * 97 + 98 * 98 + 99 * 99 + 122.0 * 122) / 4.0 - m * m
    assert(math.abs(std - math.sqrt(v)) < 1e-12)
    assert(feat(3) == 1.0f && feat(2) == 0.0f) // all four bytes in bucket 96..127
    val row = Multimodal.featurize(
        Multimodal.asMedia(Seq((1L, "abcz")).toDF("doc_id", "text"), "doc_id", "text"))
      .collect().head
    assert(row.mean_byte == mean && row.n_bytes == 4L)
  }

  test("featurization is deterministic and row-preserving") {
    val media = Multimodal.asMedia(Tables(spark, sfDir).documents, "doc_id", "text")
    val a = Multimodal.featurize(media).select("doc_id", "mean_byte")
      .as[(Long, Double)].collect().sorted.toSeq
    val b = Multimodal.featurize(media).select("doc_id", "mean_byte")
      .as[(Long, Double)].collect().sorted.toSeq
    assert(a == b)
    assert(a.size == media.count())
  }

  test("featurize is a narrow dependency (no shuffle in the plan)") {
    val media = Multimodal.asMedia(Tables(spark, sfDir).documents, "doc_id", "text")
      .repartition(3)
    val plan = Multimodal.featurize(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"featurize introduced a shuffle:\n$plan")
  }
}
