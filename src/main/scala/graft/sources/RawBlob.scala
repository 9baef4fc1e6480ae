package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** RawBLOB (reference: registerFormats.cpp:51-52) — the no-framing
  * format: the ENTIRE file is one value. Adoption yields one row with
  * one binary column (`raw_blob`, the reference's default structure);
  * output concatenates the single column's values byte-for-byte with
  * no delimiter or escaping.
  *
  * This is the natural ingest format for the multimodal binary-payload
  * tables: one media blob per file → one `binary` cell, exactly m01's
  * media column shape. Driver-side single-file, the file() adoption /
  * INTO OUTFILE client-sink contract (a 100 TB media corpus belongs in
  * parquet binary columns — which is where this adopts INTO). */
object RawBlob {

  /** One row, one non-null binary column holding the whole file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val schema = StructType(Seq(StructField("raw_blob", BinaryType, false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(Row(bytes)).asJava, schema)
  }

  /** Concatenate the single column raw. Binary writes bytes as-is;
    * String writes UTF-8. Streams partition-by-partition. */
  def write(df: DataFrame, path: String): Unit = {
    require(df.schema.fields.length == 1,
      s"RawBLOB holds exactly ONE column, got ${df.schema.fields.length} " +
        s"(${df.schema.fieldNames.mkString(", ")})")
    val dt = df.schema.fields(0).dataType
    require(dt == BinaryType || dt == StringType,
      s"RawBLOB: column must be binary or String, got ${dt.simpleString}")
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        require(!row.isNullAt(0), "RawBLOB: NULL value has no byte form")
        dt match {
          case BinaryType => out.write(row.getAs[Array[Byte]](0))
          case _ => out.write(row.getString(0).getBytes("UTF-8"))
        }
      }
    } finally out.close()
  }
}
