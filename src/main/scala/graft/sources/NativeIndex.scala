package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.charset.StandardCharsets.UTF_8

/** The block index over Native files (reference:
  * src/Formats/IndexForNativeFormat.cpp:1-91 — the same byte layout,
  * same `extractIndexForColumns` validation): per block a varuint
  * column count and row count, then per column the name and CH type
  * (varint-length strings) and a MarkInCompressedFile — two binary
  * UInt64s, `offset_in_compressed_file` and
  * `offset_in_decompressed_block` (MarkInCompressedFile.h). The mark
  * points at the column's NAME string, exactly where
  * NativeReader.cpp:117-120 seeks before re-reading name/type and
  * verifying them against the index.
  *
  * For the uncompressed files INTO OUTFILE writes,
  * `offset_in_compressed_file` is the plain byte offset and
  * `offset_in_decompressed_block` is 0 (the degenerate mark, same
  * convention the reference uses for uncompressed streams). The index
  * travels as a `<file>.idx` sidecar. What it buys is what it buys
  * the reference's StripeLog: column projection without touching the
  * other columns' bytes, and block skips — NativeFormat.readIndexed
  * decodes a predicate column first and never decodes the remaining
  * columns of blocks with no match (parquet row-group pruning, the
  * Native edition). */
object NativeIndex {

  final case class Mark(offsetCompressed: Long, offsetDecompressed: Long)
  final case class ColumnLoc(name: String, tpe: String, mark: Mark)
  final case class BlockIndex(numRows: Long, columns: Vector[ColumnLoc]) {
    def numColumns: Int = columns.length

    /** reference extractIndexForColumns (IndexForNativeFormat.cpp:42-63),
      * with its exact two failure modes. */
    def extractForColumns(required: Set[String]): BlockIndex = {
      require(numColumns >= required.size,
        "Index contain less than required columns")
      val kept = columns.filter(c => required.contains(c.name))
      require(kept.size >= required.size,
        "Index contain less than required columns")
      require(kept.size <= required.size,
        "Index contain duplicate columns")
      BlockIndex(numRows, kept)
    }
  }

  def sidecarPath(nativePath: String): String = nativePath + ".idx"

  // ---------- io (same varint/string encoding as the data file) ----------

  private def writeVarint(out: OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeString(out: OutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeVarint(out, b.length.toLong)
    out.write(b)
  }

  private def writeU64(out: OutputStream, v: Long): Unit =
    out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(v).array())

  def write(path: String, blocks: Seq[BlockIndex]): Unit = {
    val out = new BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try blocks.foreach { b =>
      writeVarint(out, b.numColumns.toLong)
      writeVarint(out, b.numRows)
      b.columns.foreach { c =>
        writeString(out, c.name)
        writeString(out, c.tpe)
        writeU64(out, c.mark.offsetCompressed)
        writeU64(out, c.mark.offsetDecompressed)
      }
    } finally out.close()
  }

  private def readVarint(in: DataInputStream): Long = {
    var v = 0L; var shift = 0
    while (true) {
      val b = in.read()
      if (b < 0) throw new java.io.EOFException()
      v |= (b.toLong & 0x7f) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    v
  }

  private def readString(in: DataInputStream): String = {
    val n = readVarint(in).toInt
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, UTF_8)
  }

  private def readU64(in: DataInputStream): Long = {
    val b = new Array[Byte](8)
    in.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** Whole-index read: blocks until EOF (IndexForNativeFormat::read). */
  def read(path: String): Vector[BlockIndex] = {
    val in = new DataInputStream(new BufferedInputStream(
      java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))))
    try {
      val blocks = Vector.newBuilder[BlockIndex]
      var eof = false
      while (!eof) {
        in.mark(1)
        if (in.read() < 0) eof = true
        else {
          in.reset()
          val ncols = readVarint(in).toInt
          require(ncols > 0 && ncols < 100000, s"Native index: $ncols columns")
          val nrows = readVarint(in)
          val cols = Vector.newBuilder[ColumnLoc]
          var i = 0
          while (i < ncols) {
            cols += ColumnLoc(readString(in), readString(in),
              Mark(readU64(in), readU64(in)))
            i += 1
          }
          blocks += BlockIndex(nrows, cols.result())
        }
      }
      blocks.result()
    } finally in.close()
  }

  /** A position-tracking wrapper so the Native writer can record the
    * index marks: `count` is the logical file position as long as
    * this sits ABOVE any buffering. */
  final class CountingOutputStream(under: OutputStream) extends OutputStream {
    var count: Long = 0L
    override def write(b: Int): Unit = { under.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      under.write(b, off, len); count += len
    }
    override def flush(): Unit = under.flush()
    override def close(): Unit = under.close()
  }
}
