package graft.sources

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** The reference's compressed stream framing
  * (src/Compression/CompressedWriteBuffer.cpp /
  * CompressedReadBufferBase.cpp:112-160) as plain java.io stream
  * wrappers, so any byte format (Native blocks here) can ride inside:
  *
  *   per frame: 16-byte CityHash128 v1.0.2 checksum of what follows,
  *   then a 9-byte header — 1 byte method (0x82 = LZ4, 0x90 = ZSTD,
  *   0x02 = NONE; CompressionInfo.h:38-40), UInt32 LE
  *   compressed-size-including-this-header, UInt32 LE decompressed
  *   size — then the payload (LZ4 block format / one ZSTD frame /
  *   raw for NONE).
  *
  * Frame boundaries are the writer's buffer flushes (the reference's
  * DBMS_DEFAULT_BUFFER_SIZE = 1 MiB), independent of the framing of
  * whatever rides inside. LZ4 block compression comes from lz4-java
  * (already on Spark's classpath — Spark's own shuffle codec), which
  * implements the same public LZ4 block format the reference links;
  * ZSTD (CompressionCodecZSTD.cpp, default level 1) from zstd-jni,
  * also on Spark's classpath.
  */
object CompressedFrames {
  val MethodLz4: Int = 0x82
  val MethodNone: Int = 0x02
  val MethodZstd: Int = 0x90
  /** CompressionCodecZSTD.cpp ZSTD_DEFAULT_LEVEL. */
  private val ZstdLevel = 1
  private def isMethod(m: Int): Boolean =
    m == MethodLz4 || m == MethodNone || m == MethodZstd
  val BufSize: Int = 1048576
  private val HeaderSize = 9

  private def lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  final class FrameOutputStream(out: OutputStream, method: Int = MethodLz4)
      extends OutputStream {
    require(isMethod(method),
      f"unsupported compression method 0x$method%02x")
    private val buf = new Array[Byte](BufSize)
    private var n = 0

    override def write(b: Int): Unit = {
      if (n == buf.length) flushFrame()
      buf(n) = b.toByte
      n += 1
    }

    override def write(b: Array[Byte], off0: Int, len0: Int): Unit = {
      var off = off0
      var len = len0
      while (len > 0) {
        if (n == buf.length) flushFrame()
        val take = math.min(len, buf.length - n)
        System.arraycopy(b, off, buf, n, take)
        n += take; off += take; len -= take
      }
    }

    private def flushFrame(): Unit = {
      if (n == 0) return
      val payload =
        if (method == MethodLz4) {
          val c = lz4.fastCompressor()
          val max = c.maxCompressedLength(n)
          val dst = new Array[Byte](max)
          val clen = c.compress(buf, 0, n, dst, 0, max)
          java.util.Arrays.copyOf(dst, clen)
        } else if (method == MethodZstd) {
          val max = com.github.luben.zstd.Zstd.compressBound(n.toLong).toInt
          val dst = new Array[Byte](max)
          val clen = com.github.luben.zstd.Zstd.compressByteArray(
            dst, 0, max, buf, 0, n, ZstdLevel)
          require(!com.github.luben.zstd.Zstd.isError(clen),
            s"zstd compress: ${com.github.luben.zstd.Zstd.getErrorName(clen)}")
          java.util.Arrays.copyOf(dst, clen.toInt)
        } else java.util.Arrays.copyOf(buf, n)
      val framed = ByteBuffer.allocate(HeaderSize + payload.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      framed.put(method.toByte)
      framed.putInt(HeaderSize + payload.length)
      framed.putInt(n)
      framed.put(payload)
      val bytes = framed.array()
      val (lo, hi) = CityHash102.cityHash128(bytes, 0, bytes.length)
      val ck = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      ck.putLong(lo); ck.putLong(hi)
      out.write(ck.array())
      out.write(bytes)
      n = 0
    }

    override def flush(): Unit = { flushFrame(); out.flush() }
    override def close(): Unit = { flushFrame(); out.close() }
  }

  final class FrameInputStream(in: InputStream) extends InputStream {
    private var cur: Array[Byte] = Array.emptyByteArray
    private var pos = 0

    private def readFully(b: Array[Byte], off: Int, len: Int): Boolean = {
      var got = 0
      while (got < len) {
        val r = in.read(b, off + got, len - got)
        if (r < 0) {
          if (got == 0) return false
          throw new EOFException("truncated compressed frame")
        }
        got += r
      }
      true
    }

    /** Load the next frame; false at clean EOF. */
    private def nextFrame(): Boolean = {
      val head = new Array[Byte](16 + HeaderSize)
      if (!readFully(head, 0, head.length)) return false
      val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
      val ckLo = bb.getLong
      val ckHi = bb.getLong
      val method = bb.get() & 0xff
      val compWithHeader = bb.getInt
      val rawLen = bb.getInt
      require(isMethod(method),
        f"compressed frame: unsupported method 0x$method%02x")
      require(compWithHeader >= HeaderSize && compWithHeader <= 16 * BufSize,
        s"compressed frame: bad compressed size $compWithHeader")
      require(rawLen >= 0 && rawLen <= 16 * BufSize,
        s"compressed frame: bad decompressed size $rawLen")
      val framed = new Array[Byte](compWithHeader)
      System.arraycopy(head, 16, framed, 0, HeaderSize)
      if (!readFully(framed, HeaderSize, compWithHeader - HeaderSize))
        throw new EOFException("truncated compressed frame")
      val (lo, hi) = CityHash102.cityHash128(framed, 0, framed.length)
      require(lo == ckLo && hi == ckHi,
        "compressed frame: checksum mismatch — corrupted data " +
          "(the reference's CHECKSUM_DOESNT_MATCH)")
      cur =
        if (method == MethodLz4) {
          val dst = new Array[Byte](rawLen)
          lz4.fastDecompressor()
            .decompress(framed, HeaderSize, dst, 0, rawLen)
          dst
        } else if (method == MethodZstd) {
          val dst = new Array[Byte](rawLen)
          val got = com.github.luben.zstd.Zstd.decompressByteArray(
            dst, 0, rawLen, framed, HeaderSize, framed.length - HeaderSize)
          require(!com.github.luben.zstd.Zstd.isError(got) && got == rawLen,
            "compressed frame: zstd payload does not decompress to the " +
              s"declared size ($got vs $rawLen) — corrupted data")
          dst
        } else java.util.Arrays.copyOfRange(framed, HeaderSize, framed.length)
      pos = 0
      true
    }

    override def read(): Int = {
      while (pos >= cur.length) if (!nextFrame()) return -1
      val b = cur(pos) & 0xff
      pos += 1
      b
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (pos >= cur.length) if (!nextFrame()) return -1
      val take = math.min(len, cur.length - pos)
      System.arraycopy(cur, pos, b, off, take)
      pos += take
      take
    }

    override def close(): Unit = in.close()
  }

  /** Does this file start with a valid compressed frame? Decisive:
    * sane header fields AND the 128-bit checksum verifying over the
    * first frame — an uncompressed Native stream (varint column
    * count first) cannot fake that. */
  def detect(path: String): Boolean = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try {
      val head = new Array[Byte](16 + HeaderSize)
      var got = 0
      var r = 0
      while (got < head.length && { r = in.read(head, got, head.length - got); r > 0 })
        got += r
      if (got < head.length) return false
      val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
      val ckLo = bb.getLong
      val ckHi = bb.getLong
      val method = bb.get() & 0xff
      val compWithHeader = bb.getInt
      val rawLen = bb.getInt
      if (!isMethod(method)) return false
      if (compWithHeader < HeaderSize || compWithHeader > 16 * BufSize) return false
      if (rawLen < 0 || rawLen > 16 * BufSize) return false
      // MethodNone frames store the payload verbatim: inconsistent
      // sizes mean "not a frame", strengthening the sane-header test
      // that gates the corruption throw below
      if (method == MethodNone && rawLen != compWithHeader - HeaderSize)
        return false
      val framed = new Array[Byte](compWithHeader)
      System.arraycopy(head, 16, framed, 0, HeaderSize)
      got = HeaderSize
      while (got < compWithHeader &&
          { r = in.read(framed, got, compWithHeader - got); r > 0 })
        got += r
      if (got < compWithHeader) return false
      val (lo, hi) = CityHash102.cityHash128(framed, 0, framed.length)
      // Header fields sane AND the whole frame present: this IS a
      // compressed file. A checksum mismatch here is CORRUPTION and
      // must surface as the reference's CHECKSUM_DOESNT_MATCH — not
      // `false`, which would send the caller down the uncompressed
      // path to die on a misleading block-parse error (r15 advice).
      // The odds of an uncompressed Native stream passing the header
      // sanity checks are ~0 (its first byte is a varint column
      // count; method must be 0x82/0x90/0x02 at offset 16).
      require(lo == ckLo && hi == ckHi,
        "compressed frame: checksum mismatch in the FIRST frame — " +
          "corrupted data (the reference's CHECKSUM_DOESNT_MATCH)")
      true
    } finally in.close()
  }
}
