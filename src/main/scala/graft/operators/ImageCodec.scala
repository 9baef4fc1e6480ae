package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for two trivial raster containers, so the
  * multimodal featurizer's decode step is REAL (header parse + pixel
  * extraction), not a byte-histogram fake:
  *
  *  - BMP, the 24bpp uncompressed Windows form: 14-byte file header
  *    ('BM', file size, data offset) + 40-byte BITMAPINFOHEADER
  *    (width, height, planes=1, bpp=24, BI_RGB), pixel rows BGR,
  *    each row padded to 4 bytes, bottom-up when height > 0.
  *  - farbfeld (suckless.org's interchange format): 8-byte magic
  *    "farbfeld" + big-endian u32 width/height + w·h RGBA pixels of
  *    big-endian u16 per channel.
  *
  * Both are fixed-header + raw-pixels formats — decodable without any
  * codec dependency, which is the point: the Spark-side plumbing
  * (schema, mapPartitions batching, per-partition decoder reuse) is
  * identical to what a JNI/FFI JPEG decoder would need, but the
  * decode itself is honest. Decoded pixels surface as 0..255 channel
  * values, interleaved row-major top-down (farbfeld's 16-bit channels
  * keep their high byte). */
object ImageCodec {

  /** Decoded raster: `pixels` is channel-interleaved row-major
    * top-down, one Int (0..255) per channel sample. */
  final case class DecodedImage(format: String, width: Int, height: Int,
    channels: Int, pixels: Array[Int])

  // ---------- BMP (24bpp BI_RGB) ----------

  private def rowStride(width: Int): Int = ((width * 3) + 3) & ~3

  /** 24bpp bottom-up BMP file size for given dimensions. */
  def bmpSize(width: Int, height: Int): Int =
    14 + 40 + rowStride(width) * height

  /** Encode RGB pixels (row-major top-down, 3 ints per pixel, 0..255)
    * as a 24bpp bottom-up BMP. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"encodeBmp: need ${width * height * 3} channel values, got ${rgb.length}")
    val stride = rowStride(width)
    val size = bmpSize(width, height)
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(stride * height).putInt(0).putInt(0)
      .putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val base = (y * width + x) * 3
        // BGR on disk
        bb.put((rgb(base + 2) & 0xff).toByte)
        bb.put((rgb(base + 1) & 0xff).toByte)
        bb.put((rgb(base) & 0xff).toByte)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  private def decodeBmp(bytes: Array[Byte]): DecodedImage = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(10)
    val dataOffset = bb.getInt
    bb.position(14)
    val hdrSize = bb.getInt
    require(hdrSize >= 40, s"BMP: unsupported header size $hdrSize")
    val width = bb.getInt
    val rawHeight = bb.getInt
    val planes = bb.getShort
    val bpp = bb.getShort
    val compression = bb.getInt
    require(planes == 1, s"BMP: planes=$planes")
    require(bpp == 24 && compression == 0,
      s"BMP: only 24bpp BI_RGB is supported (bpp=$bpp, compression=$compression)")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    // all size math in Long: width/height near 2^20 overflow Int in
    // stride*height and width*height*3, letting crafted headers slip
    // past the truncation require into negative-index crashes
    require(width > 0 && height > 0 &&
      width.toLong * height <= (1L << 26),
      s"BMP: implausible dimensions ${width}x$rawHeight")
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"BMP: implausible data offset $dataOffset")
    val stride = rowStride(width)
    require(bytes.length >= dataOffset.toLong + stride.toLong * height,
      s"BMP: truncated pixel data (${bytes.length} bytes, " +
        s"need ${dataOffset.toLong + stride.toLong * height})")
    val out = new Array[Int](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        val src = dataOffset + srcRow * stride + x * 3
        val dst = (y * width + x) * 3
        out(dst) = bytes(src + 2) & 0xff     // R (disk order BGR)
        out(dst + 1) = bytes(src + 1) & 0xff // G
        out(dst + 2) = bytes(src) & 0xff     // B
        x += 1
      }
      y += 1
    }
    DecodedImage("image/bmp", width, height, 3, out)
  }

  // ---------- farbfeld ----------

  private val ffMagic = "farbfeld".getBytes("US-ASCII")

  /** Encode RGBA pixels (row-major top-down, 4 ints per pixel,
    * 0..65535 per channel) as farbfeld. */
  def encodeFarbfeld(width: Int, height: Int, rgba16: Array[Int]): Array[Byte] = {
    require(rgba16.length == width * height * 4,
      s"encodeFarbfeld: need ${width * height * 4} channel values, " +
        s"got ${rgba16.length}")
    val bb = ByteBuffer.allocate(16 + rgba16.length * 2) // big-endian default
    bb.put(ffMagic).putInt(width).putInt(height)
    rgba16.foreach(v => bb.putShort((v & 0xffff).toShort))
    bb.array()
  }

  private def decodeFarbfeld(bytes: Array[Byte]): DecodedImage = {
    val bb = ByteBuffer.wrap(bytes)
    bb.position(8)
    val width = bb.getInt
    val height = bb.getInt
    require(width > 0 && height > 0 &&
      width.toLong * height <= (1L << 26),
      s"farbfeld: implausible dimensions ${width}x$height")
    require(bytes.length >= 16 + width.toLong * height * 8,
      s"farbfeld: truncated pixel data (${bytes.length} bytes)")
    val out = new Array[Int](width * height * 4)
    var i = 0
    while (i < out.length) {
      out(i) = (bb.getShort & 0xffff) >>> 8 // keep the high byte
      i += 1
    }
    DecodedImage("image/farbfeld", width, height, 4, out)
  }

  // ---------- dispatch ----------

  /** Container sniff by magic bytes; None = opaque payload. */
  def detect(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M')
      Some("image/bmp")
    else if (bytes.length >= 16 && bytes.startsWith(ffMagic))
      Some("image/farbfeld")
    else None

  /** Real decode when the payload is a known container. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = detect(bytes).map {
    case "image/bmp" => decodeBmp(bytes)
    case _ => decodeFarbfeld(bytes)
  }
}
