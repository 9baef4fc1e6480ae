package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for three raster containers, so the multimodal
  * featurizer's decode step is REAL (header parse + pixel
  * extraction), not a byte-histogram fake:
  *
  *  - PNG (below), the container web corpora actually carry: critical
  *    chunks, 8-bit gray/RGB/RGBA, all five scanline filters,
  *    non-interlaced; zlib inflate from the JDK.
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

  // ---------- PNG (8-bit gray / RGB / RGBA, non-interlaced) ----------
  // The container web corpora actually carry; decodable pure-JVM
  // because the JDK ships the zlib inflate PNG needs
  // (java.util.zip.Inflater) — no new dependency. Critical chunks
  // only (IHDR/IDAT/IEND, ancillary chunks skipped after their CRC
  // verifies); 16-bit, palette and Adam7 interlace refuse with
  // guidance.

  private val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0d, 0x0a, 0x1a, 0x0a)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    val tb = typ.getBytes("US-ASCII")
    out.write(len); out.write(tb); out.write(data)
    out.write(ByteBuffer.allocate(4).putInt(crc32(tb, data)).array())
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit pixels (row-major top-down, `channels` ints per
    * pixel, 0..255; channels 1 = gray, 3 = RGB, 4 = RGBA) as a
    * non-interlaced PNG. `filterOf(y)` picks each scanline's filter
    * (0..4) so tests can exercise every unfilter path. */
  def encodePng(width: Int, height: Int, channels: Int, px: Array[Int],
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"encodePng: channels=$channels (1/3/4)")
    require(px.length == width * height * channels,
      s"encodePng: need ${width * height * channels} values, got ${px.length}")
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"encodePng: filter $ft")
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = px(y * stride + i) & 0xff
        val a = if (i >= channels) px(y * stride + i - channels) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= channels)
          px((y - 1) * stride + i - channels) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) zOut.write(buf, 0, d.deflate(buf))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngMagic)
    val ihdr = ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zOut.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def decodePng(bytes: Array[Byte]): DecodedImage = {
    val bb = ByteBuffer.wrap(bytes)
    bb.position(8)
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(bb.remaining >= 12, "PNG: truncated chunk stream")
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining - 8,
        s"PNG: implausible chunk length $len")
      val tb = new Array[Byte](4); bb.get(tb)
      val typ = new String(tb, "US-ASCII")
      val data = new Array[Byte](len); bb.get(data)
      val crc = bb.getInt
      require(crc == crc32(tb, data),
        s"PNG: CRC mismatch in $typ chunk — corrupted data")
      typ match {
        case "IHDR" =>
          require(!seenIhdr && len == 13, "PNG: bad IHDR")
          val ib = ByteBuffer.wrap(data)
          width = ib.getInt; height = ib.getInt
          val bitDepth = ib.get() & 0xff
          val colorType = ib.get() & 0xff
          val compression = ib.get() & 0xff
          val filterMethod = ib.get() & 0xff
          val interlace = ib.get() & 0xff
          require(bitDepth == 8, s"PNG: only 8-bit channels are " +
            s"supported here (bit depth $bitDepth) — re-encode to 8-bit")
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case 6 => 4
            case 3 => throw new IllegalArgumentException(
              "PNG: palette (color type 3) is not supported here — " +
                "re-encode to truecolor")
            case 4 => 2 // gray + alpha
            case other => throw new IllegalArgumentException(
              s"PNG: unknown color type $other")
          }
          require(compression == 0 && filterMethod == 0,
            "PNG: nonstandard compression/filter method")
          require(interlace == 0, "PNG: Adam7 interlace is not " +
            "supported here — re-encode non-interlaced")
          require(width > 0 && height > 0 &&
            width.toLong * height <= (1L << 26),
            s"PNG: implausible dimensions ${width}x$height")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "PNG: IDAT before IHDR")
          idat.write(data)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk: CRC verified above, content skipped
      }
    }
    require(seenIhdr, "PNG: no IHDR")
    val stride = width * channels
    val rawLen = height * (1 + stride)
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < rawLen && !inf.finished()) {
        val r =
          try inf.inflate(raw, got, rawLen - got)
          catch { case e: java.util.zip.DataFormatException =>
            // must be an IllegalArgumentException: the featurizer's
            // degrade-to-opaque net catches that type — a hostile PNG
            // with valid CRCs over non-zlib IDAT bytes must not kill
            // the job (r17 review)
            throw new IllegalArgumentException(
              s"PNG: corrupt IDAT stream (${e.getMessage})")
          }
        require(r > 0 || inf.finished(),
          "PNG: truncated or non-zlib IDAT stream")
        got += r
      }
      require(got == rawLen && inf.finished(),
        s"PNG: IDAT decompresses to $got bytes, scanlines need $rawLen")
    } finally inf.end()
    // unfilter (the five standard per-scanline filters), in place
    val out = new Array[Int](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"PNG: unknown scanline filter $ft")
      var i = 0
      while (i < stride) {
        val x = raw(y * (1 + stride) + 1 + i) & 0xff
        val a = if (i >= channels) out(y * stride + i - channels) else 0
        val b = if (y > 0) out((y - 1) * stride + i) else 0
        val c = if (y > 0 && i >= channels)
          out((y - 1) * stride + i - channels) else 0
        out(y * stride + i) = ft match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + b) & 0xff
          case 3 => (x + (a + b) / 2) & 0xff
          case 4 => (x + paeth(a, b, c)) & 0xff
        }
        i += 1
      }
      y += 1
    }
    DecodedImage("image/png", width, height, channels, out)
  }

  // ---------- dispatch ----------

  /** Container sniff by magic bytes; None = opaque payload. */
  def detect(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M')
      Some("image/bmp")
    else if (bytes.length >= 16 && bytes.startsWith(ffMagic))
      Some("image/farbfeld")
    else if (bytes.length >= 8 && bytes.startsWith(pngMagic))
      Some("image/png")
    else None

  /** Real decode when the payload is a known container. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = detect(bytes).map {
    case "image/bmp" => decodeBmp(bytes)
    case "image/png" => decodePng(bytes)
    case _ => decodeFarbfeld(bytes)
  }
}
