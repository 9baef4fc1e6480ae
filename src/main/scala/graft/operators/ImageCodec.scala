package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for four raster containers, so the multimodal
  * featurizer's decode step is REAL (header parse + pixel
  * extraction), not a byte-histogram fake:
  *
  *  - PNG (below), the container web corpora actually carry: critical
  *    chunks + PLTE/tRNS, 8-bit gray/RGB/RGBA/palette, all five
  *    scanline filters, Adam7 interlace; zlib inflate from the JDK.
  *  - GIF 87a/89a (below), the other web container: global/local
  *    color tables, extension sub-block walk, the GIF LZW variant
  *    (variable 3..12-bit codes, clear/EOI, deferred-clear frozen
  *    table), 4-pass interlace; animation refuses by name to the
  *    video path.
  *  - WebP lossless ([[Vp8lCodec]], dispatched from here): the full
  *    VP8L bitstream — prefix codes, LZ77 + color cache, all four
  *    transforms; lossy `VP8 ` and animated WebP refuse by name.
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

  /** 24bpp DIB row stride (4-byte aligned) — shared with VideoCodec's
    * AVI frames, which carry the identical raster layout. */
  private[operators] def bmpRowStride(width: Int): Int =
    ((width * 3) + 3) & ~3
  private def rowStride(width: Int): Int = bmpRowStride(width)

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

  // ---------- PNG (1..16-bit gray/RGB/RGBA/palette, Adam7) ----------
  // The container web corpora actually carry; decodable pure-JVM
  // because the JDK ships the zlib inflate PNG needs
  // (java.util.zip.Inflater) — no new dependency. Critical chunks +
  // PLTE/tRNS (other ancillary chunks skipped after their CRC
  // verifies); Adam7 interlace decodes (7-pass scatter); every legal
  // bit depth decodes (16-bit keeps the high byte like farbfeld,
  // 1/2/4-bit unpack MSB-first with spec gray scaling).

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

  // Adam7 interlace pass structure: (xStart, yStart, xStep, yStep)
  private val adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def pngPasses(interlaced: Boolean): Array[(Int, Int, Int, Int)] =
    if (interlaced) adam7 else Array((0, 0, 1, 1))

  /** filter one (sub)image into PNG scanlines (filter byte + bytes). */
  private def pngFilter(w: Int, h: Int, ch: Int, px: Array[Int],
      filterOf: Int => Int): Array[Byte] = {
    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"encodePng: filter $ft")
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = px(y * stride + i) & 0xff
        val a = if (i >= ch) px(y * stride + i - ch) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= ch)
          px((y - 1) * stride + i - ch) & 0xff else 0
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
    raw
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) zOut.write(buf, 0, d.deflate(buf))
    d.end()
    zOut.toByteArray
  }

  /** build the per-pass filtered scanline stream for an image whose
    * sample at (x, y, c) is `at` — one pass when not interlaced,
    * the seven Adam7 sub-images when interlaced. */
  private def pngRaw(width: Int, height: Int, ch: Int,
      at: (Int, Int, Int) => Int, filterOf: Int => Int,
      interlaced: Boolean): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    pngPasses(interlaced).foreach { case (xs, ys, xStep, yStep) =>
      val pw = if (width > xs) (width - xs + xStep - 1) / xStep else 0
      val ph = if (height > ys) (height - ys + yStep - 1) / yStep else 0
      if (pw > 0 && ph > 0) {
        val sub = new Array[Int](pw * ph * ch)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            var c = 0
            while (c < ch) {
              sub((j * pw + i) * ch + c) =
                at(xs + i * xStep, ys + j * yStep, c)
              c += 1
            }
            i += 1
          }
          j += 1
        }
        body.write(pngFilter(pw, ph, ch, sub, filterOf))
      }
    }
    body.toByteArray
  }

  /** Encode 8-bit pixels (row-major top-down, `channels` ints per
    * pixel, 0..255; channels 1 = gray, 3 = RGB, 4 = RGBA) as a PNG.
    * `filterOf(y)` picks each scanline's filter (0..4) so tests can
    * exercise every unfilter path; `interlaced` writes Adam7. */
  def encodePng(width: Int, height: Int, channels: Int, px: Array[Int],
      filterOf: Int => Int = _ => 0,
      interlaced: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"encodePng: channels=$channels (1/3/4)")
    require(px.length == width * height * channels,
      s"encodePng: need ${width * height * channels} values, got ${px.length}")
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val raw = pngRaw(width, height, channels,
      (x, y, c) => px((y * width + x) * channels + c) & 0xff,
      filterOf, interlaced)
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngMagic)
    val ihdr = ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte)
      .put((if (interlaced) 1 else 0).toByte).array()
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode palette indices as a color-type-3 PNG (8-bit indices,
    * PLTE of ncolors RGB entries, optional tRNS per-entry alpha). */
  def encodePngIndexed(width: Int, height: Int, palette: Array[Int],
      indices: Array[Int], filterOf: Int => Int = _ => 0,
      interlaced: Boolean = false,
      trns: Array[Int] = null): Array[Byte] = {
    val ncolors = palette.length / 3
    require(palette.length % 3 == 0 && ncolors >= 1 && ncolors <= 256,
      s"encodePngIndexed: palette of $ncolors colors")
    require(indices.length == width * height &&
      indices.forall(i => i >= 0 && i < ncolors),
      "encodePngIndexed: bad indices")
    require(trns == null || trns.length <= ncolors,
      "encodePngIndexed: tRNS longer than the palette")
    val raw = pngRaw(width, height, 1,
      (x, y, _) => indices(y * width + x), filterOf, interlaced)
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngMagic)
    val ihdr = ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(8.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte)
      .put((if (interlaced) 1 else 0).toByte).array()
    chunk(out, "IHDR", ihdr)
    chunk(out, "PLTE", palette.map(v => (v & 0xff).toByte))
    if (trns != null)
      chunk(out, "tRNS", trns.map(v => (v & 0xff).toByte))
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** unfilter `ph` scanlines of `rowBytes` bytes each from
    * raw(off...); `bpp` is the filter's left-neighbor distance in
    * BYTES (max(1, channels*depth/8) per the spec). Returns the
    * recovered scanline bytes. */
  private def pngUnfilter(raw: Array[Byte], off: Int, rowBytes: Int,
      ph: Int, bpp: Int): Array[Int] = {
    val out = new Array[Int](ph * rowBytes)
    var y = 0
    while (y < ph) {
      val ft = raw(off + y * (1 + rowBytes)) & 0xff
      require(ft <= 4, s"PNG: unknown scanline filter $ft")
      var i = 0
      while (i < rowBytes) {
        val x = raw(off + y * (1 + rowBytes) + 1 + i) & 0xff
        val a = if (i >= bpp) out(y * rowBytes + i - bpp) else 0
        val b = if (y > 0) out((y - 1) * rowBytes + i) else 0
        val c = if (y > 0 && i >= bpp)
          out((y - 1) * rowBytes + i - bpp) else 0
        out(y * rowBytes + i) = ft match {
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
    out
  }

  private def decodePng(bytes: Array[Byte]): DecodedImage = {
    val bb = ByteBuffer.wrap(bytes)
    bb.position(8)
    var width = 0; var height = 0
    var fch = 0            // channels as filtered on the wire
    var depth = 8          // bits per channel sample on the wire
    var paletted = false
    var interlaced = false
    var plte: Array[Int] = null
    var trns: Array[Int] = null
    var trnsColor: Array[Int] = null // gray/RGB transparent color
    var seenIhdr = false; var seenIend = false; var seenIdat = false
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
          val il = ib.get() & 0xff
          fch = colorType match {
            case 0 => 1
            case 2 => 3
            case 3 => paletted = true; 1
            case 4 => 2 // gray + alpha
            case 6 => 4
            case other => throw new IllegalArgumentException(
              s"PNG: unknown color type $other")
          }
          val okDepth: Set[Int] = colorType match {
            case 0 => Set(1, 2, 4, 8, 16)
            case 3 => Set(1, 2, 4, 8)
            case _ => Set(8, 16)
          }
          require(okDepth(bitDepth),
            s"PNG: bit depth $bitDepth is invalid for color type " +
              s"$colorType (PNG spec 11.2.2)")
          depth = bitDepth
          require(compression == 0 && filterMethod == 0,
            "PNG: nonstandard compression/filter method")
          require(il <= 1, s"PNG: unknown interlace method $il")
          interlaced = il == 1
          require(width > 0 && height > 0 &&
            width.toLong * height <= (1L << 26),
            s"PNG: implausible dimensions ${width}x$height")
          seenIhdr = true
        case "PLTE" =>
          require(seenIhdr && len % 3 == 0 && len <= 256 * 3,
            "PNG: bad PLTE chunk")
          // spec 5.6: PLTE once, before the first IDAT — a hostile
          // reorder (or a second, last-wins palette) must refuse, not
          // decode with whichever palette happened to land
          require(!seenIdat, "PNG: PLTE after IDAT (spec 5.6)")
          require(plte == null, "PNG: multiple PLTE chunks (spec 5.6)")
          plte = data.map(_ & 0xff)
        case "tRNS" =>
          require(seenIhdr, "PNG: tRNS before IHDR")
          require(!seenIdat, "PNG: tRNS after IDAT (spec 5.6)")
          if (paletted) trns = data.map(_ & 0xff)
          else {
            // gray/RGB single-transparent-color: 2-byte big-endian
            // samples (one for gray, three for RGB); forbidden with
            // the alpha color types (spec 11.3.2)
            require(fch == 1 || fch == 3,
              "PNG: tRNS with an alpha color type (spec 11.3.2)")
            require(len == fch * 2, s"PNG: tRNS of $len bytes for " +
              s"$fch-sample color type")
            trnsColor = Array.tabulate(fch)(c =>
              ((data(c * 2) & 0xff) << 8) | (data(c * 2 + 1) & 0xff))
          }
        case "IDAT" =>
          require(seenIhdr, "PNG: IDAT before IHDR")
          seenIdat = true
          idat.write(data)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk: CRC verified above, content skipped
      }
    }
    require(seenIhdr, "PNG: no IHDR")
    require(!paletted || plte != null, "PNG: palette image without PLTE")
    val passes = pngPasses(interlaced).map { case (xs, ys, xStep, yStep) =>
      val pw = if (width > xs) (width - xs + xStep - 1) / xStep else 0
      val ph = if (height > ys) (height - ys + yStep - 1) / yStep else 0
      (xs, ys, xStep, yStep, pw, ph)
    }
    def rowBytesOf(pw: Int): Int = ((pw.toLong * fch * depth + 7) / 8).toInt
    val bpp = math.max(1, fch * depth / 8)
    val rawLen = passes.map { case (_, _, _, _, pw, ph) =>
      if (pw > 0 && ph > 0) ph.toLong * (1 + rowBytesOf(pw)) else 0L
    }.sum
    require(rawLen <= Int.MaxValue, "PNG: implausible scanline volume")
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val r =
          try inf.inflate(raw, got, raw.length - got)
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
      require(got == raw.length && inf.finished(),
        s"PNG: IDAT decompresses to $got bytes, scanlines need ${raw.length}")
    } finally inf.end()
    // unfilter each pass, extract samples (16-bit keeps the high
    // byte, the farbfeld convention; sub-byte depths unpack MSB-first
    // and gray scales to 0..255 per the spec, palette indices do not),
    // scatter into the full-resolution raster
    val wire = new Array[Int](width * height * fch)
    val grayScale = !paletted && depth < 8
    var off = 0
    passes.foreach { case (xs, ys, xStep, yStep, pw, ph) =>
      if (pw > 0 && ph > 0) {
        val rowBytes = rowBytesOf(pw)
        val sub = pngUnfilter(raw, off, rowBytes, ph, bpp)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            var c = 0
            while (c < fch) {
              val v = depth match {
                case 8 => sub(j * rowBytes + i * fch + c)
                case 16 => sub(j * rowBytes + (i * fch + c) * 2)
                case d => // sub-byte: fch == 1 by the depth matrix
                  val bitPos = i * d
                  val raw0 = sub(j * rowBytes + bitPos / 8)
                  val x0 = (raw0 >> (8 - d - bitPos % 8)) & ((1 << d) - 1)
                  if (grayScale) x0 * 255 / ((1 << d) - 1) else x0
              }
              wire(((ys + j * yStep) * width + (xs + i * xStep)) * fch + c) = v
              c += 1
            }
            i += 1
          }
          j += 1
        }
        off += ph * (1 + rowBytes)
      }
    }
    if (!paletted) {
      // gray/RGB transparent color -> synthesize the alpha channel.
      // Exact for depths <= 8 (the 0..255 scaling is injective, so
      // comparing scaled values == comparing raw samples); 16-bit
      // keeps only high bytes by declared scope, where a sample
      // compare would false-positive — transparency is skipped there.
      if (trnsColor == null || depth > 8)
        DecodedImage("image/png", width, height, fch, wire)
      else {
        val scale = if (depth < 8) 255 / ((1 << depth) - 1) else 1
        val key = trnsColor.map(_ * scale)
        val outCh = fch + 1
        val out = new Array[Int](width * height * outCh)
        var p = 0
        while (p < width * height) {
          var transparent = true
          var c = 0
          while (c < fch) {
            val v = wire(p * fch + c)
            out(p * outCh + c) = v
            if (v != key(c)) transparent = false
            c += 1
          }
          out(p * outCh + fch) = if (transparent) 0 else 255
          p += 1
        }
        DecodedImage("image/png", width, height, outCh, out)
      }
    } else {
      // map indices through PLTE; tRNS (if present) adds an alpha
      val ncolors = plte.length / 3
      val outCh = if (trns != null) 4 else 3
      val out = new Array[Int](width * height * outCh)
      var p = 0
      while (p < width * height) {
        val idx = wire(p)
        require(idx < ncolors,
          s"PNG: palette index $idx out of range ($ncolors colors)")
        out(p * outCh) = plte(idx * 3)
        out(p * outCh + 1) = plte(idx * 3 + 1)
        out(p * outCh + 2) = plte(idx * 3 + 2)
        if (outCh == 4)
          out(p * outCh + 3) = if (idx < trns.length) trns(idx) else 255
        p += 1
      }
      DecodedImage("image/png", width, height, outCh, out)
    }
  }


  // ---------- GIF (87a/89a, single image, palette + LZW) ----------
  // The OTHER container web corpora actually carry. Everything the
  // single-image form needs is here and real: logical screen
  // descriptor, global/local color tables, extension-block skipping
  // (sub-block walk), the GIF variant of LZW (variable code width
  // 3..12 bits LSB-first, clear/EOI codes, deferred-clear-tolerant
  // frozen dictionary at 4096), and the 4-pass interlace row order.
  // Animated GIFs (a second image descriptor) refuse BY NAME with
  // guidance — frame streams belong to the video path (m07).

  /** GIF magic sniff — shared with VideoCodec's dispatch. */
  private[operators] def isGif(bytes: Array[Byte]): Boolean =
    gifMagic(bytes)

  private def gifMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** GIF interlace pass structure: (first row, row step) per pass. */
  private val gifPasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  /** LZW-compress palette indices the GIF way: emit an initial clear
    * code, grow the string table to 4095 then reset, bump the code
    * width when the next free code crosses 1<<codeSize (LSB-first bit
    * packing). minCodeSize per the spec is max(2, palette bits). */
  private def lzwCompress(indices: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var table = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    emit(clear)
    var cur = indices(0)
    var i = 1
    while (i < indices.length) {
      val k = indices(i)
      val key = (cur.toLong << 16) | k
      val hit = table.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next < 4096) {
          table.put(key, next); next += 1
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else { // table full: reset, like every mainstream encoder
          emit(clear)
          table = new java.util.HashMap[Long, Integer]()
          next = eoi + 1; codeSize = minCodeSize + 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    // the width check runs after EVERY emitted code (compress's
    // output() ordering) — including the final data code, or the EOI
    // is written one bit narrower than the decoder reads it
    if (next >= (1 << codeSize) && codeSize < 12) codeSize += 1
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Encode palette indices (row-major top-down) as a single-image
    * GIF89a. `palette` is ncolors·3 RGB ints; ncolors must be a power
    * of two in 2..256. `interlaced` writes the 4-pass row order and
    * sets the flag; `plantExtension` prepends a comment extension +
    * graphic control extension (multi-sub-block skip hazard);
    * `localTable` moves the palette from the global to the local
    * color table (GCT flag off). */
  def encodeGif(width: Int, height: Int, palette: Array[Int],
      indices: Array[Int], interlaced: Boolean = false,
      plantExtension: Boolean = false,
      localTable: Boolean = false): Array[Byte] = {
    val ncolors = palette.length / 3
    require(ncolors >= 2 && ncolors <= 256 &&
      Integer.bitCount(ncolors) == 1 && palette.length % 3 == 0,
      s"encodeGif: palette must be a power-of-two 2..256 colors, got $ncolors")
    require(indices.length == width * height,
      s"encodeGif: need ${width * height} indices, got ${indices.length}")
    require(indices.forall(i => i >= 0 && i < ncolors),
      "encodeGif: index out of palette range")
    require(!(localTable && interlaced),
      "encodeGif: pick localTable or interlaced per image (test shape)")
    val sizeBits = 31 - Integer.numberOfLeadingZeros(ncolors) // log2
    val minCodeSize = math.max(2, sizeBits)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    // packed: GCT flag | color resolution 7 | sort 0 | GCT size
    out.write((if (localTable) 0x70 else 0xf0) | (sizeBits - 1))
    out.write(0); out.write(0) // background index, aspect ratio
    if (!localTable) palette.foreach(v => out.write(v & 0xff))
    if (plantExtension) {
      out.write(0x21); out.write(0xfe) // comment extension
      val c1 = "planted comment ".getBytes("US-ASCII")
      out.write(c1.length); out.write(c1)
      val c2 = "second sub-block".getBytes("US-ASCII")
      out.write(c2.length); out.write(c2)
      out.write(0) // terminator
      out.write(0x21); out.write(0xf9) // graphic control extension
      out.write(4); out.write(0); u16(0); out.write(0); out.write(0)
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(if (localTable) 0x80 | (sizeBits - 1)
      else if (interlaced) 0x40 else 0x00
    ) // note: encoder never combines LCT+interlace; decoder handles both
    if (localTable) palette.foreach(v => out.write(v & 0xff))
    val rowOrder: Array[Int] =
      if (!interlaced) Array.range(0, height)
      else gifPasses.flatMap { case (first, step) =>
        Iterator.iterate(first)(_ + step).takeWhile(_ < height)
      }
    val stream = new Array[Int](width * height)
    var p = 0
    rowOrder.foreach { y =>
      var x = 0
      while (x < width) { stream(p) = indices(y * width + x); p += 1; x += 1 }
    }
    out.write(minCodeSize)
    val lzw = lzwCompress(stream, minCodeSize)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW decode of `data` into exactly `expect` palette
    * indices. Refuses out-of-sync codes loudly; tolerates a frozen
    * dictionary at 4096 (the "deferred clear" GIFs in the wild). */
  private def lzwDecompress(data: Array[Byte], minCodeSize: Int,
      expect: Int): Array[Int] = {
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"GIF: implausible LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](expect)
    var n = 0
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    val stack = new Array[Int](4096)
    var done = false
    def firstOf(code0: Int): Int = {
      var c = code0
      while (c >= clear) c = prefix(c)
      c
    }
    while (!done) {
      while (bitCnt < codeSize && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      require(bitCnt >= codeSize, "GIF: LZW stream ended before EOI")
      val code = (bitBuf & ((1 << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      if (code == clear) {
        codeSize = minCodeSize + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"GIF: first LZW code $code is not a literal")
        require(n < expect, "GIF: LZW output exceeds image size")
        out(n) = code; n += 1; prev = code
      } else {
        require(code < next || (code == next && next < 4096),
          s"GIF: LZW code $code out of sync (next=$next)")
        // expand code (or prev+first(prev) for the just-defined code)
        var sp = 0
        var c = if (code == next) prev else code
        val tailFirst = if (code == next) firstOf(prev) else -1
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        stack(sp) = c; sp += 1
        val emitted = sp + (if (code == next) 1 else 0)
        require(n + emitted <= expect, "GIF: LZW output exceeds image size")
        while (sp > 0) { sp -= 1; out(n) = stack(sp); n += 1 }
        if (code == next) { out(n) = tailFirst; n += 1 }
        if (next < 4096) { // frozen (deferred-clear) table past 4095
          prefix(next) = prev
          suffix(next) = if (code == next) tailFirst else firstOf(code)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(n == expect,
      s"GIF: LZW decoded $n indices, image needs $expect")
    out
  }

  private def decodeGif(bytes: Array[Byte]): DecodedImage = {
    var pos = 6
    def u8(): Int = {
      require(pos < bytes.length, "GIF: truncated stream")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    val screenW = u16(); val screenH = u16()
    val packed = u8()
    u8(); u8() // background index, aspect ratio
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val ncolors = 2 << (packed & 0x07)
        require(pos + ncolors * 3 <= bytes.length,
          "GIF: truncated global color table")
        val t = Array.tabulate(ncolors * 3)(i => bytes(pos + i) & 0xff)
        pos += ncolors * 3; t
      } else null
    var img: DecodedImage = null
    var sawTrailer = false
    while (!sawTrailer) {
      u8() match {
        case 0x3b => sawTrailer = true
        case 0x21 => // extension: label + sub-blocks, content skipped
          u8()
          var len = u8()
          while (len != 0) {
            require(pos + len <= bytes.length, "GIF: truncated extension")
            pos += len; len = u8()
          }
        case 0x2c =>
          require(img == null, "GIF: animated GIF (multiple image " +
            "descriptors) is not supported here — sample frames via " +
            "the video path (m07) or re-encode the first frame")
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          val ipacked = u8()
          require(left == 0 && top == 0 && w == screenW && h == screenH,
            s"GIF: sub-rectangle frame placement (${w}x$h at " +
              s"$left,$top in ${screenW}x$screenH) is not supported " +
              "here — re-encode as a full-frame image")
          require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
            s"GIF: implausible dimensions ${w}x$h")
          val interlaced = (ipacked & 0x40) != 0
          val lct: Array[Int] =
            if ((ipacked & 0x80) != 0) {
              val ncolors = 2 << (ipacked & 0x07)
              require(pos + ncolors * 3 <= bytes.length,
                "GIF: truncated local color table")
              val t = Array.tabulate(ncolors * 3)(i => bytes(pos + i) & 0xff)
              pos += ncolors * 3; t
            } else null
          val palette = if (lct != null) lct else gct
          require(palette != null,
            "GIF: image has neither a local nor a global color table")
          val minCodeSize = u8()
          val data = new java.io.ByteArrayOutputStream()
          var len = u8()
          while (len != 0) {
            require(pos + len <= bytes.length, "GIF: truncated image data")
            data.write(bytes, pos, len); pos += len; len = u8()
          }
          val stream = lzwDecompress(data.toByteArray, minCodeSize, w * h)
          val ncolors = palette.length / 3
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, h)
            else gifPasses.flatMap { case (first, step) =>
              Iterator.iterate(first)(_ + step).takeWhile(_ < h)
            }
          val out = new Array[Int](w * h * 3)
          var p = 0
          rowOrder.foreach { y =>
            var x = 0
            while (x < w) {
              val idx = stream(p); p += 1
              require(idx < ncolors,
                s"GIF: palette index $idx out of range ($ncolors colors)")
              val dst = (y * w + x) * 3
              out(dst) = palette(idx * 3)
              out(dst + 1) = palette(idx * 3 + 1)
              out(dst + 2) = palette(idx * 3 + 2)
              x += 1
            }
          }
          img = DecodedImage("image/gif", w, h, 3, out)
        case other =>
          throw new IllegalArgumentException(
            f"GIF: unknown block introducer 0x$other%02x")
      }
    }
    require(img != null, "GIF: no image descriptor before trailer")
    img
  }

  // ---------- animated GIF (the video path's GIF rung) ----------
  // Multimodal.featurize treats a GIF as a STILL (decodeGif above
  // refuses a second image descriptor, pointing here); the video path
  // (VideoCodec.decode → Multimodal.sampleVideoFrames) composites the
  // full GIF89a animation model: per-frame graphic control extensions
  // (delay, transparency index, disposal none/keep/restore-background/
  // restore-previous), sub-rectangle placement onto the logical
  // screen, per-frame local color tables and interlace. Each emitted
  // frame is the canvas snapshot after painting — what a browser
  // shows, which is what a frame-sampling training pipeline wants.

  /** One frame for [[encodeGifAnim]]: `indices` are the sub-rect's
    * palette indices row-major; `disposal` 0..3 per GIF89a;
    * `transparentIdx` < 0 disables transparency. */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
    indices: Array[Int], delayCs: Int, disposal: Int,
    transparentIdx: Int = -1)

  /** Encode an animated GIF89a: shared global palette, one GCE +
    * image descriptor per frame, optional NETSCAPE loop extension. */
  def encodeGifAnim(width: Int, height: Int, palette: Array[Int],
      frames: Seq[GifFrame], loop: Boolean = true): Array[Byte] = {
    val ncolors = palette.length / 3
    require(ncolors >= 2 && ncolors <= 256 &&
      Integer.bitCount(ncolors) == 1 && palette.length % 3 == 0,
      s"encodeGifAnim: palette must be a power-of-two 2..256 colors")
    require(frames.nonEmpty, "encodeGifAnim: no frames")
    val sizeBits = 31 - Integer.numberOfLeadingZeros(ncolors)
    val minCodeSize = math.max(2, sizeBits)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xf0 | (sizeBits - 1)); out.write(0); out.write(0)
    palette.foreach(v => out.write(v & 0xff))
    if (loop) { // NETSCAPE2.0 application extension (loop forever)
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); u16(0); out.write(0)
    }
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.width > 0 && f.height > 0 &&
        f.left + f.width <= width && f.top + f.height <= height,
        s"encodeGifAnim: frame rect ${f.width}x${f.height} at " +
          s"${f.left},${f.top} outside ${width}x$height")
      require(f.indices.length == f.width * f.height &&
        f.indices.forall(i => i >= 0 && i < ncolors),
        "encodeGifAnim: bad frame indices")
      require(f.disposal >= 0 && f.disposal <= 3,
        s"encodeGifAnim: disposal ${f.disposal}")
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write((f.disposal << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      u16(f.delayCs)
      out.write(math.max(f.transparentIdx, 0)); out.write(0)
      out.write(0x2c)
      u16(f.left); u16(f.top); u16(f.width); u16(f.height)
      out.write(0) // no LCT, not interlaced
      out.write(minCodeSize)
      val lzw = lzwCompress(f.indices, minCodeSize)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n); off += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode a (possibly animated) GIF into composited canvas
    * snapshots — VideoCodec dispatches here so animated GIFs flow
    * through the frame-sampling video path. Honors GCE transparency
    * and all four disposal methods; the canvas starts as the
    * background color (GCT[bg], the spec reading). */
  def decodeGifFrames(bytes: Array[Byte]): VideoCodec.DecodedVideo = {
    require(gifMagic(bytes), "GIF: not a GIF payload")
    var pos = 6
    def u8(): Int = {
      require(pos < bytes.length, "GIF: truncated stream")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    def colorTable(sizeField: Int): Array[Int] = {
      val ncolors = 2 << sizeField
      require(pos + ncolors * 3 <= bytes.length,
        "GIF: truncated color table")
      val t = Array.tabulate(ncolors * 3)(i => bytes(pos + i) & 0xff)
      pos += ncolors * 3; t
    }
    val screenW = u16(); val screenH = u16()
    val packed = u8()
    val bgIndex = u8(); u8()
    require(screenW > 0 && screenH > 0 &&
      screenW.toLong * screenH <= (1L << 26),
      s"GIF: implausible dimensions ${screenW}x$screenH")
    val gct = if ((packed & 0x80) != 0) colorTable(packed & 0x07) else null
    val canvas = new Array[Int](screenW * screenH * 3)
    val bg: Array[Int] =
      if (gct != null && bgIndex * 3 + 2 < gct.length)
        Array(gct(bgIndex * 3), gct(bgIndex * 3 + 1), gct(bgIndex * 3 + 2))
      else Array(0, 0, 0)
    var i = 0
    while (i < canvas.length) { canvas(i) = bg(i % 3); i += 1 }
    // pending graphic-control state (applies to the NEXT image)
    var disposal = 0; var transparent = -1; var delayCs = 0
    var usPerFrame = -1
    val frames = scala.collection.mutable.ArrayBuffer[VideoCodec.DecodedFrame]()
    var sawTrailer = false
    while (!sawTrailer) {
      u8() match {
        case 0x3b => sawTrailer = true
        case 0x21 =>
          val label = u8()
          if (label == 0xf9) { // graphic control extension
            val len = u8()
            require(len == 4, s"GIF: GCE block size $len")
            val p = u8()
            disposal = (p >> 2) & 0x07
            require(disposal <= 3,
              s"GIF: reserved disposal method $disposal")
            delayCs = u16()
            val t = u8()
            transparent = if ((p & 1) != 0) t else -1
            require(u8() == 0, "GIF: GCE missing terminator")
          } else {
            var len = u8()
            while (len != 0) {
              require(pos + len <= bytes.length, "GIF: truncated extension")
              pos += len; len = u8()
            }
          }
        case 0x2c =>
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          val ipacked = u8()
          require(w > 0 && h > 0 && left + w <= screenW && top + h <= screenH,
            s"GIF: frame rect ${w}x$h at $left,$top outside " +
              s"${screenW}x$screenH")
          val interlaced = (ipacked & 0x40) != 0
          val lct =
            if ((ipacked & 0x80) != 0) colorTable(ipacked & 0x07) else null
          val palette = if (lct != null) lct else gct
          require(palette != null,
            "GIF: image has neither a local nor a global color table")
          val minCodeSize = u8()
          val data = new java.io.ByteArrayOutputStream()
          var len = u8()
          while (len != 0) {
            require(pos + len <= bytes.length, "GIF: truncated image data")
            data.write(bytes, pos, len); pos += len; len = u8()
          }
          val stream = lzwDecompress(data.toByteArray, minCodeSize, w * h)
          val ncolors = palette.length / 3
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, h)
            else gifPasses.flatMap { case (first, step) =>
              Iterator.iterate(first)(_ + step).takeWhile(_ < h)
            }
          val before =
            if (disposal == 3) canvas.clone() else null
          var p = 0
          rowOrder.foreach { y =>
            var x = 0
            while (x < w) {
              val idx = stream(p); p += 1
              if (idx != transparent) {
                require(idx < ncolors,
                  s"GIF: palette index $idx out of range ($ncolors colors)")
                val dst = ((top + y) * screenW + (left + x)) * 3
                canvas(dst) = palette(idx * 3)
                canvas(dst + 1) = palette(idx * 3 + 1)
                canvas(dst + 2) = palette(idx * 3 + 2)
              }
              x += 1
            }
          }
          frames += VideoCodec.DecodedFrame(frames.length, canvas.clone())
          if (usPerFrame < 0) usPerFrame = delayCs * 10000
          disposal match {
            case 2 => // restore the painted rect to the background
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val dst = ((top + y) * screenW + (left + x)) * 3
                  canvas(dst) = bg(0); canvas(dst + 1) = bg(1)
                  canvas(dst + 2) = bg(2)
                  x += 1
                }
                y += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => () // 0/1: leave the canvas as painted
          }
          disposal = 0; transparent = -1; delayCs = 0
        case other =>
          throw new IllegalArgumentException(
            f"GIF: unknown block introducer 0x$other%02x")
      }
    }
    require(frames.nonEmpty, "GIF: no image descriptor before trailer")
    VideoCodec.DecodedVideo("image/gif", screenW, screenH,
      math.max(usPerFrame, 0), frames.toArray)
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
    else if (gifMagic(bytes)) Some("image/gif")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff)
      Some("image/jpeg")
    else if (Vp8lCodec.isWebp(bytes)) Some("image/webp")
    else None

  /** Real decode when the payload is a known container. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = detect(bytes).map {
    case "image/bmp" => decodeBmp(bytes)
    case "image/png" => decodePng(bytes)
    case "image/gif" => decodeGif(bytes)
    case "image/jpeg" => JpegCodec.decode(bytes)
    case "image/webp" => Vp8lCodec.decodeWebp(bytes)
    case _ => decodeFarbfeld(bytes)
  }
}
