package graft.operators

/** Pure-JVM JPEG codec (ITU-T T.81 / ISO 10918-1, the container that
  * dominates real web image corpora), so the multimodal featurizer's
  * JPEG decode is REAL: marker segment walk, DQT/DHT table parsing,
  * Huffman entropy decode with byte unstuffing and restart markers,
  * DC prediction, dequantization, zigzag, a full 2-D IDCT, JFIF
  * YCbCr→RGB, Exif orientation, and edge-block cropping.
  *
  * Scope (declared, refusing BY NAME outside it — the PNG/GIF
  * discipline): baseline sequential DCT (SOF0/SOF1) AND progressive
  * DCT (SOF2: spectral-selection + successive-approximation scans,
  * EOB runs, DC/AC refinement per T.81 G.1.2), 8-bit precision,
  * grayscale or three-component color at 4:4:4, 4:2:2, or 4:2:0
  * (MCU-interleaved scan per T.81 A.2.3, nearest-neighbor chroma
  * upsampling). That covers what the web actually serves — baseline
  * 4:2:0 and progressive are the two dominant wire forms.
  * Lossless/arithmetic/hierarchical SOFs, sampling factors past 2,
  * and 12-bit precision refuse with guidance: the honest pure-JVM
  * cut, with refusals that tell a user exactly what to re-encode.
  *
  * The encoder exists for the planted-corpus tests (m10): it writes
  * real DQT/DHT/SOF0/SOS segments with a valid canonical Huffman
  * table (simple fixed-length code assignment — legal per the spec's
  * canonical construction, suboptimal on purpose) and a real forward
  * DCT, so any standard decoder reads its output; MultimodalSpec
  * cross-validates against the JDK's javax.imageio JPEG codec in
  * both directions (±1 per sample, the IEEE 1180 IDCT tolerance).
  */
object JpegCodec {

  // standard zigzag scan: natural (row-major) index of each zigzag
  // position — validated transitively by the ImageIO cross-decode
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // quant tables the ENCODER writes: DC step 8 makes flat blocks
  // round-trip bit-exact (F(0,0) of a flat block is 8·(v-128), an
  // exact multiple); AC step 16 is arbitrary (flat blocks have 0 AC)
  private val encQuant: Array[Int] =
    Array.tabulate(64)(i => if (i == 0) 8 else 16)

  private def cosTable: Array[Double] = {
    val t = new Array[Double](8 * 8) // t(x*8+u) = cos((2x+1)uπ/16)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val cos = cosTable
  private val invSqrt2 = 1.0 / math.sqrt(2.0)

  /** Forward 2-D DCT-II of one level-shifted 8x8 block (row-major
    * pixel values 0..255), T.81 normalization. */
  private def fdct(px: Array[Int]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += (px(y * 8 + x) - 128) * cos(x * 8 + u) * cos(y * 8 + v)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) invSqrt2 else 1.0
        val cv = if (v == 0) invSqrt2 else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 2-D DCT of one dequantized coefficient block; returns
    * clamped 0..255 samples. Separable (row pass then column pass) —
    * 2·8 one-dimensional transforms instead of the naive 64×64 sum,
    * 4x fewer multiply-adds in the per-partition decode hot path.
    * Flat (DC-only) blocks stay bit-exact: the row pass leaves only
    * v = 0 nonzero and the column pass reduces to c/8 exactly. */
  private def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64) // tmp(v*8+x): rows transformed
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val c = coef(v * 8 + u)
          if (c != 0)
            s += (if (u == 0) invSqrt2 else 1.0) * c * cos(x * 8 + u)
          u += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += (if (vv == 0) invSqrt2 else 1.0) * tmp(vv * 8 + x) *
            cos(y * 8 + vv)
          vv += 1
        }
        val p = math.round(0.25 * s).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------- the encoder's fixed canonical Huffman tables ----------
  // DC: all 12 size categories at code length 4 (12·2^-4 ≤ 1, valid
  // canonical set, all-ones code unused). AC: 128 symbols at length 9
  // + 128 at length 10. Legal per Annex C's canonical construction;
  // any conformant decoder (incl. javax.imageio) reads them.
  private val encDcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val encDcVals: Array[Int] = Array.tabulate(12)(identity)
  private val encAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0)
  private val encAcVals: Array[Int] = Array.tabulate(256)(identity)

  /** canonical code assignment (T.81 Figure C.2): codes per symbol in
    * huffval order. Returns (code, length) pairs indexed by symbol. */
  private def canonical(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val bySymbol = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        bySymbol(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    bySymbol
  }

  private class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1-bits per spec
      buf = (buf << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(buf)
      if (buf == 0xff) out.write(0x00)
      buf = 0; n = 0
    }
  }

  private def sizeCat(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a != 0) { s += 1; a >>= 1 }
    s
  }

  /** Encode 8-bit samples as a baseline JPEG. `channels` 1 = gray,
    * 3 = RGB (converted to YCbCr; `subsample` writes 4:2:0 with
    * box-averaged chroma, else 4:4:4). `restartEvery` > 0 writes a
    * DRI segment and RSTn markers every that many MCUs. */
  def encodeJpeg(width: Int, height: Int, channels: Int, px: Array[Int],
      restartEvery: Int = 0, subsample: Boolean = false,
      adobeTransform: Int = -1): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"encodeJpeg: channels=$channels (1/3/4)")
    require(px.length == width * height * channels,
      s"encodeJpeg: need ${width * height * channels} values")
    require(!subsample || channels == 3, "encodeJpeg: 4:2:0 needs color")
    require(channels != 4 || adobeTransform == 0 || adobeTransform == 2,
      "encodeJpeg: 4-channel (inverted CMYK) needs adobeTransform 0 or 2")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    if (adobeTransform >= 0) { // APP14 "Adobe" color-transform note
      marker(0xee); u16(14)
      "Adobe".getBytes("US-ASCII").foreach(b => u8(b))
      u16(0x0065); u16(0); u16(0) // DCTEncodeVersion, flags0, flags1
      u8(adobeTransform)
    }
    marker(0xdb); u16(2 + 1 + 64) // DQT, table 0
    u8(0x00); zigzag.foreach(z => u8(encQuant(z)))
    if (restartEvery > 0) { marker(0xdd); u16(4); u16(restartEvery) }
    marker(0xc0) // SOF0
    u16(8 + 3 * channels); u8(8); u16(height); u16(width); u8(channels)
    for (c <- 1 to channels) { // sampling: Y 2x2 when subsampling
      u8(c); u8(if (subsample && c == 1) 0x22 else 0x11); u8(0)
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((cls << 4) | id); bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, encDcBits, encDcVals); dht(1, 0, encAcBits, encAcVals)
    marker(0xda) // SOS
    u16(6 + 2 * channels); u8(channels)
    for (c <- 1 to channels) { u8(c); u8(0x00) } // DC 0 / AC 0
    u8(0); u8(63); u8(0)
    // component planes (level 0..255): gray as-is; RGB -> YCbCr
    // (JFIF); 4-channel takes Adobe-inverted CMYK samples — direct
    // planes for transform 0, stored-CMY through the YCbCr matrix
    // (+ K as-is) for transform 2 (YCCK)
    val planes: Array[Array[Int]] =
      if (channels == 1) Array(px)
      else if (channels == 4) {
        val c = Array.tabulate(width * height)(i => px(i * 4))
        val m = Array.tabulate(width * height)(i => px(i * 4 + 1))
        val yv = Array.tabulate(width * height)(i => px(i * 4 + 2))
        val k = Array.tabulate(width * height)(i => px(i * 4 + 3))
        if (adobeTransform == 0) Array(c, m, yv, k)
        else {
          val y = new Array[Int](width * height)
          val cb = new Array[Int](width * height)
          val cr = new Array[Int](width * height)
          var i = 0
          while (i < width * height) {
            y(i) = math.max(0, math.min(255, math.round(
              0.299 * c(i) + 0.587 * m(i) + 0.114 * yv(i)).toInt))
            cb(i) = math.max(0, math.min(255, math.round(
              -0.168736 * c(i) - 0.331264 * m(i) + 0.5 * yv(i)).toInt + 128))
            cr(i) = math.max(0, math.min(255, math.round(
              0.5 * c(i) - 0.418688 * m(i) - 0.081312 * yv(i)).toInt + 128))
            i += 1
          }
          Array(y, cb, cr, k)
        }
      } else {
        val y = new Array[Int](width * height)
        val cb = new Array[Int](width * height)
        val cr = new Array[Int](width * height)
        var i = 0
        while (i < width * height) {
          val r = px(i * 3); val g = px(i * 3 + 1); val b = px(i * 3 + 2)
          y(i) = math.max(0, math.min(255,
            math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt))
          cb(i) = math.max(0, math.min(255,
            math.round(-0.168736 * r - 0.331264 * g + 0.5 * b).toInt + 128))
          cr(i) = math.max(0, math.min(255,
            math.round(0.5 * r - 0.418688 * g - 0.081312 * b).toInt + 128))
          i += 1
        }
        Array(y, cb, cr)
      }
    val dcCode = canonical(encDcBits, encDcVals)
    val acCode = canonical(encAcBits, encAcVals)
    val bw = new BitWriter(out)
    // per-component plane dims + downsampled chroma when subsampling
    val planeW = new Array[Int](channels); val planeH = new Array[Int](channels)
    val compPlanes = new Array[Array[Int]](channels)
    var comp0 = 0
    while (comp0 < channels) {
      if (subsample && comp0 > 0) {
        val cw = (width + 1) / 2; val ch = (height + 1) / 2
        val src = planes(comp0)
        compPlanes(comp0) = Array.tabulate(cw * ch) { i =>
          val cx = i % cw; val cy = i / cw
          var s = 0
          var dy = 0
          while (dy < 2) { // box average over clamped 2x2
            var dx = 0
            while (dx < 2) {
              val x = math.min(cx * 2 + dx, width - 1)
              val y = math.min(cy * 2 + dy, height - 1)
              s += src(y * width + x)
              dx += 1
            }
            dy += 1
          }
          (s + 2) / 4
        }
        planeW(comp0) = cw; planeH(comp0) = ch
      } else {
        compPlanes(comp0) = planes(comp0)
        planeW(comp0) = width; planeH(comp0) = height
      }
      comp0 += 1
    }
    val sampH = Array.tabulate(channels)(c =>
      if (subsample && c == 0) 2 else 1)
    val maxH = sampH.max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxH - 1) / (8 * maxH) // v == h here
    val pred = new Array[Int](channels)
    def encodeBlock(comp: Int, bx: Int, by: Int): Unit = {
      val plane = compPlanes(comp)
      val pw = planeW(comp); val ph = planeH(comp)
      // edge blocks replicate the last row/column (standard pad)
      val block = Array.tabulate(64) { i =>
        val x = math.min(bx * 8 + i % 8, pw - 1)
        val y = math.min(by * 8 + i / 8, ph - 1)
        plane(y * pw + x)
      }
      val f = fdct(block)
      val q = Array.tabulate(64)(z =>
        math.round(f(zigzag(z)) / encQuant(zigzag(z))).toInt)
      val diff = q(0) - pred(comp); pred(comp) = q(0)
      val s = sizeCat(diff)
      val (c0, l0) = dcCode(s)
      bw.put(c0, l0)
      if (s > 0)
        bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      var z = 1
      while (z < 64) {
        var run = 0
        while (z < 64 && q(z) == 0) { run += 1; z += 1 }
        if (z == 64) {
          val (ce, le) = acCode(0x00); bw.put(ce, le) // EOB
        } else {
          while (run > 15) {
            val (cz, lz) = acCode(0xf0); bw.put(cz, lz); run -= 16
          }
          val sz = sizeCat(q(z))
          val (ca, la) = acCode((run << 4) | sz)
          bw.put(ca, la)
          bw.put(if (q(z) >= 0) q(z) else q(z) + (1 << sz) - 1, sz)
          z += 1
        }
      }
    }
    var mcu = 0; var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bw.flush()
          marker(0xd0 + (rst & 7)); rst += 1
          java.util.Arrays.fill(pred, 0)
        }
        var comp = 0
        while (comp < channels) {
          val n = sampH(comp) * sampH(comp)
          var sub = 0
          while (sub < n) {
            encodeBlock(comp, mx * sampH(comp) + sub % sampH(comp),
              my * sampH(comp) + sub / sampH(comp))
            sub += 1
          }
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------- decoder ----------

  private class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0; private var n = 0
    /** true if the next unread bytes are an RSTn marker. */
    def atRestart: Boolean =
      pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) >= 0xd0 && (bytes(pos + 1) & 0xff) <= 0xd7
    def skipRestart(): Unit = { pos += 2; buf = 0; n = 0 }
    def bit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "JPEG: entropy stream truncated")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "JPEG: entropy stream truncated")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException(
            f"JPEG: unexpected marker 0xff$m%02x inside entropy data")
        }
        buf = b; n = 8
      }
      n -= 1
      (buf >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode per length (T.81 Annex F decode procedure)
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = code - 1
        if (bits(len - 1) == 0) maxCode(len) = -1
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (maxCode(len) < 0 || code > maxCode(len)) {
        require(len < 16, "JPEG: corrupt Huffman code")
        code = (code << 1) | br.bit(); len += 1
      }
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Parse an Exif APP1 payload (TIFF IFD0) for the orientation tag
    * (0x0112). Returns None when absent or malformed — orientation is
    * advisory metadata; a bad Exif block must never kill a decode. */
  private[operators] def exifOrientation(bytes: Array[Byte], off: Int,
      len: Int): Option[Int] = {
    if (len < 14 || bytes(off) != 'E' || bytes(off + 1) != 'x' ||
        bytes(off + 2) != 'i' || bytes(off + 3) != 'f' ||
        bytes(off + 4) != 0 || bytes(off + 5) != 0) return None
    val t = off + 6 // TIFF header start
    val little = bytes(t) == 'I' && bytes(t + 1) == 'I'
    val big = bytes(t) == 'M' && bytes(t + 1) == 'M'
    if (!little && !big) return None
    def u16(p: Int): Int =
      if (p + 1 >= off + len) -1
      else if (little) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (p + 3 >= off + len) -1L
      else if (little) (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
      else ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    if (u16(t + 2) != 42) return None
    val ifd = u32(t + 4)
    if (ifd < 0 || t + ifd + 2 > off + len) return None
    val n = u16((t + ifd).toInt + 0)
    if (n < 0) return None
    var i = 0
    while (i < n) {
      val e = (t + ifd).toInt + 2 + i * 12
      if (e + 12 > off + len) return None
      if (u16(e) == 0x0112 && u16(e + 2) == 3) {
        val v = u16(e + 8)
        return if (v >= 1 && v <= 8) Some(v) else None
      }
      i += 1
    }
    None
  }

  /** Apply an Exif orientation (1..8) to an interleaved raster,
    * returning (width, height, pixels) as DISPLAYED. */
  private[operators] def orient(w: Int, h: Int, ch: Int, px: Array[Int],
      o: Int): (Int, Int, Array[Int]) = {
    if (o <= 1) return (w, h, px)
    val swap = o >= 5 // 5..8 transpose the axes
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Int](px.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        // source coordinate in the STORED raster for display pixel (x,y)
        val (sx, sy) = o match {
          case 2 => (ow - 1 - x, y)          // mirror horizontal
          case 3 => (ow - 1 - x, oh - 1 - y) // rotate 180
          case 4 => (x, oh - 1 - y)          // mirror vertical
          case 5 => (y, x)                   // transpose
          case 6 => (y, h - 1 - x)           // rotate 90 CW to display
          case 7 => (w - 1 - y, h - 1 - x)   // transverse
          case _ => (w - 1 - y, x)           // 8: rotate 90 CCW
        }
        var c = 0
        while (c < ch) {
          out((y * ow + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  /** Decode a baseline or progressive JPEG to interleaved samples
    * (gray: 1/pixel, color: RGB 3/pixel). The scan engine is unified:
    * coefficients accumulate in per-component buffers across scans —
    * one full-spectrum scan for baseline, DC/AC spectral-selection
    * and successive-approximation scans (T.81 G.1.2) for progressive
    * — and dequant + IDCT run once at EOI. Refuses non-DCT forms by
    * name. */
  def decode(bytes: Array[Byte]): ImageCodec.DecodedImage = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "JPEG: not a JPEG payload")
    var pos = 2
    def u8(): Int = {
      require(pos < bytes.length, "JPEG: truncated stream")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0; var height = 0; var ncomp = 0
    var progressive = false
    var compQuant: Array[Int] = null
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compIds: Array[Int] = null
    var maxH = 1; var maxV = 1; var mcusX = 0; var mcusY = 0
    var planeBX: Array[Int] = null // coefficient-grid blocks per row
    var trueBX: Array[Int] = null  // non-interleaved scan grid
    var trueBY: Array[Int] = null
    var coefs: Array[Array[Int]] = null // raw coefficients, natural order
    var restartInterval = 0
    var scans = 0
    var orientation = 1
    var adobeTransform = -1 // APP14: 0 = RGB stored directly
    val pred = new Array[Int](4)

    def parseSof(prog: Boolean): Unit = {
      // a second frame header after coefficients exist would silently
      // reallocate coefs and discard decoded scan state — refuse like
      // nested SOI does (T.81 allows exactly one SOF per frame)
      require(coefs == null, "JPEG: multiple SOF markers")
      u16()
      val prec = u8()
      require(prec == 8, s"JPEG: $prec-bit precision is not " +
        "supported here — re-encode 8-bit")
      height = u16(); width = u16(); ncomp = u8()
      require(width > 0 && height > 0 &&
        width.toLong * height <= (1L << 26),
        s"JPEG: implausible dimensions ${width}x$height")
      require(ncomp == 1 || ncomp == 3 || ncomp == 4,
        s"JPEG: $ncomp components (1 gray / 3 YCbCr-RGB / 4 CMYK)")
      progressive = prog
      compQuant = new Array[Int](ncomp)
      compH = new Array[Int](ncomp); compV = new Array[Int](ncomp)
      compIds = new Array[Int](ncomp)
      for (i <- 0 until ncomp) {
        compIds(i) = u8()
        val hv = u8()
        compH(i) = hv >> 4; compV(i) = hv & 0x0f
        require(compH(i) >= 1 && compH(i) <= 2 &&
          compV(i) >= 1 && compV(i) <= 2,
          f"JPEG: sampling factor 0x$hv%02x is not supported " +
            "here — re-encode 4:4:4, 4:2:2 or 4:2:0")
        compQuant(i) = u8()
        require(compQuant(i) <= 3,
          s"JPEG: quant table selector ${compQuant(i)} out of range")
      }
      // single-component scans are never MCU-interleaved (T.81
      // A.2.2): sampling factors are ignored for them
      if (ncomp == 1) { compH(0) = 1; compV(0) = 1 }
      maxH = compH.max; maxV = compV.max
      mcusX = (width + 8 * maxH - 1) / (8 * maxH)
      mcusY = (height + 8 * maxV - 1) / (8 * maxV)
      planeBX = Array.tabulate(ncomp)(c => mcusX * compH(c))
      trueBX = Array.tabulate(ncomp) { c =>
        val cw = (width * compH(c) + maxH - 1) / maxH
        (cw + 7) / 8
      }
      trueBY = Array.tabulate(ncomp) { c =>
        val ch = (height * compV(c) + maxV - 1) / maxV
        (ch + 7) / 8
      }
      coefs = Array.tabulate(ncomp)(c =>
        new Array[Int](planeBX(c) * mcusY * compV(c) * 64))
    }

    // one entropy-coded scan; returns the stream offset AFTER it
    def decodeScan(): Unit = {
      require(coefs != null, "JPEG: SOS before SOF")
      u16()
      val ns = u8()
      require(ns >= 1 && ns <= ncomp, s"JPEG: scan with $ns components")
      val scanComp = new Array[Int](ns)
      val dcSel = new Array[Int](ns); val acSel = new Array[Int](ns)
      for (i <- 0 until ns) {
        val cid = u8()
        val ci = compIds.indexOf(cid)
        require(ci >= 0, s"JPEG: scan references unknown component $cid")
        scanComp(i) = ci
        val tt = u8(); dcSel(i) = tt >> 4; acSel(i) = tt & 0x0f
        require(dcSel(i) <= 3 && acSel(i) <= 3,
          s"JPEG: Huffman table selector byte $tt out of range")
      }
      val ss = u8(); val se = u8()
      val aa = u8(); val ah = aa >> 4; val al = aa & 0x0f
      if (!progressive)
        require(ss == 0 && se == 63 && ah == 0 && al == 0,
          "JPEG: non-baseline scan parameters in a sequential file")
      else {
        require(ss <= se && se < 64 && al < 14,
          s"JPEG: bad spectral selection $ss..$se/$al")
        if (ss == 0) require(se == 0,
          "JPEG: progressive scan mixing DC and AC bands")
        else require(ns == 1,
          "JPEG: progressive AC scan must be single-component")
      }
      val br = new BitReader(bytes, pos)
      java.util.Arrays.fill(pred, 0)
      var eobrun = 0

      def block(si: Int, blockIdx: Int): Unit = {
        val ci = scanComp(si)
        val cf = coefs(ci)
        val off = blockIdx * 64
        if (ss == 0) {
          val dct = dcTables(dcSel(si))
          if (ah == 0) { // DC first pass (or baseline)
            require(dct != null,
              "JPEG: scan references an undefined Huffman table")
            val s = dct.decode(br)
            require(s <= 11, s"JPEG: DC size category $s")
            pred(ci) += extend(br.bits(s), s)
            cf(off) = pred(ci) << al
          } else { // DC refinement: one bit per block
            if (br.bit() == 1) cf(off) |= 1 << al
          }
        }
        if (se > 0) {
          val act = acTables(acSel(si))
          require(act != null,
            "JPEG: scan references an undefined Huffman table")
          val from = math.max(ss, 1)
          if (ah == 0) { // AC first pass (baseline falls here too)
            if (eobrun > 0) eobrun -= 1
            else {
              var k = from
              while (k <= se) {
                val rs = act.decode(br)
                val r = rs >> 4; val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else { // EOBn: ends this block
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.bits(r)
                    k = 64
                  }
                } else {
                  k += r
                  require(k <= se, "JPEG: AC run past block end")
                  cf(off + zigzag(k)) = extend(br.bits(s), s) << al
                  k += 1
                }
              }
            }
          } else { // AC refinement (T.81 G.1.2.3, libjpeg structure)
            val p1 = 1 << al; val m1 = -1 << al
            var k = from
            if (eobrun == 0) {
              var toEob = false
              while (k <= se && !toEob) {
                val rs = act.decode(br)
                var r = rs >> 4; val s = rs & 0x0f
                var newval = 0
                if (s != 0) {
                  require(s == 1,
                    s"JPEG: refinement coefficient size $s")
                  newval = if (br.bit() == 1) p1 else m1
                } else if (r != 15) { // EOBn: the CURRENT block's tail
                  // is handled by the EOB phase below, which also
                  // decrements — so no -1 here (unlike the first pass)
                  eobrun = 1 << r
                  if (r > 0) eobrun += br.bits(r)
                  toEob = true
                } // r == 15, s == 0: ZRL — skip 16 zero-history coefs
                if (!toEob) {
                  var placed = false
                  while (k <= se && !placed) {
                    val c = cf(off + zigzag(k))
                    if (c != 0) {
                      if (br.bit() == 1 && (c & p1) == 0)
                        cf(off + zigzag(k)) =
                          if (c >= 0) c + p1 else c + m1
                    } else {
                      if (r == 0) {
                        if (newval != 0) cf(off + zigzag(k)) = newval
                        placed = true
                      } else r -= 1
                    }
                    k += 1
                  }
                }
              }
            }
            if (eobrun > 0) { // EOB span: correction bits only
              while (k <= se) {
                val c = cf(off + zigzag(k))
                if (c != 0) {
                  if (br.bit() == 1 && (c & p1) == 0)
                    cf(off + zigzag(k)) = if (c >= 0) c + p1 else c + m1
                }
                k += 1
              }
              eobrun -= 1
            }
          }
        }
      }

      def restartIfDue(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 &&
            unit % restartInterval == 0) {
          require(br.atRestart, "JPEG: missing restart marker at interval")
          br.skipRestart()
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }

      if (ns > 1) { // MCU-interleaved
        var mcu = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            restartIfDue(mcu)
            var si = 0
            while (si < ns) {
              val ci = scanComp(si)
              val h = compH(ci); val v = compV(ci)
              var sub = 0
              while (sub < h * v) {
                val bx = mx * h + sub % h
                val byk = my * v + sub / h
                block(si, byk * planeBX(ci) + bx)
                sub += 1
              }
              si += 1
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      } else { // non-interleaved: the component's own block raster
        val ci = scanComp(0)
        var n = 0
        var by = 0
        while (by < trueBY(ci)) {
          var bx = 0
          while (bx < trueBX(ci)) {
            restartIfDue(n)
            block(0, by * planeBX(ci) + bx)
            n += 1
            bx += 1
          }
          by += 1
        }
      }
      pos = br.pos // padding bits of the last byte are discarded
      scans += 1
    }

    var done = false
    while (!done) {
      require(u8() == 0xff, "JPEG: expected a marker")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xd9 =>
          require(scans > 0, "JPEG: EOI before any scan data")
          done = true
        case 0xdb => // DQT
          val end = pos + u16() - 2
          while (pos < end) {
            val pq = u8()
            val prec = pq >> 4; val id = pq & 0x0f
            require(prec <= 1 && id < 4, s"JPEG: bad DQT byte $pq")
            val t = new Array[Int](64)
            for (z <- 0 until 64)
              t(zigzag(z)) = if (prec == 1) u16() else u8()
            quant(id) = t
          }
        case 0xc4 => // DHT
          val end = pos + u16() - 2
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4; val id = tc & 0x0f
            require(cls <= 1 && id < 4, s"JPEG: bad DHT byte $tc")
            val bits = Array.fill(16)(u8())
            val n = bits.sum
            require(n <= 256, "JPEG: DHT with more than 256 symbols")
            val vals = Array.fill(n)(u8())
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTables(id) = t else acTables(id) = t
          }
        case 0xc0 | 0xc1 => parseSof(prog = false)
        case 0xc2 => parseSof(prog = true)
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf => throw new IllegalArgumentException(
          f"JPEG: SOF 0x$m%02x (lossless/arithmetic/hierarchical) " +
            "is not supported here — re-encode baseline or progressive")
        case 0xdd => // DRI
          require(u16() == 4, "JPEG: bad DRI length")
          restartInterval = u16()
        case 0xda => decodeScan()
        case 0xd8 => throw new IllegalArgumentException("JPEG: nested SOI")
        case 0xe1 => // APP1: Exif — read the orientation tag, skip rest
          val len = u16()
          require(len >= 2 && pos + len - 2 <= bytes.length,
            "JPEG: truncated APP1 segment")
          orientation = exifOrientation(bytes, pos, len - 2)
            .getOrElse(orientation)
          pos += len - 2
        case 0xee => // APP14: Adobe — the color-transform declaration
          val len = u16()
          require(len >= 2 && pos + len - 2 <= bytes.length,
            "JPEG: truncated APP14 segment")
          if (len - 2 >= 12 && bytes(pos) == 'A' && bytes(pos + 1) == 'd' &&
              bytes(pos + 2) == 'o' && bytes(pos + 3) == 'b' &&
              bytes(pos + 4) == 'e')
            adobeTransform = bytes(pos + 11) & 0xff
          pos += len - 2
        case _ => // APPn/COM/other tables: skip by declared length
          val len = u16()
          require(len >= 2 && pos + len - 2 <= bytes.length,
            f"JPEG: truncated segment 0xff$m%02x")
          pos += len - 2
      }
    }
    // dequantize + IDCT every block of every component plane
    val result = new Array[Array[Int]](ncomp)
    val resStride = new Array[Int](ncomp)
    val resH = new Array[Int](ncomp); val resV = new Array[Int](ncomp)
    var ci = 0
    while (ci < ncomp) {
      val qt = quant(compQuant(ci))
      require(qt != null,
        "JPEG: component references an undefined quant table")
      val bX = planeBX(ci); val bY = mcusY * compV(ci)
      val stride = bX * 8
      val plane = new Array[Int](stride * bY * 8)
      val cf = coefs(ci)
      val dq = new Array[Int](64)
      var b = 0
      while (b < bX * bY) {
        var i = 0
        while (i < 64) { dq(i) = cf(b * 64 + i) * qt(i); i += 1 }
        val px8 = idct(dq)
        val bx = b % bX; val byk = b / bX
        i = 0
        while (i < 64) {
          plane((byk * 8 + i / 8) * stride + bx * 8 + i % 8) = px8(i)
          i += 1
        }
        b += 1
      }
      result(ci) = plane
      resStride(ci) = stride
      resH(ci) = maxH / compH(ci); resV(ci) = maxV / compV(ci)
      ci += 1
    }
    // sample each plane at full resolution (nearest-neighbor chroma
    // upsampling for subsampled components)
    def sample(c: Int, x: Int, y: Int): Int =
      result(c)((y / resV(c)) * resStride(c) + x / resH(c))
    if (ncomp == 1) {
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = sample(0, x, y); x += 1
        }
        y += 1
      }
      val (ow, oh, op) = orient(width, height, 1, out, orientation)
      ImageCodec.DecodedImage("image/jpeg", ow, oh, 1, op)
    } else if (ncomp == 4) {
      // Adobe 4-component CMYK/YCCK (tech note #5116 — old Photoshop
      // web exports): samples are Adobe-INVERTED ink (stored = 255 -
      // ink), so RGB is the multiplicative stored_c * stored_k / 255.
      // Transform 2 (YCCK) first runs the stored CMY through the
      // standard YCbCr matrix; transform 0 is direct CMYK. A
      // 4-component frame with no APP14 declaration (or the 3-only
      // transform 1) has no defined color space — refuse BY NAME.
      require(adobeTransform == 0 || adobeTransform == 2,
        "JPEG: 4-component CMYK without an Adobe APP14 CMYK/YCCK " +
          "transform declaration — re-encode sRGB")
      val out = new Array[Int](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val base = (y * width + x) * 3
          val k = sample(3, x, y)
          var c = sample(0, x, y)
          var m = sample(1, x, y)
          var yl = sample(2, x, y)
          if (adobeTransform == 2) {
            val cb = m - 128; val cr = yl - 128
            val c0 = c
            c = math.max(0, math.min(255,
              math.round(c0 + 1.402 * cr).toInt))
            m = math.max(0, math.min(255,
              math.round(c0 - 0.344136 * cb - 0.714136 * cr).toInt))
            yl = math.max(0, math.min(255,
              math.round(c0 + 1.772 * cb).toInt))
          }
          out(base) = math.round(c * k / 255.0).toInt
          out(base + 1) = math.round(m * k / 255.0).toInt
          out(base + 2) = math.round(yl * k / 255.0).toInt
          x += 1
        }
        y += 1
      }
      val (ow, oh, op) = orient(width, height, 3, out, orientation)
      ImageCodec.DecodedImage("image/jpeg", ow, oh, 3, op)
    } else {
      // Adobe APP14 transform 0 declares the components are stored as
      // RGB directly — applying the YCbCr matrix there would silently
      // mis-decode (libjpeg honors the same flag)
      val storedRgb = adobeTransform == 0
      val out = new Array[Int](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val base = (y * width + x) * 3
          if (storedRgb) {
            out(base) = sample(0, x, y)
            out(base + 1) = sample(1, x, y)
            out(base + 2) = sample(2, x, y)
          } else {
            val yy = sample(0, x, y)
            val cb = sample(1, x, y) - 128
            val cr = sample(2, x, y) - 128
            out(base) = math.max(0, math.min(255,
              math.round(yy + 1.402 * cr).toInt))
            out(base + 1) = math.max(0, math.min(255,
              math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt))
            out(base + 2) = math.max(0, math.min(255,
              math.round(yy + 1.772 * cb).toInt))
          }
          x += 1
        }
        y += 1
      }
      val (ow, oh, op) = orient(width, height, 3, out, orientation)
      ImageCodec.DecodedImage("image/jpeg", ow, oh, 3, op)
    }
  }
}
