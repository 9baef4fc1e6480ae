package graft.sources

/** The reference's specialized column codecs as compressed-frame
  * methods, reimplemented from their documented formats:
  *
  *  - Delta (0x92, CompressionCodecDelta.cpp): payload =
  *    [width][skip][skip raw bytes][per-width-int deltas, LE].
  *  - DoubleDelta (0x94, CompressionCodecDoubleDelta.cpp:116-166 —
  *    the Gorilla-paper timestamp scheme extended to 64-bit):
  *    [width][skip][skip bytes] then u32-LE item count, first item
  *    raw, second as width-int delta, then an MSB-first bit stream of
  *    double-deltas with the 1/2/3/4/5-bit prefix ladder documented
  *    in the reference (0 / 10+s+6 / 110+s+8 / 1110+s+11 / 11110+s+31
  *    / 11111+s+63 bits).
  *  - Gorilla (0x95, CompressionCodecGorilla.cpp:29-105 — the
  *    Gorilla-paper value scheme): [width][skip][skip bytes], u32-LE
  *    item count, first item raw, then per item: 0 = repeat;
  *    10 = xor reusing the previous leading/trailing-zero window;
  *    11 + lzb + data-bit-count + the non-zero xor bits (field widths
  *    4/5/6/7 by value width, leading-zero field one bit narrower).
  *
  * The bit stream is MSB-first with zero-padded final byte (the
  * reference's IO/BitHelpers.h semantics); the worked byte examples
  * in the reference's own doc comments are pinned as KATs in
  * ChColumnCodecsSpec. T64 (0x93) DECODES (both transpose variants —
  * t64Decompress below); only its WRITE side refuses, because the
  * OUTFILE COMPRESSION stream is heterogeneous bytes while T64's
  * framing is column-typed (the reference's own constraint).
  */
object ChColumnCodecs {

  // ---------- MSB-first bit IO ----------

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0

    /** Write the `n` LOW bits of `v`, most significant first. */
    def writeBits(n: Int, v: Long): Unit = {
      require(n >= 0 && n <= 64, s"writeBits($n)")
      var left = n
      while (left > 0) {
        val take = math.min(left, 8 - nbits)
        val shift = left - take
        val bits = (v >>> shift) & ((1L << take) - 1)
        acc = (acc << take) | bits
        nbits += take
        left -= take
        if (nbits == 8) { out.write(acc.toInt & 0xff); acc = 0L; nbits = 0 }
      }
    }

    /** Zero-pad the final partial byte and return the stream. */
    def result(): Array[Byte] = {
      if (nbits > 0) { out.write((acc << (8 - nbits)).toInt & 0xff); acc = 0; nbits = 0 }
      out.toByteArray
    }
  }

  final class BitReader(bytes: Array[Byte], off: Int, len: Int) {
    private var pos = off
    private val end = off + len
    private var acc = 0L
    private var nbits = 0

    def eof: Boolean = nbits == 0 && pos >= end

    def readBit(): Int = readBits(1).toInt

    /** Read `n` bits MSB-first; bits past the end read as zero (the
      * reference zero-pads the final byte; item counts bound reads). */
    def readBits(n: Int): Long = {
      require(n >= 0 && n <= 64, s"readBits($n)")
      var v = 0L
      var left = n
      while (left > 0) {
        if (nbits == 0) {
          acc = if (pos < end) { val b = bytes(pos) & 0xffL; pos += 1; b }
            else 0L
          nbits = 8
        }
        val take = math.min(left, nbits)
        v = (v << take) | ((acc >>> (nbits - take)) & ((1L << take) - 1))
        nbits -= take
        left -= take
      }
      v
    }
  }

  // ---------- width-generic little-endian int IO ----------

  private def load(bytes: Array[Byte], off: Int, w: Int): Long = {
    var v = 0L
    var i = 0
    while (i < w) { v |= (bytes(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def store(bytes: Array[Byte], off: Int, w: Int, v: Long): Unit = {
    var i = 0
    while (i < w) { bytes(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def mask(w: Int): Long = if (w == 8) -1L else (1L << (8 * w)) - 1

  /** Sign-extend a `w`-byte value held in the low bits of a Long. */
  private def signed(v: Long, w: Int): Long =
    if (w == 8) v else (v << (64 - 8 * w)) >> (64 - 8 * w)

  private def checkWidth(w: Int, what: String): Unit =
    require(w == 1 || w == 2 || w == 4 || w == 8,
      s"$what: width must be 1/2/4/8 bytes, got $w")

  // ---------- Delta (0x92) ----------

  def deltaCompress(src: Array[Byte], w: Int): Array[Byte] = {
    checkWidth(w, "Delta")
    val skip = src.length % w
    val out = new Array[Byte](2 + src.length)
    out(0) = w.toByte
    out(1) = skip.toByte
    System.arraycopy(src, 0, out, 2, skip)
    var prev = 0L
    var i = skip
    while (i < src.length) {
      val cur = load(src, i, w)
      store(out, 2 + i, w, (cur - prev) & mask(w))
      prev = cur
      i += w
    }
    out
  }

  def deltaDecompress(payload: Array[Byte], off: Int, len: Int,
      rawLen: Int): Array[Byte] = {
    require(len >= 2, "Delta: truncated payload")
    val w = payload(off) & 0xff
    checkWidth(w, "Delta")
    val skip = payload(off + 1) & 0xff
    require(len == 2 + rawLen && skip == rawLen % w,
      s"Delta: payload $len / raw $rawLen / skip $skip disagree")
    val out = new Array[Byte](rawLen)
    System.arraycopy(payload, off + 2, out, 0, skip)
    var acc = 0L
    var i = skip
    while (i < rawLen) {
      acc = (acc + load(payload, off + 2 + i, w)) & mask(w)
      store(out, i, w, acc)
      i += w
    }
    out
  }

  // ---------- DoubleDelta (0x94) ----------

  def doubleDeltaCompress(src: Array[Byte], w: Int): Array[Byte] = {
    checkWidth(w, "DoubleDelta")
    val skip = src.length % w
    val head = new java.io.ByteArrayOutputStream()
    head.write(w); head.write(skip)
    head.write(src, 0, skip)
    val n = (src.length - skip) / w
    // u32 LE item count
    val cnt = new Array[Byte](4); store(cnt, 0, 4, n.toLong); head.write(cnt)
    var prevValue = 0L
    var prevDelta = 0L
    if (n >= 1) {
      prevValue = load(src, skip, w)
      val b = new Array[Byte](w); store(b, 0, w, prevValue); head.write(b)
    }
    if (n >= 2) {
      val cur = load(src, skip + w, w)
      prevDelta = (cur - prevValue) & mask(w)
      val b = new Array[Byte](w); store(b, 0, w, prevDelta); head.write(b)
      prevValue = cur
    }
    val bw = new BitWriter
    var i = 2
    while (i < n) {
      val cur = load(src, skip + i * w, w)
      val delta = (cur - prevValue) & mask(w)
      val dd = (delta - prevDelta) & mask(w)
      prevDelta = delta
      prevValue = cur
      if (dd == 0L) bw.writeBits(1, 0)
      else {
        val sdd = signed(dd, w)
        val sign = if (sdd < 0) 1L else 0L
        // two's-complement wrap for the most negative value mirrors
        // the reference's unsigned arithmetic
        val absM1 = (math.abs(sdd) - 1) & mask(w)
        // the reference's prefix ladder (strict, asymmetric bounds)
        val (pBits, prefix, dataBits) =
          if (sdd > -63 && sdd < 64) (2, 2L, 7)
          else if (sdd > -255 && sdd < 256) (3, 6L, 9)
          else if (sdd > -2047 && sdd < 2048) (4, 14L, 12)
          else if (sdd > Int.MinValue.toLong && sdd < Int.MaxValue.toLong)
            (5, 30L, 32)
          else (5, 31L, 64)
        bw.writeBits(pBits, prefix)
        bw.writeBits(1, sign)
        bw.writeBits(dataBits - 1, absM1)
      }
      i += 1
    }
    val bits = bw.result()
    head.write(bits)
    head.toByteArray
  }

  def doubleDeltaDecompress(payload: Array[Byte], off: Int, len: Int,
      rawLen: Int): Array[Byte] = {
    require(len >= 2, "DoubleDelta: truncated payload")
    val w = payload(off) & 0xff
    checkWidth(w, "DoubleDelta")
    val skip = payload(off + 1) & 0xff
    require(skip == rawLen % w, s"DoubleDelta: skip $skip vs raw $rawLen")
    val out = new Array[Byte](rawLen)
    System.arraycopy(payload, off + 2, out, 0, skip)
    var p = off + 2 + skip
    require(p + 4 <= off + len, "DoubleDelta: truncated item count")
    val n = load(payload, p, 4).toInt; p += 4
    require(n.toLong * w + skip == rawLen,
      s"DoubleDelta: item count $n disagrees with raw size $rawLen")
    var o = skip
    var prevValue = 0L
    var prevDelta = 0L
    if (n >= 1) {
      prevValue = load(payload, p, w); p += w
      store(out, o, w, prevValue); o += w
    }
    if (n >= 2) {
      prevDelta = load(payload, p, w); p += w
      prevValue = (prevValue + prevDelta) & mask(w)
      store(out, o, w, prevValue); o += w
    }
    val br = new BitReader(payload, p, off + len - p)
    var i = 2
    while (i < n && !br.eof) {
      var dd = 0L
      if (br.readBit() == 1) {
        val dataBits =
          if (br.readBit() == 0) 7
          else if (br.readBit() == 0) 9
          else if (br.readBit() == 0) 12
          else if (br.readBit() == 0) 32
          else 64
        val sign = br.readBit()
        dd = (br.readBits(dataBits - 1) + 1) & mask(w)
        if (sign == 1) dd = (-dd) & mask(w)
      }
      val delta = (dd + prevDelta) & mask(w)
      val cur = (prevValue + delta) & mask(w)
      store(out, o, w, cur); o += w
      prevDelta = delta
      prevValue = cur
      i += 1
    }
    require(o == rawLen, s"DoubleDelta: decoded $o of $rawLen bytes")
    out
  }

  // ---------- T64 (0x93) ----------
  // CompressionCodecT64.cpp: 64 values become a 64×(8·width) bit
  // matrix stored as byte planes; min/max of the part detect the
  // valuable bit count and only those bit rows are stored. Byte
  // variant (default) stores full byte planes raw and bit-transposes
  // only the last partial byte; Bit variant bit-transposes every
  // plane. Payload = [cookie: magic | variant<<7][min u64 LE]
  // [max u64 LE][num_bits longs per 64-value block].

  /** MagicNumber (CompressionCodecT64.cpp:73-90) → (base width,
    * signedness of the base type per baseType()). */
  private val t64Magic: Map[Int, (Int, Boolean)] = Map(
    1 -> (1, false), 2 -> (2, false), 3 -> (4, false), 4 -> (8, false),
    6 -> (1, true), 7 -> (2, true), 8 -> (4, true), 9 -> (8, true),
    13 -> (2, false), // Date → UInt16
    14 -> (4, false), // DateTime → UInt32
    15 -> (8, true), // DateTime64 → Int64
    17 -> (1, false), 18 -> (2, false), // Enum8/16 → UInt8/16
    19 -> (4, true), 20 -> (8, true)) // Decimal32/64 → Int32/64

  private def t64ValuableBits(min: Long, max: Long, isSigned: Boolean): Int = {
    def unsignedBits(a: Long, b: Long): Int = {
      val diff = a ^ b
      if (diff != 0) 64 - java.lang.Long.numberOfLeadingZeros(diff) else 0
    }
    if (isSigned && min < 0 && max >= 0) {
      if (min + max >= 0) unsignedBits(0L, max) + 1
      else unsignedBits(0L, ~min) + 1
    } else unsignedBits(min, max)
  }

  /** Bit-transpose one 64-byte plane: 64 bytes → 8 longs, long k
    * collecting bit k of byte i at position i (transpose64x8). */
  private def t64Transpose64x8(plane: Array[Byte], off: Int): Unit = {
    val dst = new Array[Long](8)
    var i = 0
    while (i < 64) {
      val v = plane(off + i) & 0xffL
      var k = 0
      while (k < 8) {
        dst(k) |= ((v >>> k) & 1L) << i
        k += 1
      }
      i += 1
    }
    var k = 0
    while (k < 8) { store(plane, off + 8 * k, 8, dst(k)); k += 1 }
  }

  private def t64ReverseTranspose64x8(plane: Array[Byte], off: Int): Unit = {
    val src = Array.tabulate(8)(k => load(plane, off + 8 * k, 8))
    val out = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      var b = 0
      var k = 0
      while (k < 8) { b |= (((src(k) >>> i) & 1L) << k).toInt; k += 1 }
      out(i) = b.toByte
      i += 1
    }
    System.arraycopy(out, 0, plane, off, 64)
  }

  /** Compress a width-aligned byte stream as one T64 part. `magic`
    * picks the declared type (1/2/3/4 = UInt8..64, 6..9 = Int8..64,
    * …); `bitVariant` = the Bit transpose form. */
  def t64Compress(src: Array[Byte], magic: Int,
      bitVariant: Boolean = false): Array[Byte] = {
    val (w, isSigned) = t64Magic.getOrElse(magic,
      throw new IllegalArgumentException(s"T64: bad magic number $magic"))
    require(src.length % w == 0,
      s"T64: data size ${src.length} is not a multiple of $w")
    val n = src.length / w
    val out = new java.io.ByteArrayOutputStream()
    out.write(magic | (if (bitVariant) 0x80 else 0))
    // min/max over the part, sign-extended for signed base types
    var min = 0L; var max = 0L
    if (n > 0) {
      min = if (isSigned) signed(load(src, 0, w), w) else load(src, 0, w)
      max = min
      var i = 1
      while (i < n) {
        val v0 = load(src, i * w, w)
        val v = if (isSigned) signed(v0, w) else v0
        val lt = if (isSigned) v < min
          else java.lang.Long.compareUnsigned(v, min) < 0
        val gt = if (isSigned) v > max
          else java.lang.Long.compareUnsigned(v, max) > 0
        if (lt) min = v
        if (gt) max = v
        i += 1
      }
    } else if (n == 0) { min = 0L; max = 0L }
    val mm = new Array[Byte](16)
    store(mm, 0, 8, min); store(mm, 8, 8, max)
    out.write(mm)
    val numBits = t64ValuableBits(min, max, isSigned)
    if (numBits == 0 || n == 0) return out.toByteArray
    val fullBytes = numBits / 8
    val partBits = numBits % 8
    var blockStart = 0
    while (blockStart < n) {
      val tail = math.min(64, n - blockStart)
      // byte planes: plane b, column c = byte b of value c
      val matrix = new Array[Byte](512)
      var c = 0
      while (c < tail) {
        var b = 0
        while (b < w) {
          matrix(64 * b + c) = src((blockStart + c) * w + b)
          b += 1
        }
        c += 1
      }
      if (bitVariant) {
        var b = 0
        while (b < fullBytes) { t64Transpose64x8(matrix, 64 * b); b += 1 }
      }
      out.write(matrix, 0, 8 * (numBits - partBits))
      if (partBits > 0) {
        t64Transpose64x8(matrix, 64 * fullBytes)
        out.write(matrix, 64 * fullBytes, 8 * partBits)
      }
      blockStart += 64
    }
    out.toByteArray
  }

  def t64Decompress(payload: Array[Byte], off: Int, len: Int,
      rawLen: Int): Array[Byte] = {
    require(len >= 17, "T64: truncated payload (need cookie + min/max)")
    val cookie = payload(off) & 0xff
    val bitVariant = (cookie & 0x80) != 0
    val magic = cookie & 0x7f
    val (w, isSigned) = t64Magic.getOrElse(magic,
      throw new IllegalArgumentException(s"T64: bad magic number $magic"))
    require(rawLen % w == 0,
      s"T64: unexpected uncompressed size $rawLen for width $w")
    val n = rawLen / w
    val min = load(payload, off + 1, 8)
    val max = load(payload, off + 9, 8)
    val out = new Array[Byte](rawLen)
    val numBits = t64ValuableBits(min, max, isSigned)
    if (numBits == 0) {
      var i = 0
      while (i < n) { store(out, i * w, w, min); i += 1 }
      return out
    }
    val srcShift = 8 * numBits
    val body = len - 17
    require(body > 0 && body % srcShift == 0,
      s"T64: data size $body is not a multiple of $srcShift")
    val fullBytes = numBits / 8
    val partBits = numBits % 8
    // shared upper bits + the zero-crossing sign split
    var upperMin = 0L; var upperMax = 0L; var signBit = 0L
    if (numBits < 64) upperMin = (min >>> numBits) << numBits
    if (isSigned && min < 0 && max >= 0 && numBits < 64) {
      signBit = 1L << (numBits - 1)
      upperMax = (max >>> numBits) << numBits
    }
    var block = 0
    val nBlocks = body / srcShift
    require(nBlocks.toLong * 64 >= n,
      s"T64: $nBlocks blocks cannot hold $n values")
    while (block < nBlocks) {
      val tail = math.min(64, n - block * 64)
      val matrix = new Array[Byte](512)
      System.arraycopy(payload, off + 17 + block * srcShift, matrix, 0,
        srcShift)
      if (bitVariant) {
        var b = 0
        while (b < fullBytes) { t64ReverseTranspose64x8(matrix, 64 * b); b += 1 }
      }
      if (partBits > 0) t64ReverseTranspose64x8(matrix, 64 * fullBytes)
      var c = 0
      while (c < tail) {
        var v = 0L
        var b = 0
        while (b < w) {
          v |= (matrix(64 * b + c) & 0xffL) << (8 * b)
          b += 1
        }
        // mask to the stored bit rows, then restore the shared upper
        // bits (restoreUpperBits)
        if (numBits < 64) v &= (1L << numBits) - 1
        if (signBit != 0) v |= (if ((v & signBit) != 0) upperMin else upperMax)
        else v |= upperMin
        store(out, (block * 64 + c) * w, w, v)
        c += 1
      }
      block += 1
    }
    out
  }

  // ---------- Gorilla (0x95) ----------

  private def dataBitLength(w: Int): Int = w match {
    case 1 => 4; case 2 => 5; case 4 => 6; case _ => 7
  }

  def gorillaCompress(src: Array[Byte], w: Int): Array[Byte] = {
    checkWidth(w, "Gorilla")
    val dbl = dataBitLength(w)
    val lzbl = dbl - 1
    val skip = src.length % w
    val head = new java.io.ByteArrayOutputStream()
    head.write(w); head.write(skip)
    head.write(src, 0, skip)
    val n = (src.length - skip) / w
    val cnt = new Array[Byte](4); store(cnt, 0, 4, n.toLong); head.write(cnt)
    var prev = 0L
    if (n >= 1) {
      prev = load(src, skip, w)
      val b = new Array[Byte](w); store(b, 0, w, prev); head.write(b)
    }
    val bw = new BitWriter
    var prevLz = 0; var prevDb = 0; var prevTz = 0
    val bitSize = w * 8
    var i = 1
    while (i < n) {
      val cur = load(src, skip + i * w, w)
      val x = (cur ^ prev) & mask(w)
      if (x == 0L) bw.writeBits(1, 0)
      else {
        val lz = java.lang.Long.numberOfLeadingZeros(x) - (64 - bitSize)
        val tz = java.lang.Long.numberOfTrailingZeros(x)
        val db = bitSize - lz - tz
        if (prevDb != 0 && prevLz <= lz && prevTz <= tz) {
          bw.writeBits(2, 2L) // 0b10: reuse the previous window
          bw.writeBits(prevDb, x >>> prevTz)
        } else {
          bw.writeBits(2, 3L) // 0b11: new window
          bw.writeBits(lzbl, lz.toLong)
          bw.writeBits(dbl, db.toLong)
          bw.writeBits(db, x >>> tz)
          prevLz = lz; prevDb = db; prevTz = tz
        }
      }
      prev = cur
      i += 1
    }
    head.write(bw.result())
    head.toByteArray
  }

  def gorillaDecompress(payload: Array[Byte], off: Int, len: Int,
      rawLen: Int): Array[Byte] = {
    require(len >= 2, "Gorilla: truncated payload")
    val w = payload(off) & 0xff
    checkWidth(w, "Gorilla")
    val dbl = dataBitLength(w)
    val lzbl = dbl - 1
    val skip = payload(off + 1) & 0xff
    require(skip == rawLen % w, s"Gorilla: skip $skip vs raw $rawLen")
    val out = new Array[Byte](rawLen)
    System.arraycopy(payload, off + 2, out, 0, skip)
    var p = off + 2 + skip
    require(p + 4 <= off + len, "Gorilla: truncated item count")
    val n = load(payload, p, 4).toInt; p += 4
    require(n.toLong * w + skip == rawLen,
      s"Gorilla: item count $n disagrees with raw size $rawLen")
    var o = skip
    var prev = 0L
    if (n >= 1) {
      prev = load(payload, p, w); p += w
      store(out, o, w, prev); o += w
    }
    val br = new BitReader(payload, p, off + len - p)
    val bitSize = w * 8
    var lz = 0; var db = 0; var tz = 0
    var i = 1
    while (i < n && !br.eof) {
      var cur = prev
      if (br.readBit() == 1) {
        if (br.readBit() == 1) {
          lz = br.readBits(lzbl).toInt
          db = br.readBits(dbl).toInt
          tz = bitSize - lz - db
        }
        require(lz != 0 || db != 0 || tz != 0,
          "Gorilla: corrupted input data (empty xor window)")
        val x = (br.readBits(db) << tz) & mask(w)
        cur = (prev ^ x) & mask(w)
      }
      store(out, o, w, cur); o += w
      prev = cur
      i += 1
    }
    require(o == rawLen, s"Gorilla: decoded $o of $rawLen bytes")
    out
  }
}
