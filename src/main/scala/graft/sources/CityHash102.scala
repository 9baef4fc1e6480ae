package graft.sources

/** CityHash128 v1.0.2 (Pike & Alakuijala, Google, MIT license) —
  * Scala port of the public algorithm, the exact revision the
  * reference vendors (contrib/cityhash102) and uses as the checksum
  * of every compressed block frame
  * (src/Compression/CompressedReadBufferBase.cpp:36,42). Later
  * CityHash revisions changed the output values, so this port pins
  * v1.0.2 semantics: unsigned 64-bit arithmetic is JVM Long wrapping,
  * byte loads are little-endian.
  */
object CityHash102 {

  private val K0 = 0xc3a5c85c97cb3127L
  private val K1 = 0xb492b66fbe98f273L
  private val K2 = 0x9ae16a3b2f90404fL
  private val K3 = 0xc949d7c7509e6557L
  private val KMul = 0x9ddfea08eb382d69L

  private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  private def rotate(v: Long, s: Int): Long =
    if (s == 0) v else (v >>> s) | (v << (64 - s))

  private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Hash128to64 (city.h): murmur-inspired 128→64 fold. */
  private def hash128to64(lo: Long, hi: Long): Long = {
    var a = (lo ^ hi) * KMul
    a ^= (a >>> 47)
    var b = (hi ^ a) * KMul
    b ^= (b >>> 47)
    b * KMul
  }

  private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(b: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(b, off)
      val x = fetch64(b, off + len - 8)
      hashLen16(a, rotate(x + len, len)) ^ x
    } else if (len >= 4) {
      val a = fetch32(b, off)
      hashLen16(len + (a << 3), fetch32(b, off + len - 4))
    } else if (len > 0) {
      val a = b(off) & 0xff
      val c = b(off + (len >> 1)) & 0xff
      val d = b(off + len - 1) & 0xff
      val y = (a + (c << 8)).toLong & 0xffffffffL
      val z = (len + (d << 2)).toLong & 0xffffffffL
      shiftMix(y * K2 ^ z * K3) * K2
    } else K2
  }

  /** WeakHashLen32WithSeeds over s[0..31] with seeds (a, b). */
  private def weakHash32(b: Array[Byte], off: Int,
      a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(b, off)
    val x = fetch64(b, off + 8)
    val y = fetch64(b, off + 16)
    val z = fetch64(b, off + 24)
    var a = a0 + w
    var bb = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    bb += rotate(a, 44)
    (a + z, bb + c)
  }

  /** CityMurmur — the <128-byte path of CityHash128WithSeed. */
  private def cityMurmur(b: Array[Byte], off: Int, len: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var bb = seedHi
    var c = 0L
    var d = 0L
    var l = len - 16
    if (l <= 0) {
      a = shiftMix(a * K1) * K1
      c = bb * K1 + hashLen0to16(b, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(b, off) else c))
    } else {
      c = hashLen16(fetch64(b, off + len - 8) + K1, a)
      d = hashLen16(bb + len, c + fetch64(b, off + len - 16))
      a += d
      var s = off
      while (l > 0) {
        a ^= shiftMix(fetch64(b, s) * K1) * K1
        a *= K1
        bb ^= a
        c ^= shiftMix(fetch64(b, s + 8) * K1) * K1
        c *= K1
        d ^= c
        s += 16
        l -= 16
      }
    }
    a = hashLen16(a, c)
    bb = hashLen16(d, bb)
    (a ^ bb, hashLen16(bb, a))
  }

  /** CityHash128WithSeed. `b` may be null only when len == 0. */
  def cityHash128WithSeed(b: Array[Byte], off: Int, len0: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(
      if (b == null) Array.emptyByteArray else b, off, len0, seedLo, seedHi)
    var len = len0
    var x = seedLo
    var y = seedHi
    var z = len.toLong * K1
    var v1 = rotate(y ^ K1, 49) * K1 + fetch64(b, off)
    var v2 = rotate(v1, 42) * K1 + fetch64(b, off + 8)
    var w1 = rotate(y + z, 35) * K1 + x
    var w2 = rotate(x + fetch64(b, off + 88), 53) * K1
    var s = off
    while (len >= 128) {
      // two unrolled 64-byte rounds (the CityHash64 inner loop)
      var i = 0
      while (i < 2) {
        x = rotate(x + y + v1 + fetch64(b, s + 16), 37) * K1
        y = rotate(y + v2 + fetch64(b, s + 48), 42) * K1
        x ^= w2
        y ^= v1
        z = rotate(z ^ w1, 33)
        val v = weakHash32(b, s, v2 * K1, x + w1)
        val w = weakHash32(b, s + 32, z + w2, y)
        v1 = v._1; v2 = v._2
        w1 = w._1; w2 = w._2
        val t = z; z = x; x = t
        s += 64
        i += 1
      }
      len -= 128
    }
    y += rotate(w1, 37) * K0 + z
    x += rotate(v1 + z, 49) * K0
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * K0 + v2
      w1 += fetch64(b, s + len - tailDone + 16)
      x = rotate(x, 49) * K0 + w1
      w1 += v1
      val v = weakHash32(b, s + len - tailDone, v1, v2)
      v1 = v._1; v2 = v._2
    }
    x = hashLen16(x, v1)
    y = hashLen16(y, w1)
    (hashLen16(x + v2, w2) + y, hashLen16(x + w2, y + v2))
  }

  /** CityHash128 — the checksum function of the reference's
    * compressed block frames. Returns (low64, high64). */
  def cityHash128(b: Array[Byte], off: Int, len: Int): (Long, Long) =
    if (len >= 16)
      cityHash128WithSeed(b, off + 16, len - 16,
        fetch64(b, off) ^ K3, fetch64(b, off + 8))
    else if (len >= 8)
      cityHash128WithSeed(null, 0, 0,
        fetch64(b, off) ^ (len.toLong * K0), fetch64(b, off + len - 8) ^ K1)
    else
      cityHash128WithSeed(b, off, len, K0, K1)
}
