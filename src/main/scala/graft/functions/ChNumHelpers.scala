package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Imperative numeric kernels behind StaticInvoke (the ChStrHelpers
  * discipline: codegen'd static calls, null-propagating, never UDFs)
  * for CH names whose algorithms are loops, not expressions:
  *
  *  - jumpConsistentHash — Lamping & Veach 2014 (the public paper's
  *    ~5-line algorithm, the same one ClickHouse documents);
  *  - mortonEncode/Decode — 2-D Z-order bit interleaving via the
  *    standard mask-spread/compact ladders;
  *  - hilbertEncode/Decode — the public-domain Wikipedia xy2d/d2xy
  *    rotation walk at order 32 (overflow wraps mod 2⁶⁴, matching
  *    CH's UInt64 reinterpreted as Int64);
  *  - isIPAddressInRange — prefix compare in both families (IPv4 via
  *    integer shifts, IPv6 over ChStrHelpers' own textual parser —
  *    never InetAddress, which can fall back to DNS).
  */
object ChNumHelpers {

  /** Lamping & Veach (2014) jump consistent hash: maps key uniformly
    * onto [0, buckets) with minimal movement as buckets grows. */
  def jumpConsistentHash(key: Long, buckets: Int): Int = {
    require(buckets > 0, "jumpConsistentHash needs buckets > 0")
    var k = key
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      k = k * 2862933555777941757L + 1
      j = (((b + 1).toDouble * (1L << 31).toDouble) /
        (((k >>> 33) + 1).toDouble)).toLong
    }
    b.toInt
  }

  private def spreadBits(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def compactBits(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0xFFFFFFFFL
    x
  }

  /** 2-D Z-order curve: interleave the low 32 bits of x (even
    * positions) and y (odd positions). */
  def mortonEncode(x: Long, y: Long): Long =
    spreadBits(x) | (spreadBits(y) << 1)

  def mortonDecodeX(code: Long): Long = compactBits(code)
  def mortonDecodeY(code: Long): Long = compactBits(code >>> 1)

  /** Order-32 Hilbert curve distance of (x, y) — the standard xy2d
    * rotation walk. d accumulates s²·q per quadrant; at order 32 the
    * result spans the full unsigned 64-bit range and wraps into
    * Long's bit pattern exactly as CH's UInt64 does. */
  def hilbertEncode(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFFFFFL
    var y = yIn & 0xFFFFFFFFL
    var d = 0L
    var s = 1L << 31
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def hilbertDecode(dIn: Long): (Long, Long) = {
    var t = dIn
    var x = 0L
    var y = 0L
    var s = 1L
    while (s != (1L << 32)) {
      val rx = 1L & (t >>> 1)
      val ry = 1L & (t ^ rx)
      // rotate back
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t = t >>> 2
      s <<= 1
    }
    (x, y)
  }

  def hilbertDecodeX(d: Long): Long = hilbertDecode(d)._1
  def hilbertDecodeY(d: Long): Long = hilbertDecode(d)._2

  /** Log-gamma via the Lanczos approximation (g = 7, n = 9 — the
    * published coefficient set; |ε| < 1e-13 over the positive reals).
    * Reflection handles x < 0.5. */
  def lgammaOf(x: Double): Double = {
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgammaOf(1.0 - x)
    else {
      val g = 7.0
      val c = Array(
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6,
        1.5056327351493116e-7)
      val xx = x - 1.0
      var a = c(0)
      val t = xx + g + 0.5
      var i = 1
      while (i < 9) { a += c(i) / (xx + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (xx + 0.5) * math.log(t) - t +
        math.log(a)
    }
  }

  /** Γ(x) from the Lanczos log form (sign via reflection). */
  def tgammaOf(x: Double): Double = {
    if (x >= 0.5) math.exp(lgammaOf(x))
    else math.Pi / (math.sin(math.Pi * x) * math.exp(lgammaOf(1.0 - x)))
  }

  /** bfloat16 rounding: keep the top 16 bits of the float32 pattern
    * (truncation — CH's BFloat16 conversion), widened back to
    * double. */
  def bfloat16Round(v: Double): Double = {
    val bits = java.lang.Float.floatToRawIntBits(v.toFloat)
    java.lang.Float.intBitsToFloat(bits & 0xFFFF0000).toDouble
  }

  private def parseIpv4(s: String): Long = {
    val parts = s.split("\\.", -1)
    require(parts.length == 4, s"not an IPv4 address: '$s'")
    var acc = 0L
    for (p <- parts) {
      val v = p.toInt
      require(v >= 0 && v <= 255, s"not an IPv4 address: '$s'")
      acc = (acc << 8) | v
    }
    acc
  }

  /** CH isIPAddressInRange(addr, 'cidr'): true iff the address lies
    * in the CIDR block; both IPv4 and IPv6 forms, matched by family
    * (a v4 address is never inside a v6 block and vice versa —
    * CH's behavior). */
  def isIPAddressInRange(addr: UTF8String, cidr: UTF8String): Boolean = {
    val c = cidr.toString
    val slash = c.lastIndexOf('/')
    require(slash > 0, s"CIDR must look like 'base/prefix', got '$c'")
    val base = c.substring(0, slash)
    val prefix = c.substring(slash + 1).toInt
    val a = addr.toString
    val v6addr = a.contains(':')
    val v6base = base.contains(':')
    if (v6addr != v6base) return false
    if (v6addr) {
      require(prefix >= 0 && prefix <= 128, s"bad IPv6 prefix /$prefix")
      val ab = ChStrHelpers.ipv6StringToNum(addr)
      val bb = ChStrHelpers.ipv6StringToNum(UTF8String.fromString(base))
      var bit = 0
      while (bit < prefix) {
        val byteIdx = bit / 8
        val mask = 0x80 >> (bit % 8)
        if ((ab(byteIdx) & mask) != (bb(byteIdx) & mask)) return false
        bit += 1
      }
      true
    } else {
      require(prefix >= 0 && prefix <= 32, s"bad IPv4 prefix /$prefix")
      val shift = 32 - prefix
      (parseIpv4(a) >>> shift) == (parseIpv4(base) >>> shift)
    }
  }

  // ---- time-series kernels (CH series* family, public docs) ----

  private def toDoubles(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Double] = {
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      // refuse loudly: getDouble on a NULL slot silently reads 0.0,
      // which would corrupt Tukey fences / period detection instead
      // of surfacing the bad series
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"series contains NULL at position $i — series* kernels need " +
          "a dense array (filter or coalesce the input first)")
      xs(i) = arr.getDouble(i); i += 1
    }
    xs
  }

  /** Linear-interpolated quantile of a SORTED array (type 7, the
    * NumPy/CH default). */
  private def quantileOf(s: Array[Double], p: Double): Double = {
    val n = s.length
    if (n == 1) s(0)
    else {
      val pos = p * (n - 1)
      val lo = pos.toInt
      val hi = math.min(lo + 1, n - 1)
      val f = pos - lo
      s(lo) * (1 - f) + s(hi) * f
    }
  }

  /** seriesOutliersDetectTukey(series[, minQ, maxQ, k]): per-element
    * anomaly score — the signed distance past the Tukey fence
    * [Q(minQ) − k·IQR, Q(maxQ) + k·IQR], 0 inside it. */
  def seriesOutliersTukey(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      minQ: Double, maxQ: Double, k: Double):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val xs = toDoubles(arr)
    require(xs.nonEmpty, "seriesOutliersDetectTukey: empty series")
    val s = xs.sorted
    val q1 = quantileOf(s, minQ)
    val q3 = quantileOf(s, maxQ)
    val iqr = q3 - q1
    val loF = q1 - k * iqr
    val hiF = q3 + k * iqr
    val out = new Array[Any](xs.length)
    var i = 0
    while (i < xs.length) {
      val x = xs(i)
      out(i) = if (x < loF) x - loF else if (x > hiF) x - hiF else 0.0
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** seriesDecomposeSTL(series, period) → [seasonal, trend, residue,
    * baseline] (the CH return shape, public docs). DETERMINISTIC
    * classical decomposition in place of LOESS (documented deviation:
    * real STL runs robustness-weighted LOESS passes whose output is
    * implementation-defined; a library answer must be reproducible):
    *  - trend   = centered moving average, window `period` (half
    *    weights on both outer lags for an even period — the textbook
    *    2×m MA), shrinking symmetrically at the edges so the array
    *    keeps full length;
    *  - seasonal = per-phase mean of (x − trend), centered so one
    *    full period sums to 0;
    *  - residue = x − trend − seasonal; baseline = seasonal + trend. */
  def seriesDecomposeSTL(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      period: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val xs = toDoubles(arr)
    val n = xs.length
    require(period >= 2, s"seriesDecomposeSTL: period must be >= 2, got $period")
    require(n >= 2 * period,
      s"seriesDecomposeSTL: series length $n must be >= 2 * period ($period)")
    val half = period / 2
    val even = period % 2 == 0
    val trend = new Array[Double](n)
    var i = 0
    while (i < n) {
      // symmetric window radius shrinks near the edges
      val r = math.min(half, math.min(i, n - 1 - i))
      var s = 0.0
      var w = 0.0
      var j = i - r
      while (j <= i + r) {
        // textbook 2×m moving average: the two outermost lags of a
        // full even-period window carry half weight
        val wt = if (even && r == half && (j == i - r || j == i + r)) 0.5 else 1.0
        s += wt * xs(j); w += wt; j += 1
      }
      trend(i) = s / w
      i += 1
    }
    val phaseSum = new Array[Double](period)
    val phaseCnt = new Array[Long](period)
    i = 0
    while (i < n) {
      phaseSum(i % period) += xs(i) - trend(i)
      phaseCnt(i % period) += 1
      i += 1
    }
    val phase = Array.tabulate(period)(p => phaseSum(p) / phaseCnt(p))
    val phaseMean = phase.sum / period
    val seasonal = new Array[Any](n)
    val resid = new Array[Any](n)
    val baseline = new Array[Any](n)
    val trendOut = new Array[Any](n)
    i = 0
    while (i < n) {
      val se = phase(i % period) - phaseMean
      seasonal(i) = se
      trendOut(i) = trend(i)
      resid(i) = xs(i) - trend(i) - se
      baseline(i) = se + trend(i)
      i += 1
    }
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    new GenericArrayData(Array[Any](
      new GenericArrayData(seasonal), new GenericArrayData(trendOut),
      new GenericArrayData(resid), new GenericArrayData(baseline)))
  }

  /** seriesPeriodDetectFFT's contract (dominant period of the series,
    * Float64; 0 when none) spelled in the time domain: argmax of the
    * mean-centered autocorrelation over lags 2..n/2, each normalized
    * by its term count — deterministic and exact where an FFT
    * periodogram estimates; O(n²/4) per row, sized for the bounded
    * per-row series this family is called on (CH's own input is one
    * row's array, not a table). Smallest lag wins ties, so harmonics
    * (2p, 3p, …) never shadow the fundamental. */
  def seriesPeriodDetect(arr: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val xs = toDoubles(arr)
    val n = xs.length
    if (n < 4) return 0.0
    var mean = 0.0
    var i = 0
    while (i < n) { mean += xs(i); i += 1 }
    mean /= n
    val c = new Array[Double](n)
    i = 0
    while (i < n) { c(i) = xs(i) - mean; i += 1 }
    var bestLag = 0
    var bestR = 0.0
    var lag = 2
    while (lag <= n / 2) {
      var r = 0.0
      i = 0
      while (i + lag < n) { r += c(i) * c(i + lag); i += 1 }
      r /= (n - lag)
      if (r > bestR + 1e-12) { bestR = r; bestLag = lag }
      lag += 1
    }
    bestLag.toDouble
  }
}
