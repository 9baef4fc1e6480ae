package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Imperative string kernels for the round-10 dialect names whose
  * algorithms don't decompose into Catalyst folds (Jaro, base58,
  * punycode/IDNA, unicode normalization, IPv6 textual forms, 4-gram
  * similarity). Invoked through StaticInvoke (codegen'd call into the
  * static forwarders, null-propagating) — never a UDF. All algorithms
  * are the published public ones; reference surface:
  * src/Parsers/ASTFunction.h name registry.
  */
object ChStrHelpers {

  // ---- Jaro / Jaro-Winkler (standard published definition) ----

  def jaroSimilarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString; val t = b.toString
    if (s.isEmpty && t.isEmpty) return 1.0
    if (s.isEmpty || t.isEmpty) return 0.0
    val window = math.max(0, math.max(s.length, t.length) / 2 - 1)
    val sM = new Array[Boolean](s.length)
    val tM = new Array[Boolean](t.length)
    var matches = 0
    var i = 0
    while (i < s.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(t.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s.charAt(i) == t.charAt(j)) {
          sM(i) = true; tM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < s.length) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / s.length + m / t.length + (m - transpositions / 2.0) / m) / 3.0
  }

  def jaroWinklerSimilarity(a: UTF8String, b: UTF8String): Double = {
    val j = jaroSimilarity(a, b)
    val s = a.toString; val t = b.toString
    var prefix = 0
    while (prefix < math.min(math.min(s.length, t.length), 4) &&
      s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  // ---- base58 (bitcoin alphabet, public algorithm) ----

  private val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val B58Idx: Array[Int] = {
    val m = Array.fill(128)(-1)
    B58.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
    m
  }

  def base58Encode(in: UTF8String): UTF8String = {
    val bytes = in.getBytes
    if (bytes.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < bytes.length && bytes(zeros) == 0) zeros += 1
    var num = new java.math.BigInteger(1, bytes)
    val sb = new StringBuilder
    val fiftyEight = java.math.BigInteger.valueOf(58)
    while (num.signum() > 0) {
      val qr = num.divideAndRemainder(fiftyEight)
      sb.append(B58.charAt(qr(1).intValue()))
      num = qr(0)
    }
    (0 until zeros).foreach(_ => sb.append('1'))
    UTF8String.fromString(sb.reverseInPlace().toString)
  }

  def base58Decode(in: UTF8String): UTF8String = {
    val s = in.toString
    if (s.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < s.length && s.charAt(zeros) == '1') zeros += 1
    var num = java.math.BigInteger.ZERO
    val fiftyEight = java.math.BigInteger.valueOf(58)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val d = if (c < 128) B58Idx(c.toInt) else -1
      if (d < 0) throw new IllegalArgumentException(
        s"base58Decode: invalid character '$c'")
      num = num.multiply(fiftyEight).add(java.math.BigInteger.valueOf(d))
      i += 1
    }
    val raw = num.toByteArray
    // strip BigInteger's sign byte, restore leading zeros
    val start = if (raw.length > 1 && raw(0) == 0) 1 else 0
    val out = new Array[Byte](zeros + raw.length - start)
    System.arraycopy(raw, start, out, zeros, raw.length - start)
    UTF8String.fromBytes(out)
  }

  // ---- punycode (pure RFC 3492 — java.net.IDN's nameprep would
  //      lowercase, the reference's punycodeEncode is case-preserving)
  //      / IDNA (java.net.IDN; RFC 3490) ----

  private final val PunyBase = 36
  private final val PunyTMin = 1
  private final val PunyTMax = 26
  private final val PunySkew = 38
  private final val PunyDamp = 700
  private final val PunyInitialBias = 72
  private final val PunyInitialN = 128

  private def punyAdapt(delta0: Int, numPoints: Int,
      firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / PunyDamp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((PunyBase - PunyTMin) * PunyTMax) / 2) {
      delta /= PunyBase - PunyTMin
      k += PunyBase
    }
    k + ((PunyBase - PunyTMin + 1) * delta) / (delta + PunySkew)
  }

  private def punyDigitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def punyDigitVal(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else throw new IllegalArgumentException(
      s"punycodeDecode: invalid digit '$c'")

  def punycodeEncode(s: UTF8String): UTF8String = {
    val cps = s.toString.codePoints().toArray
    val sb = new StringBuilder
    cps.foreach(c => if (c < 0x80) sb.append(c.toChar))
    val b = sb.length
    var h = b
    if (b > 0 && b < cps.length) sb.append('-')
    var n = PunyInitialN
    var delta = 0
    var bias = PunyInitialBias
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      delta += (m - n) * (h + 1)
      n = m
      cps.foreach { c =>
        if (c < n) delta += 1
        else if (c == n) {
          var q = delta
          var k = PunyBase
          var done = false
          while (!done) {
            val t = if (k <= bias) PunyTMin
              else if (k >= bias + PunyTMax) PunyTMax else k - bias
            if (q < t) done = true
            else {
              sb.append(punyDigitChar(t + (q - t) % (PunyBase - t)))
              q = (q - t) / (PunyBase - t)
              k += PunyBase
            }
          }
          sb.append(punyDigitChar(q))
          bias = punyAdapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def punycodeDecode(s: UTF8String): UTF8String = {
    val in = s.toString
    val d = in.lastIndexOf('-')
    val out = new java.util.ArrayList[Integer]()
    (0 until math.max(d, 0)).foreach(i => out.add(in.charAt(i).toInt))
    var n = PunyInitialN
    var i = 0
    var bias = PunyInitialBias
    var pos = if (d >= 0) d + 1 else 0
    while (pos < in.length) {
      val oldi = i
      var w = 1
      var k = PunyBase
      var done = false
      while (!done) {
        if (pos >= in.length) throw new IllegalArgumentException(
          "punycodeDecode: truncated input")
        val digit = punyDigitVal(in.charAt(pos)); pos += 1
        i += digit * w
        val t = if (k <= bias) PunyTMin
          else if (k >= bias + PunyTMax) PunyTMax else k - bias
        if (digit < t) done = true
        else { w *= PunyBase - t; k += PunyBase }
      }
      bias = punyAdapt(i - oldi, out.size() + 1, oldi == 0)
      n += i / (out.size() + 1)
      i %= out.size() + 1
      out.add(i, n)
      i += 1
    }
    val sb = new StringBuilder
    out.forEach(cp => sb.appendAll(Character.toChars(cp)))
    UTF8String.fromString(sb.toString)
  }

  def idnaEncode(s: UTF8String): UTF8String =
    UTF8String.fromString(java.net.IDN.toASCII(s.toString,
      java.net.IDN.ALLOW_UNASSIGNED))

  def idnaDecode(s: UTF8String): UTF8String =
    UTF8String.fromString(java.net.IDN.toUnicode(s.toString,
      java.net.IDN.ALLOW_UNASSIGNED))

  // ---- unicode normalization ----

  def normalizeNFC(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  def normalizeNFD(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD))

  def normalizeNFKC(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKC))

  def normalizeNFKD(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKD))

  // ---- IPv6 textual forms (RFC 4291/5952; own parser — no
  //      InetAddress.getByName, which would fall back to DNS) ----

  /** 16-byte address from its textual form; throws on invalid. */
  def ipv6StringToNum(s: UTF8String): Array[Byte] = {
    val out = parseIpv6(s.toString)
    if (out == null) throw new IllegalArgumentException(
      s"ipv6StringToNum: invalid IPv6 '$s'")
    out
  }

  def isIPv6String(s: UTF8String): Boolean = parseIpv6(s.toString) != null

  private def parseIpv6(str: String): Array[Byte] = {
    var s = str
    if (s == null || s.isEmpty) return null
    // embedded IPv4 tail (::ffff:1.2.3.4)
    var v4: Array[Int] = null
    val lastColon = s.lastIndexOf(':')
    if (lastColon >= 0 && s.indexOf('.', lastColon) > 0) {
      val tail = s.substring(lastColon + 1)
      val parts = tail.split("\\.", -1)
      if (parts.length != 4) return null
      v4 = new Array[Int](4)
      var i = 0
      while (i < 4) {
        try {
          v4(i) = Integer.parseInt(parts(i))
          if (v4(i) < 0 || v4(i) > 255 || (parts(i).length > 1 &&
            parts(i).charAt(0) == '0')) return null
        } catch { case _: NumberFormatException => return null }
        i += 1
      }
      s = s.substring(0, lastColon + 1) + "0:0" // placeholder 2 groups
    }
    val dcol = s.indexOf("::")
    if (dcol != s.lastIndexOf("::")) return null
    def groups(part: String): Array[Int] = {
      if (part.isEmpty) return Array.empty
      val gs = part.split(":", -1)
      val out = new Array[Int](gs.length)
      var i = 0
      while (i < gs.length) {
        val g = gs(i)
        if (g.isEmpty || g.length > 4) return null
        try out(i) = Integer.parseInt(g, 16)
        catch { case _: NumberFormatException => return null }
        i += 1
      }
      out
    }
    val all: Array[Int] =
      if (dcol >= 0) {
        val left = groups(s.substring(0, dcol))
        val right = groups(s.substring(dcol + 2))
        if (left == null || right == null) return null
        if (left.length + right.length > 7) return null
        left ++ Array.fill(8 - left.length - right.length)(0) ++ right
      } else {
        val g = groups(s)
        if (g == null || g.length != 8) return null
        g
      }
    if (all.length != 8) return null
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = ((all(i) >> 8) & 0xFF).toByte
      out(2 * i + 1) = (all(i) & 0xFF).toByte
      i += 1
    }
    if (v4 != null) {
      out(12) = v4(0).toByte; out(13) = v4(1).toByte
      out(14) = v4(2).toByte; out(15) = v4(3).toByte
    }
    out
  }

  /** RFC 5952 canonical text of a 16-byte address (longest zero run
    * compressed, lowercase hex, v4-mapped tail rendered dotted). */
  def ipv6NumToString(bytes: Array[Byte]): UTF8String = {
    require(bytes.length == 16,
      s"ipv6NumToString: need 16 bytes, got ${bytes.length}")
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) {
      g(i) = ((bytes(2 * i) & 0xFF) << 8) | (bytes(2 * i + 1) & 0xFF)
      i += 1
    }
    // v4-mapped ::ffff:a.b.c.d
    if (g(0) == 0 && g(1) == 0 && g(2) == 0 && g(3) == 0 && g(4) == 0 &&
      g(5) == 0xFFFF) {
      return UTF8String.fromString(
        s"::ffff:${bytes(12) & 0xFF}.${bytes(13) & 0xFF}." +
          s"${bytes(14) & 0xFF}.${bytes(15) & 0xFF}")
    }
    // longest zero run (≥ 2) for ::
    var bestStart = -1; var bestLen = 0
    var runStart = -1; var runLen = 0
    i = 0
    while (i < 8) {
      if (g(i) == 0) {
        if (runStart < 0) { runStart = i; runLen = 0 }
        runLen += 1
        if (runLen > bestLen && runLen >= 2) {
          bestLen = runLen; bestStart = runStart
        }
      } else { runStart = -1; runLen = 0 }
      i += 1
    }
    val sb = new StringBuilder
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append(if (i == 0) "::" else ":")
        i += bestLen
      } else {
        sb.append(java.lang.Integer.toHexString(g(i)))
        if (i != 7) sb.append(':')
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** toIPv6(text): parse IPv6, or map dotted IPv4 to ::ffff:a.b.c.d. */
  def toIPv6(s: UTF8String): Array[Byte] = {
    val str = s.toString
    val asV6 = parseIpv6(str)
    if (asV6 != null) return asV6
    val parts = str.split("\\.", -1)
    if (parts.length == 4) {
      val out = new Array[Byte](16)
      out(10) = 0xFF.toByte; out(11) = 0xFF.toByte
      var i = 0
      while (i < 4) {
        val v = try Integer.parseInt(parts(i))
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"toIPv6: invalid '$str'")
        }
        if (v < 0 || v > 255)
          throw new IllegalArgumentException(s"toIPv6: invalid '$str'")
        out(12 + i) = v.toByte
        i += 1
      }
      return out
    }
    throw new IllegalArgumentException(s"toIPv6: invalid '$str'")
  }

  /** (first, last) 16-byte addresses of an IPv6 CIDR block. */
  def ipv6CidrLow(bytes: Array[Byte], prefix: Int): Array[Byte] =
    cidrBound(bytes, prefix, high = false)
  def ipv6CidrHigh(bytes: Array[Byte], prefix: Int): Array[Byte] =
    cidrBound(bytes, prefix, high = true)

  private def cidrBound(bytes: Array[Byte], prefix: Int,
      high: Boolean): Array[Byte] = {
    require(bytes.length == 16, "ipv6CIDR: need 16 bytes")
    val p = math.max(0, math.min(128, prefix))
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      val bitsHere = math.max(0, math.min(8, p - 8 * i))
      val mask = (0xFF << (8 - bitsHere)) & 0xFF
      out(i) =
        if (high) ((bytes(i) & mask) | (~mask & 0xFF)).toByte
        else (bytes(i) & mask).toByte
      i += 1
    }
    out
  }

  // ---- reinterpret / FixedString (the reference's raw-byte casts;
  //      little-endian, the DataTypeFixedString/reinterpret contract) ----

  def reinterpretAsUInt64(s: UTF8String): org.apache.spark.sql.types.Decimal = {
    val b = s.getBytes
    var v = java.math.BigInteger.ZERO
    var i = math.min(b.length, 8) - 1
    while (i >= 0) {
      v = v.shiftLeft(8).or(java.math.BigInteger.valueOf(b(i) & 0xFFL))
      i -= 1
    }
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(v), 20, 0)
  }

  def reinterpretAsUInt32(s: UTF8String): Long = {
    val b = s.getBytes
    var v = 0L
    var i = math.min(b.length, 4) - 1
    while (i >= 0) { v = (v << 8) | (b(i) & 0xFFL); i -= 1 }
    v
  }

  /** little-endian bytes of the value, trailing zero bytes trimmed */
  def reinterpretAsString(v: Long): UTF8String = {
    var n = 8
    while (n > 0 && ((v >>> ((n - 1) * 8)) & 0xFF) == 0) n -= 1
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((v >>> (i * 8)) & 0xFF).toByte; i += 1 }
    UTF8String.fromBytes(out)
  }

  def toFixedString(s: UTF8String, n: Int): UTF8String = {
    val b = s.getBytes
    if (b.length > n) throw new IllegalArgumentException(
      s"toFixedString: value longer than $n bytes")
    val out = new Array[Byte](n)
    System.arraycopy(b, 0, out, 0, b.length)
    UTF8String.fromBytes(out)
  }

  def toStringCutToZero(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    while (i < b.length && b(i) != 0) i += 1
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, 0, i))
  }

  // ---- ULID (Crockford base32; public spec) ----

  private val Crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  private val CrockfordIdx: Array[Int] = {
    val m = Array.fill(128)(-1)
    Crockford.zipWithIndex.foreach { case (c, i) =>
      m(c.toInt) = i; m(c.toLower.toInt) = i
    }
    // decode aliases per spec
    Seq('I' -> 1, 'i' -> 1, 'L' -> 1, 'l' -> 1, 'O' -> 0, 'o' -> 0)
      .foreach { case (c, v) => m(c.toInt) = v }
    m
  }

  def generateULID(): UTF8String = {
    val ms = System.currentTimeMillis()
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val chars = new Array[Char](26)
    var t = ms
    var i = 9
    while (i >= 0) { chars(i) = Crockford((t & 31).toInt); t >>>= 5; i -= 1 }
    i = 10
    while (i < 26) { chars(i) = Crockford(rnd.nextInt(32)); i += 1 }
    UTF8String.fromString(new String(chars))
  }

  /** unix millis from the 10-char time prefix of a ULID */
  def ulidMillis(s: UTF8String): Long = {
    val str = s.toString
    if (str.length < 10) throw new IllegalArgumentException(
      s"ULIDStringToDateTime: '$str' too short")
    var v = 0L
    var i = 0
    while (i < 10) {
      val c = str.charAt(i)
      val d = if (c < 128) CrockfordIdx(c.toInt) else -1
      if (d < 0) throw new IllegalArgumentException(
        s"ULIDStringToDateTime: invalid character '$c'")
      v = (v << 5) | d
      i += 1
    }
    v
  }

  // ---- host / system introspection ----

  def hostName(): UTF8String =
    UTF8String.fromString(
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: java.net.UnknownHostException => "localhost" })

  def fullHostName(): UTF8String =
    UTF8String.fromString(
      try java.net.InetAddress.getLocalHost.getCanonicalHostName
      catch { case _: java.net.UnknownHostException => "localhost" })

  def uptimeSeconds(): Long =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1000L

  // ---- 4-gram similarity (the reference's ngramDistance/Search) ----

  private def grams4(s: String): java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i + 4 <= s.length) {
      // pack 4 UTF-16 units' low bytes — the reference hashes raw
      // bytes; char-level packing keeps unicode pairs distinct enough
      val key: Integer =
        (s.charAt(i) * 31 * 31 * 31 + s.charAt(i + 1) * 31 * 31 +
          s.charAt(i + 2) * 31 + s.charAt(i + 3)).hashCode()
      m.merge(key, 1, (a, b) => a + b)
      i += 1
    }
    m
  }

  /** symmetric 4-gram multiset difference / total gram count ∈ [0,1];
    * 0 = identical gram profile. */
  def ngramDistance(a: UTF8String, b: UTF8String): Double = {
    val ga = grams4(a.toString); val gb = grams4(b.toString)
    var total = 0; var symdiff = 0
    val it = ga.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cb = gb.getOrDefault(e.getKey, 0)
      total += e.getValue + cb
      symdiff += math.abs(e.getValue - cb)
      if (cb > 0) gb.remove(e.getKey)
    }
    val it2 = gb.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      total += e.getValue; symdiff += e.getValue
    }
    if (total == 0) 0.0 else symdiff.toDouble / total
  }

  /** non-symmetric: fraction of needle 4-grams found in the haystack
    * (1 = every needle gram present — "needle likely in haystack"). */
  def ngramSearch(haystack: UTF8String, needle: UTF8String): Double = {
    val gh = grams4(haystack.toString); val gn = grams4(needle.toString)
    var nTotal = 0; var found = 0
    val it = gn.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      nTotal += e.getValue
      found += math.min(e.getValue, gh.getOrDefault(e.getKey, 0))
    }
    if (nTotal == 0) 0.0 else found.toDouble / nTotal
  }

  /** Deflate-compressed byte count of the UTF-8 text (zlib level 6,
    * the default) — the "compressibility" quality signal (DCLM /
    * RefinedWeb use the compression ratio to flag boilerplate and
    * repetition: highly repetitive text compresses far below normal
    * prose). Deterministic for a given zlib; consumed by the
    * rows-only t19 key and its spec, never a cross-engine oracle. */
  def deflateSize(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Single left-to-right reversal of the Escaped serialization rule
    * — the full set the reference's writeEscapedString emits
    * (\b \f \n \r \t \0 \' \\), since this reader is also the
    * adoption path for reference-written TSV/Template files. A
    * pairwise replace chain is order-sensitive: a value holding a
    * literal backslash followed by 'n' serializes as \\n and must
    * unescape back to backslash+'n', not to a newline. Backslash
    * sequences the writer never emits pass through unchanged. */
  def unescapeEscaped(s: UTF8String): UTF8String = {
    val in = s.toString
    if (in.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      if (c == '\\' && i + 1 < in.length) {
        in.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '0' => sb.append('\u0000'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- r11 edit-distance tail ----

  /** Damerau–Levenshtein, optimal-string-alignment variant (the
    * published DP with adjacent transposition — the same variant the
    * reference's damerauLevenshteinDistance documents), over
    * codepoints. */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString; val t = b.toString
    val m = s.codePointCount(0, s.length)
    val n = t.codePointCount(0, t.length)
    val sc = s.codePoints().toArray
    val tc = t.codePoints().toArray
    val d = Array.ofDim[Int](m + 1, n + 1)
    var i = 0
    while (i <= m) { d(i)(0) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j) = j; j += 1 }
    i = 1
    while (i <= m) {
      j = 1
      while (j <= n) {
        val cost = if (sc(i - 1) == tc(j - 1)) 0 else 1
        var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && sc(i - 1) == tc(j - 2) && sc(i - 2) == tc(j - 1))
          v = math.min(v, d(i - 2)(j - 2) + 1)
        d(i)(j) = v
        j += 1
      }
      i += 1
    }
    d(m)(n)
  }

  /** Byte Hamming distance: differing bytes over the common prefix
    * plus the length difference (the reference's mismatch contract
    * for unequal lengths). */
  def byteHamming(a: UTF8String, b: UTF8String): Int = {
    val x = a.getBytes; val y = b.getBytes
    val min = math.min(x.length, y.length)
    var c = math.abs(x.length - y.length)
    var i = 0
    while (i < min) { if (x(i) != y(i)) c += 1; i += 1 }
    c
  }

  /** cutIPv6(bytes16, bytesToCutForIPv6, bytesToCutForIPv4): zero the
    * trailing bytes — the v4 count for ::ffff:a.b.c.d-mapped
    * addresses, the v6 count otherwise — and render the textual form
    * (reference semantics for IP anonymization). */
  def cutIPv6(bytes: Array[Byte], cutV6: Int, cutV4: Int): UTF8String = {
    if (bytes == null || bytes.length != 16) return null
    val mapped = bytes.take(10).forall(_ == 0) &&
      bytes(10) == -1 && bytes(11) == -1
    val cut = math.max(0, math.min(16, if (mapped) cutV4 else cutV6))
    val out = bytes.clone()
    var i = 16 - cut
    while (i < 16) { out(i) = 0; i += 1 }
    ipv6NumToString(out)
  }

  // ---- base32 (RFC 4648, padded, upper-case alphabet) ----

  private val b32Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  def base32Encode(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val sb = new java.lang.StringBuilder((in.length * 8 + 4) / 5)
    var buf = 0L
    var bits = 0
    for (b <- in) {
      buf = (buf << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) {
        sb.append(b32Alphabet(((buf >> (bits - 5)) & 31).toInt))
        bits -= 5
      }
    }
    if (bits > 0) sb.append(b32Alphabet(((buf << (5 - bits)) & 31).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    UTF8String.fromString(sb.toString)
  }

  /** NULL on any character outside the alphabet (after '='-padding
    * strip) — the library-style degradation for bad input. */
  def base32Decode(s: UTF8String): UTF8String = {
    val raw = s.toString.toUpperCase.reverse.dropWhile(_ == '=').reverse
    val out = new java.io.ByteArrayOutputStream()
    var buf = 0L
    var bits = 0
    for (c <- raw) {
      val v = b32Alphabet.indexOf(c)
      if (v < 0) return null
      buf = (buf << 5) | v
      bits += 5
      if (bits >= 8) {
        out.write(((buf >> (bits - 8)) & 0xff).toInt)
        bits -= 8
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  // ---- SQL/JSON JSON_QUERY (reference src/Functions/FunctionSQLJSON
  // semantics: matches come back wrapped in a JSON ARRAY, strings
  // re-quoted — unlike JSON_VALUE's bare scalar) ----

  private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Leaf paths of a JSON document ('a.b.c' dotted): objects recurse,
    * anything else (scalar, array, null) is a leaf — the JSON-type
    * introspection contract behind distinctJSONPaths. Non-object
    * roots and malformed documents yield no paths. */
  def jsonPaths(doc: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    import scala.jdk.CollectionConverters._
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    try {
      val root = jsonMapper.readTree(doc.toString)
      def walk(node: com.fasterxml.jackson.databind.JsonNode,
          prefix: String): Unit =
        node.properties().asScala.foreach { e =>
          val p = if (prefix.isEmpty) e.getKey else prefix + "." + e.getKey
          if (e.getValue.isObject) walk(e.getValue, p)
          else out += UTF8String.fromString(p)
        }
      if (root != null && root.isObject) walk(root, "")
    } catch {
      case _: Exception => ()
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** JSON_QUERY(doc, '$.a.b[0]') → '[<match>,…]' with each match
    * serialized as JSON (so '{"a":{"b":7}}' → '[7]' and a string
    * value comes back quoted). Supported path subset: '$', '.name',
    * '[n]', '[*]', '.*' — wildcards fan out in document order.
    * NULL on malformed JSON, unsupported path syntax, or no match
    * (the reference returns '' on no match; NULL composes with SQL
    * the way the JSON_VALUE alias already does — documented). */
  def jsonQuery(doc: UTF8String, path: UTF8String): UTF8String = {
    import com.fasterxml.jackson.databind.JsonNode
    import scala.jdk.CollectionConverters._
    try {
      val root = jsonMapper.readTree(doc.toString)
      val p = path.toString.trim
      if (!p.startsWith("$")) return null
      val tok = "\\.([A-Za-z_][A-Za-z0-9_]*)|\\[(\\d+)\\]|\\[\\*\\]|\\.\\*".r
      var idx = 1
      var nodes: List[JsonNode] = List(root)
      while (idx < p.length) {
        tok.findPrefixMatchOf(p.substring(idx)) match {
          case Some(m) =>
            val step = m.matched
            nodes = nodes.flatMap { n =>
              if (step == "[*]" || step == ".*")
                n.elements().asScala.toList
              else if (m.group(1) != null)
                Option(n.get(m.group(1))).toList
              else Option(n.get(m.group(2).toInt)).toList
            }
            idx += m.end
          case None => return null // unsupported path syntax
        }
      }
      if (nodes.isEmpty) null
      else UTF8String.fromString(
        nodes.map(jsonMapper.writeValueAsString).mkString("[", ",", "]"))
    } catch {
      case _: Exception => null
    }
  }

  // ---------- geohash (public algorithm: base-32 interleaved
  // bisection, lon first) ----------

  private val geohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Compiled geohashEncode: the bisection fold in closed form — the
    * k lon bits are the top bits of floor((lon+180)/360·2^k) (every
    * bisection midpoint is an exact dyadic double, so the scaled
    * floor selects the same cell), interleaved lon-first and rendered
    * base-32. Replaces a 5·p-step interpreted HOF fold per row;
    * GeoHashKernelSpec pins it against a plain-Scala bisection
    * reference over a deterministic sweep. */
  def geohashEncode(lon: Double, lat: Double, p: Int): UTF8String = {
    val lonBits = (5 * p + 1) / 2
    val latBits = 5 * p / 2
    def cell(x: Double, lo: Double, span: Double, bits: Int): Long = {
      val scaled = math.floor((x - lo) / span * (1L << bits).toDouble).toLong
      math.max(0L, math.min((1L << bits) - 1, scaled))
    }
    val li = cell(lon, -180.0, 360.0, lonBits)
    val ai = cell(lat, -90.0, 180.0, latBits)
    var v = 0L
    var j = 0
    while (j < lonBits) {
      v |= ((li >> (lonBits - 1 - j)) & 1L) << (5 * p - 1 - 2 * j); j += 1
    }
    j = 0
    while (j < latBits) {
      v |= ((ai >> (latBits - 1 - j)) & 1L) << (5 * p - 2 - 2 * j); j += 1
    }
    val out = new Array[Char](p)
    var c = 0
    while (c < p) {
      out(c) = geohashAlphabet.charAt(((v >> (5 * (p - 1 - c))) & 31L).toInt)
      c += 1
    }
    UTF8String.fromString(new String(out))
  }
}
