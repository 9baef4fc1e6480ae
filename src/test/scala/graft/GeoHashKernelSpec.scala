package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ChStrHelpers

/** The compiled geohashEncode kernel vs a plain-Scala bisection
  * reference (the textbook algorithm the pre-r14 Catalyst fold
  * spelled), plus the public test vectors. */
class GeoHashKernelSpec extends AnyFunSuite {

  /** Reference: iterative double-midpoint bisection, lon first. */
  private def reference(lon: Double, lat: Double, p: Int): String = {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    val sb = new StringBuilder
    var bit = 0
    var ch = 0
    var isLon = true
    while (sb.length < p) {
      val b =
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { lonLo = mid; 1 } else { lonHi = mid; 0 }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { latLo = mid; 1 } else { latHi = mid; 0 }
        }
      isLon = !isLon
      ch = (ch << 1) | b
      bit += 1
      if (bit == 5) { sb.append(alphabet.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  test("kernel ≡ bisection reference over a deterministic sweep, p = 1..12") {
    var i = 0
    while (i < 4000) {
      // a decorrelated sweep that stays clear of exact cell edges
      val lon = ((i * 2654435761L % 3600000L) / 10000.0) - 180.0 + 0.000137
      val lat = ((i * 40503L % 1800000L) / 10000.0) - 90.0 + 0.000071
      val p = 1 + (i % 12)
      val got = ChStrHelpers.geohashEncode(lon, lat, p).toString
      val exp = reference(lon, lat, p)
      assert(got == exp, s"($lon, $lat, $p): kernel=$got ref=$exp")
      i += 1
    }
  }

  test("public test vectors and poles/corners") {
    // the classic example: (lat 42.605, lon -5.603) → ezs42
    assert(ChStrHelpers.geohashEncode(-5.60302734375, 42.60498046875, 5)
      .toString == "ezs42")
    // Palermo from the Redis/geohash docs family
    assert(ChStrHelpers.geohashEncode(13.361389, 38.115556, 4)
      .toString == reference(13.361389, 38.115556, 4))
    // domain corners clamp into the last cell instead of overflowing
    assert(ChStrHelpers.geohashEncode(180.0, 90.0, 6).toString ==
      "z" * 6)
    assert(ChStrHelpers.geohashEncode(-180.0, -90.0, 6).toString ==
      "0" * 6)
  }
}
