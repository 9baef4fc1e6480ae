package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CityHash102

/** Known-answer vectors for the CityHash v1.0.2 port (r15 advice: the
  * round-trip suites run the same Scala port on both sides, so a port
  * divergence would pass them while silently breaking interop with
  * real ClickHouse compressed files — the port's whole purpose).
  *
  * The expected values were produced by compiling the REFERENCE's own
  * vendored source (contrib/cityhash102/src/city.cc, the revision the
  * compressed-frame checksum pins) with g++ and hashing buffers
  * byte[i] = (i*131 + 7) & 0xff across the length classes that hit
  * every internal branch: 0–16 (HashLen16 paths), 17–32, 33–64, >64
  * loop, and the CityHash128 seed path (len < 16 vs ≥ 16). */
class CityHashKatSpec extends AnyFunSuite {

  private def buf(n: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((i * 131 + 7) & 0xff).toByte)

  // (len, lo, hi) printed by the reference binary (unsigned decimals)
  private val vectors: Seq[(Int, BigInt, BigInt)] = Seq(
    (0, BigInt("4463240938071824939"), BigInt("4374473821787594281")),
    (1, BigInt("10080563635350801984"), BigInt("408498549790809274")),
    (7, BigInt("4478884649629503391"), BigInt("6438447472850963146")),
    (15, BigInt("6826251675200753981"), BigInt("16308474999764036959")),
    (63, BigInt("10404216232599879193"), BigInt("911223970990741855")),
    (64, BigInt("12447919058967575186"), BigInt("6255410705856957547")),
    (127, BigInt("17297907157239912731"), BigInt("9780232414468194539")),
    (200, BigInt("3549210744199234264"), BigInt("2468854462598546545")),
    (1000, BigInt("2440510283479924331"), BigInt("11190431686268399595")))

  test("cityHash128 matches the reference binary on every length class") {
    vectors.foreach { case (n, lo, hi) =>
      val (gotLo, gotHi) = CityHash102.cityHash128(buf(n), 0, n)
      assert(BigInt(java.lang.Long.toUnsignedString(gotLo)) == lo,
        s"len $n lo: got ${java.lang.Long.toUnsignedString(gotLo)}")
      assert(BigInt(java.lang.Long.toUnsignedString(gotHi)) == hi,
        s"len $n hi: got ${java.lang.Long.toUnsignedString(gotHi)}")
    }
  }

  test("offset handling: hashing a slice equals hashing the copied slice") {
    val big = buf(300)
    val sliced = CityHash102.cityHash128(big, 37, 200)
    val copied = CityHash102.cityHash128(
      java.util.Arrays.copyOfRange(big, 37, 237), 0, 200)
    assert(sliced == copied)
  }
}
