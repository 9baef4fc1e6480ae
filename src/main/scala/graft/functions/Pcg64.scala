package graft.functions

/** pcg64 — the PCG family's setseq_xsl_rr_128_64 engine (M.E.
  * O'Neill, "PCG: A Family of Simple Fast Space-Efficient
  * Statistically Good Algorithms for Random Number Generation";
  * Apache-2.0/MIT). The reference vendors it at base/pcg-random and
  * obfuscateQueries.cpp:809 seeds one per alphabetic run
  * (`pcg64 rng(hash_func.get64())`), so matching its exact output
  * stream is what makes the obfuscated bytes equal the C++ binary's.
  *
  * Port of the integer-seed path (pcg_random.hpp:476-481, 405-429,
  * 993-1020):
  *  - state  = (seed + INC) * MUL + INC  over 128 bits
  *  - next(): state = state*MUL + INC, then emit
  *    rotr64(hi ^ lo, state >> 122) of the POST-advance state
  *    (output_previous is false for 128-bit engines)
  *  - MUL = PCG_DEFAULT_MULTIPLIER_128, INC = PCG_DEFAULT_INCREMENT_128
  *    (pcg_random.hpp:168-170)
  *
  * 128-bit arithmetic rides two longs (Math.multiplyHigh + carry
  * fix-up for the unsigned high product). Output pinned against the
  * reference's own vendored source compiled with g++
  * (ObfuscateQueriesSpec KAT vectors). */
final class Pcg64(seed: Long) {

  private[this] final val MulHi = 2549297995355413924L
  private[this] final val MulLo = 4865540595714422341L
  private[this] final val IncHi = 6364136223846793005L
  private[this] final val IncLo = 1442695040888963407L

  private[this] var hi: Long = 0L
  private[this] var lo: Long = 0L

  locally {
    // state = bump(seed + increment); the uint64 seed zero-extends
    val s = addInc(0L, seed)
    setBump(s._1, s._2)
  }

  /** unsigned high 64 bits of x*y (multiplyHigh is the signed high;
    * the two masked adds correct for operands with the top bit set). */
  private def unsignedMulHi(x: Long, y: Long): Long =
    Math.multiplyHigh(x, y) + ((x >> 63) & y) + ((y >> 63) & x)

  /** (ahi:alo) + INC, with carry. */
  private def addInc(ahi: Long, alo: Long): (Long, Long) = {
    val l = alo + IncLo
    val carry = if (java.lang.Long.compareUnsigned(l, alo) < 0) 1L else 0L
    (ahi + IncHi + carry, l)
  }

  /** state ← s * MUL + INC (mod 2^128). */
  private def setBump(shi: Long, slo: Long): Unit = {
    val plo = slo * MulLo
    val phi = unsignedMulHi(slo, MulLo) + shi * MulLo + slo * MulHi
    val (nhi, nlo) = addInc(phi, plo)
    hi = nhi; lo = nlo
  }

  /** Next 64-bit output (xsl_rr: xorshift-low then random rotate).
    * 128-bit engines have output_previous = FALSE (pcg_random.hpp's
    * setseq_base: sizeof(itype) <= 8), so the output comes from the
    * POST-advance state. */
  def nextLong(): Long = {
    setBump(hi, lo)
    val rot = ((hi >>> 58) & 63L).toInt // state >> (128-6)
    java.lang.Long.rotateRight(hi ^ lo, rot)
  }
}
