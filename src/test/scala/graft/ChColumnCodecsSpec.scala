package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ChColumnCodecs, CompressedFrames}
import graft.sources.CompressedFrames.Codec

/** Byte-level KATs for the specialized column codecs, pinned against
  * the worked examples in the reference's OWN doc comments
  * (CompressionCodecDoubleDelta.cpp:157-186,
  * CompressionCodecGorilla.cpp:58-101) — if our bit stream differs
  * from the reference's in any bit, these fail. */
class ChColumnCodecsSpec extends AnyFunSuite {

  private def le(v: Long, w: Int): Seq[Byte] =
    (0 until w).map(i => ((v >>> (8 * i)) & 0xff).toByte)

  test("DoubleDelta KAT: UInt8 [1..10] encodes to the reference's documented bytes") {
    val src = (1 to 10).map(_.toByte).toArray
    val got = ChColumnCodecs.doubleDeltaCompress(src, 1)
    // [width][skip] + \x0a\x00\x00\x00 \x01 \x01 \x00 (doc example)
    val want = Array[Int](0x01, 0x00, 0x0a, 0x00, 0x00, 0x00,
      0x01, 0x01, 0x00).map(_.toByte)
    assert(got.toSeq == want.toSeq, got.map(b => f"$b%02x").mkString(" "))
    assert(ChColumnCodecs.doubleDeltaDecompress(got, 0, got.length,
      src.length).toSeq == src.toSeq)
  }

  test("DoubleDelta KAT: Int16 [-10,10,-20,20,-40,40] encodes to the documented bytes") {
    val vals = Seq(-10, 10, -20, 20, -40, 40)
    val src = vals.flatMap(v => le(v.toLong & 0xffffL, 2)).toArray
    val got = ChColumnCodecs.doubleDeltaCompress(src, 2)
    // \x06\x00\x00\x00 \xf6\xff \x14\x00 \xb8\xe2\x2e\xb1\xe4\x58
    val want = Array[Int](0x02, 0x00, 0x06, 0x00, 0x00, 0x00,
      0xf6, 0xff, 0x14, 0x00, 0xb8, 0xe2, 0x2e, 0xb1, 0xe4, 0x58)
      .map(_.toByte)
    assert(got.toSeq == want.toSeq, got.map(b => f"$b%02x").mkString(" "))
    assert(ChColumnCodecs.doubleDeltaDecompress(got, 0, got.length,
      src.length).toSeq == src.toSeq)
  }

  test("Gorilla KAT: Float32 [0.1,0.1,0.11,0.2,0.1] encodes to the documented bytes") {
    val vals = Seq(0.1f, 0.1f, 0.11f, 0.2f, 0.1f)
    val src = vals.flatMap(v =>
      le(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL, 4)).toArray
    val got = ChColumnCodecs.gorillaCompress(src, 4)
    val want = Array[Int](0x04, 0x00, 0x05, 0x00, 0x00, 0x00,
      0xcd, 0xcc, 0xcc, 0x3d,
      0x6a, 0x5a, 0xd8, 0xb6, 0x3c, 0xcd, 0x75, 0xb1, 0x6c, 0x77,
      0x00, 0x00, 0x00).map(_.toByte)
    assert(got.toSeq == want.toSeq, got.map(b => f"$b%02x").mkString(" "))
    assert(ChColumnCodecs.gorillaDecompress(got, 0, got.length,
      src.length).toSeq == src.toSeq)
  }

  test("Delta payload layout: [width][skip][raw skip bytes][deltas]") {
    // 2-byte width over 7 bytes: 1 skip byte + 3 deltas
    val src = Array[Byte](9, 1, 0, 3, 0, 2, 0) // skip=9, then 1, 3, 2
    val got = ChColumnCodecs.deltaCompress(src, 2)
    assert((got(0) & 0xff) == 2 && (got(1) & 0xff) == 1 && got(2) == 9)
    // deltas: 1, 3-1=2, 2-3=-1 (as u16 0xffff)
    assert(got.drop(3).toSeq == Seq[Byte](1, 0, 2, 0, -1, -1))
    assert(ChColumnCodecs.deltaDecompress(got, 0, got.length, 7).toSeq
      == src.toSeq)
  }

  test("round trips at every width, with unaligned tails and extreme values") {
    val rnd = new scala.util.Random(42)
    for (w <- Seq(1, 2, 4, 8); n <- Seq(0, 1, 2, 3, 17, 256)) {
      val len = n * w + (if (n % 2 == 1) w / 2 else 0) // sometimes unaligned
      val src = new Array[Byte](len)
      rnd.nextBytes(src)
      // plant extremes to cross the sign/prefix boundaries
      if (len >= 2 * w) {
        java.util.Arrays.fill(src, 0, w, 0xff.toByte)
        java.util.Arrays.fill(src, w, 2 * w, 0x80.toByte)
      }
      for ((name, comp, deco) <- Seq[(String,
          (Array[Byte], Int) => Array[Byte],
          (Array[Byte], Int, Int, Int) => Array[Byte])](
        ("delta", ChColumnCodecs.deltaCompress,
          ChColumnCodecs.deltaDecompress),
        ("doubledelta", ChColumnCodecs.doubleDeltaCompress,
          ChColumnCodecs.doubleDeltaDecompress),
        ("gorilla", ChColumnCodecs.gorillaCompress,
          ChColumnCodecs.gorillaDecompress))) {
        val enc = comp(src, w)
        val back = deco(enc, 0, enc.length, src.length)
        assert(back.toSeq == src.toSeq, s"$name w=$w n=$n")
      }
    }
  }

  test("monotonic sequences: DoubleDelta compresses them, round-trips exactly") {
    // the codec's design target: near-constant stride timestamps
    val ts = (0 until 4096).map(i => 1700000000L + i * 15L + (i % 7))
    val src = ts.flatMap(v => le(v, 8)).toArray
    val enc = ChColumnCodecs.doubleDeltaCompress(src, 8)
    assert(enc.length < src.length / 4,
      s"no compression win: ${enc.length} vs ${src.length}")
    assert(ChColumnCodecs.doubleDeltaDecompress(enc, 0, enc.length,
      src.length).toSeq == src.toSeq)
  }

  test("CODEC chains frame as the reference's Multiple (0x91) and round-trip") {
    val raw = (0 until 4096).flatMap(i => le(1000L + i * 3, 8)).toArray
    val chain = Seq(Codec(CompressedFrames.MethodDelta, 8),
      Codec(CompressedFrames.MethodZstd))
    val block = CompressedFrames.compressBlock(chain, raw)
    // outer header: method 0x91, then payload = [2][0x92][0x90][nested]
    assert((block(0) & 0xff) == 0x91, f"${block(0)}%02x")
    assert((block(9) & 0xff) == 2)
    assert((block(10) & 0xff) == 0x92 && (block(11) & 0xff) == 0x90)
    // nested layer is the LAST codec's frame (zstd)
    assert((block(12) & 0xff) == 0x90)
    val back = CompressedFrames.decompressBlock(block, 0, block.length)
    assert(back.toSeq == raw.toSeq)
    // a wrong method in the declared list is caught
    val bad = block.clone()
    bad(10) = 0x95.toByte
    val e = intercept[IllegalArgumentException] {
      CompressedFrames.decompressBlock(bad, 0, bad.length)
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
  }

  test("T64 KAT: UInt8 [3,1,2] crops to two bit rows (hand-derived from the format)") {
    // min=1 max=3 → min^max=2 → num_bits=2; byte variant bit-transposes
    // the single partial byte plane: row0 = bits0 of [3,1,2] = 0b011,
    // row1 = bits1 = 0b101
    val src = Array[Byte](3, 1, 2)
    val got = ChColumnCodecs.t64Compress(src, magic = 1)
    val want = (Seq(0x01.toByte) ++ le(1L, 8) ++ le(3L, 8) ++
      le(3L, 8) ++ le(5L, 8))
    assert(got.toSeq == want, got.map(b => f"$b%02x").mkString(" "))
    assert(ChColumnCodecs.t64Decompress(got, 0, got.length, 3).toSeq
      == src.toSeq)
  }

  test("T64 round-trips: widths, signed zero-crossing, both variants, multi-block") {
    val rnd = new scala.util.Random(7)
    for ((magic, w) <- Seq(1 -> 1, 2 -> 2, 3 -> 4, 4 -> 8,
        6 -> 1, 7 -> 2, 8 -> 4, 9 -> 8);
        bit <- Seq(false, true)) {
      // values clustered around zero: exercises the signed
      // zero-crossing sign-bit path for the Int magics
      val n = 200 // 3 blocks + tail
      val src = new Array[Byte](n * w)
      for (i <- 0 until n) {
        val v = (rnd.nextInt(4000) - 2000).toLong
        for (b <- 0 until w)
          src(i * w + b) = ((v >>> (8 * b)) & 0xff).toByte
      }
      val enc = ChColumnCodecs.t64Compress(src, magic, bit)
      val back = ChColumnCodecs.t64Decompress(enc, 0, enc.length, src.length)
      assert(back.toSeq == src.toSeq, s"magic=$magic bit=$bit")
      // small signed range → real cropping win over the raw bytes
      // (unsigned magics see negatives as near-2^64 values: num_bits
      // stays the full width there, correctly — no win expected)
      if (w >= 4 && magic >= 6) assert(enc.length < src.length,
        s"no cropping win: magic=$magic ${enc.length} vs ${src.length}")
    }
    // constant column → num_bits 0, header only
    val const = Array.fill(64 * 8)(0x2a.toByte)
    val enc = ChColumnCodecs.t64Compress(const, magic = 4)
    assert(enc.length == 17, s"${enc.length}")
    assert(ChColumnCodecs.t64Decompress(enc, 0, enc.length,
      const.length).toSeq == const.toSeq)
  }

  test("T64 frames adopt through the frame reader; writing refuses with guidance") {
    // a hand-framed T64 block (what a reference-written file carries)
    // decodes through decompressBlock
    val src = (0 until 100).flatMap(i => le(10000L + i * 3, 8)).toArray
    val payload = ChColumnCodecs.t64Compress(src, magic = 4)
    val block = new Array[Byte](9 + payload.length)
    val bb = java.nio.ByteBuffer.wrap(block)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0x93.toByte).putInt(9 + payload.length).putInt(src.length)
    bb.put(payload)
    assert(CompressedFrames.decompressBlock(block, 0, block.length).toSeq
      == src.toSeq)
    // the write side refuses: T64 framing is column-typed
    val e = intercept[IllegalArgumentException] {
      CompressedFrames.parseChain("t64")
    }
    assert(e.getMessage.contains("column-typed"), e.getMessage)
    // a bad width refuses AT PARSE TIME — before any output file is
    // created (r17 review: late validation left a partial file)
    val e2 = intercept[IllegalArgumentException] {
      CompressedFrames.parseChain("delta(3)")
    }
    assert(e2.getMessage.contains("width must be"), e2.getMessage)
  }
}
