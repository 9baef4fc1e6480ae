package graft

import graft.operators.{ImageCodec, Multimodal, Vp8lCodec}

/** WebP lossless (VP8L) codec contract: a hand-built bitstream KAT
  * (independent of the encoder), a round-trip matrix over every
  * decoder path, LZ77 prefix/distance arithmetic pins, named refusals
  * for the out-of-scope WebP forms, and featurize integration. */
class Vp8lSpec extends SparkSpec {
  import spark.implicits._

  /** LSB-first bit accumulator mirroring the documented bitstream
    * layout — a from-the-spec re-derivation, NOT the encoder. */
  private final class Bits {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var buf = 0L; private var cnt = 0
    def put(v: Int, n: Int): this.type = {
      buf |= (v.toLong & ((1L << n) - 1)) << cnt; cnt += n
      while (cnt >= 8) { out += (buf & 0xff).toByte; buf >>>= 8; cnt -= 8 }
      this
    }
    def bytes: Array[Byte] = {
      val tail = if (cnt > 0) Array((buf & 0xff).toByte) else Array[Byte]()
      out.toArray ++ tail
    }
  }

  private def riffWebp(vp8l: Array[Byte]): Array[Byte] = {
    val pad = vp8l.length & 1
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + vp8l.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(4 + 8 + vp8l.length + pad)
      .put("WEBP".getBytes).put("VP8L".getBytes).putInt(vp8l.length)
      .put(vp8l)
    bb.array()
  }

  test("VP8L KAT: a hand-assembled 2x1 bitstream decodes to the planted pixels") {
    // two pixels (r,g,b,a) = (1,2,3,255) and (4,5,6,255); all five
    // prefix codes in the "simple" form, no transforms/cache/meta.
    val b = new Bits
    b.put(2 - 1, 14).put(1 - 1, 14) // width-1, height-1
    b.put(0, 1).put(0, 3)           // alpha hint, version
    b.put(0, 1)                     // no transforms
    b.put(0, 1)                     // no color cache
    b.put(0, 1)                     // no meta-prefix
    def simple2(first: Int, second: Int): Unit =
      b.put(1, 1).put(1, 1).put(1, 1).put(first, 8).put(second, 8)
    def simple1(sym: Int): Unit =
      b.put(1, 1).put(0, 1).put(1, 1).put(sym, 8)
    simple2(5, 2)   // green: FIRST-READ symbol 5 gets code 0
    simple2(1, 4)   // red
    simple2(3, 6)   // blue
    simple1(255)    // alpha: single symbol, zero-bit reads
    simple1(0)      // distance: never read
    // pixel 0 = (1,2,3): green 2 -> code 1; red 1 -> 0; blue 3 -> 0
    b.put(1, 1).put(0, 1).put(0, 1)
    // pixel 1 = (4,5,6): green 5 -> code 0; red 4 -> 1; blue 6 -> 1
    b.put(0, 1).put(1, 1).put(1, 1)
    val img = Vp8lCodec.decodeWebp(riffWebp(0x2f.toByte +: b.bytes))
    assert(img.format == "image/webp" && img.width == 2 && img.height == 1)
    assert(img.channels == 3)
    assert(img.pixels.toSeq == Seq(1, 2, 3, 4, 5, 6))
  }

  test("VP8L round-trip matrix: transforms, palette tiers, cache, meta, LZ77") {
    val w = 11; val h = 7
    def pix(ch: Int) = Array.tabulate(w * h * ch)(i => (i * 37 + 11) % 256)
    def rt(w: Int, h: Int, ch: Int, px: Array[Int], bytes: Array[Byte],
        tag: String): Unit = {
      val img = Vp8lCodec.decodeWebp(bytes)
      val expCh =
        if (ch == 4 && px.grouped(4).exists(p => p(3) != 255)) 4 else 3
      val exp: Array[Int] = ch match {
        case 1 => Array.tabulate(w * h * 3)(i => px(i / 3))
        case 3 => px
        case 4 if expCh == 4 => px
        case _ => Array.tabulate(w * h * 3)(i => px((i / 3) * 4 + i % 3))
      }
      assert(img.width == w && img.height == h && img.channels == expCh, tag)
      assert(img.pixels.toSeq == exp.toSeq, tag)
    }
    rt(w, h, 3, pix(3), Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3)), "plain")
    rt(w, h, 1, pix(1), Vp8lCodec.encodeWebpVp8l(w, h, 1, pix(1)), "gray")
    rt(w, h, 4, pix(4), Vp8lCodec.encodeWebpVp8l(w, h, 4, pix(4)), "rgba")
    rt(w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), useLz77 = false), "no-lz")
    rt(w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), subtractGreen = true), "sg")
    for (m <- 0 to 13)
      rt(w, h, 3, pix(3),
        Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), predictor = m), s"pred$m")
    rt(w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), colorXform = 0x2a1b0c), "cx")
    rt(w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), subtractGreen = true,
        predictor = 11, colorXform = 0x80ff40), "sg+pred+cx")
    rt(w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), cacheBits = 5), "cache")
    rt(w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), metaBits = 2), "meta")
    // repetitive pixels: real backward references incl. row-copy
    val rep = Array.tabulate(w * h * 3)(i => (i / 3 % 4) * 50)
    rt(w, h, 3, rep, Vp8lCodec.encodeWebpVp8l(w, h, 3, rep), "lz-rep")
    rt(w, h, 3, rep,
      Vp8lCodec.encodeWebpVp8l(w, h, 3, rep, cacheBits = 6), "lz-cache")
    // palette tiers: 8/4/2/1-bit bundling boundaries + unbundled
    def palPx(ncol: Int) = Array.tabulate(w * h * 3) { i =>
      ((i / 3) % ncol) * (255 / math.max(ncol - 1, 1))
    }
    for (ncol <- Seq(2, 3, 4, 5, 16, 17, 40))
      rt(w, h, 3, palPx(ncol),
        Vp8lCodec.encodeWebpVp8l(w, h, 3, palPx(ncol), usePalette = true),
        s"pal$ncol")
    // degenerate shapes
    rt(1, 1, 3, Array(9, 8, 7),
      Vp8lCodec.encodeWebpVp8l(1, 1, 3, Array(9, 8, 7)), "1x1")
    val flat = Array.fill(w * h * 3)(123)
    rt(w, h, 3, flat, Vp8lCodec.encodeWebpVp8l(w, h, 3, flat), "flat")
  }

  test("VP8L LZ77 arithmetic: prefix values and the distance neighborhood") {
    // prefix encode/decode inverse across the boundary values
    for (v <- Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 16, 17, 4096)) {
      val (code, eb, ev) = Vp8lCodec.prefixEncode(v)
      val back =
        if (code < 4) code + 1
        else (2 + (code & 1) << ((code - 2) >> 1)) + ev + 1
      // recompute with explicit parentheses (the shift binds first)
      val off = (2 + (code & 1)) << ((code - 2) >> 1)
      assert((if (code < 4) code + 1 else off + ev + 1) == v, s"v=$v")
      assert(eb == (if (code < 4) 0 else (code - 2) >> 1))
      assert(back >= 0) // silence unused warning path
    }
    // neighborhood codes: the canonical short distances map back
    val w = 11
    assert(Vp8lCodec.mapDistance(1, w) == w)      // (0, 1): one row up
    assert(Vp8lCodec.mapDistance(2, w) == 1)      // (1, 0): previous pixel
    assert(Vp8lCodec.mapDistance(3, w) == w + 1)  // (1, 1)
    assert(Vp8lCodec.mapDistance(4, w) == w - 1)  // (-1, 1)
    assert(Vp8lCodec.mapDistance(121, w) == 1)    // plain: code - 120
    assert(Vp8lCodec.mapDistance(320, w) == 200)
    // distToCode inverts mapDistance for every neighborhood entry
    for (code <- 1 to 120) {
      val d = Vp8lCodec.mapDistance(code, w)
      assert(Vp8lCodec.mapDistance(Vp8lCodec.distToCode(d, w), w) == d,
        s"code=$code")
    }
    assert(Vp8lCodec.distToCode(200, w) == 320)
    // a planted period-150 image forces the PLAIN (> 120) decode path:
    // 150 = 7*20+10 -> (10,7) is outside the 8x8 neighborhood
    val pw = 20; val ph = 12
    val px = Array.tabulate(pw * ph * 3)(i => ((i / 3) % 150) * 5 % 256)
    val bytes = Vp8lCodec.encodeWebpVp8l(pw, ph, 3, px,
      lzCandidates = Seq(150))
    val img = Vp8lCodec.decodeWebp(bytes)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("WebP refusals are BY NAME; hostile containers degrade through featurize") {
    def chunkFile(tag: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer
        .allocate(12 + 8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(4 + 8 + payload.length + pad)
        .put("WEBP".getBytes).put(tag.getBytes).putInt(payload.length)
        .put(payload)
      bb.array()
    }
    val lossy = chunkFile("VP8 ", new Array[Byte](16))
    val e1 = intercept[IllegalArgumentException] {
      ImageCodec.decode(lossy)
    }
    assert(e1.getMessage.contains("lossy") &&
      e1.getMessage.contains("re-encode"), e1.getMessage)
    val anim = chunkFile("ANIM", new Array[Byte](6))
    val e2 = intercept[IllegalArgumentException] { ImageCodec.decode(anim) }
    assert(e2.getMessage.contains("animated WebP"), e2.getMessage)
    // VP8X with the animation flag set refuses before any image chunk
    val vp8x = new Array[Byte](10); vp8x(0) = 0x02
    val e3 = intercept[IllegalArgumentException] {
      ImageCodec.decode(chunkFile("VP8X", vp8x))
    }
    assert(e3.getMessage.contains("animation flag"), e3.getMessage)
    // metadata-only container: no image chunk
    val e4 = intercept[IllegalArgumentException] {
      ImageCodec.decode(chunkFile("ICCP", new Array[Byte](4)))
    }
    assert(e4.getMessage.contains("no VP8L image chunk"), e4.getMessage)
    // a cut-off file fails the RIFF size audit...
    val good = Vp8lCodec.encodeWebpVp8l(6, 4,
      3, Array.tabulate(72)(i => i * 3 % 256))
    val cut = good.dropRight(6)
    val e5 = intercept[IllegalArgumentException] { ImageCodec.decode(cut) }
    assert(e5.getMessage.contains("exceeds"), e5.getMessage)
    // ...and a size-consistent truncation hits the bit reader's guard
    val cut2 = good.dropRight(6)
    val patch = java.nio.ByteBuffer.wrap(cut2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    patch.putInt(4, cut2.length - 8)   // RIFF size
    patch.putInt(16, cut2.length - 20) // VP8L chunk size
    val e5b = intercept[IllegalArgumentException] { ImageCodec.decode(cut2) }
    assert(e5b.getMessage.contains("truncated"), e5b.getMessage)
    // implausible dimensions refuse before allocation: hand-build a
    // header claiming 8192x8192+ (> the 2^26 pixel bound)
    val b = new Bits
    b.put(16383, 14).put(16383, 14).put(0, 1).put(0, 3)
    val e6 = intercept[IllegalArgumentException] {
      ImageCodec.decode(riffWebp(0x2f.toByte +: b.bytes))
    }
    assert(e6.getMessage.contains("implausible"), e6.getMessage)
    // all of them degrade to the opaque branch through featurize
    val media = Seq((1L, lossy), (2L, anim), (3L, cut))
      .toDF("doc_id", "content")
      .selectExpr("doc_id", "content", "'d' AS format",
        "9 AS width", "9 AS height")
    val rows = Multimodal.featurize(media).collect()
    assert(rows.forall(r => r.format == "d" && r.width == 9), rows.toSeq)
  }

  test("animated WebP composites: placement, blend, overwrite, dispose-to-background") {
    import graft.operators.{Vp8lCodec, VideoCodec}
    val W = 4; val H = 2
    val bg = 0xffff0000 // opaque red
    def solid(w: Int, h: Int, r: Int, g: Int, b: Int, a: Int = 255) =
      Array.tabulate(w * h * 4)(i => Seq(r, g, b, a)(i % 4))
    // frame 0: full canvas opaque gray ramp (overwrite)
    val f0px = Array.tabulate(W * H * 4)(i =>
      if (i % 4 == 3) 255 else (i / 4) * 10 + i % 4)
    // frame 1: 2x1 at (2,0), pixel 0 transparent (shows f0 through),
    // pixel 1 opaque green — alpha BLEND
    val f1px = Array(0, 0, 0, 0, 0, 200, 0, 255)
    // frame 2: 2x2 at (0,0) opaque blue, NO blend, dispose-to-bg after
    val f2px = solid(2, 2, 0, 0, 150)
    // frame 3: 2x1 at (2,0) opaque white
    val f3px = solid(2, 1, 255, 255, 255)
    val anim = Vp8lCodec.encodeWebpAnim(W, H, bg, loop = 0, Seq(
      Vp8lCodec.WebpFrame(0, 0, W, H, 40, blend = false, disposeBg = false, f0px),
      Vp8lCodec.WebpFrame(2, 0, 2, 1, 40, blend = true, disposeBg = false, f1px),
      Vp8lCodec.WebpFrame(0, 0, 2, 2, 40, blend = false, disposeBg = true, f2px),
      Vp8lCodec.WebpFrame(2, 0, 2, 1, 40, blend = false, disposeBg = false, f3px)))
    val v = VideoCodec.decode(anim).get
    assert(v.format == "image/webp" && v.width == W && v.height == H)
    assert(v.usPerFrame == 40000 && v.frames.length == 4)
    def rgbAt(f: Int, x: Int, y: Int): Seq[Int] = {
      val b = (y * W + x) * 3
      v.frames(f).rgb.slice(b, b + 3).toSeq
    }
    // frame 0 snapshot = the ramp itself
    assert(rgbAt(0, 0, 0) == Seq(0, 1, 2) && rgbAt(0, 3, 1) == Seq(70, 71, 72))
    // frame 1: (2,0) transparent -> f0 pixel shows through; (3,0) green
    assert(rgbAt(1, 2, 0) == Seq(20, 21, 22))
    assert(rgbAt(1, 3, 0) == Seq(0, 200, 0))
    // frame 2: blue rect overwrote (0,0)-(1,1); rest as frame 1
    assert(rgbAt(2, 0, 0) == Seq(0, 0, 150) && rgbAt(2, 1, 1) == Seq(0, 0, 150))
    assert(rgbAt(2, 3, 0) == Seq(0, 200, 0))
    // frame 3: the disposed 2x2 rect now shows the RED background;
    // (2,0)-(3,0) white
    assert(rgbAt(3, 0, 0) == Seq(255, 0, 0) && rgbAt(3, 1, 1) == Seq(255, 0, 0))
    assert(rgbAt(3, 2, 0) == Seq(255, 255, 255))
    // frame stats flow through sampleVideoFrames (every=2 keeps 0 and 2)
    val media = Seq((9L, anim)).toDF("doc_id", "content")
      .selectExpr("doc_id", "content", "'x' AS format",
        "0 AS width", "0 AS height")
    val rows = Multimodal.sampleVideoFrames(media, every = 2).collect()
    assert(rows.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(rows.forall(r => r.width == W && r.n_frames == 4))
    // a lossy ANMF frame refuses by name
    val lossyAnmf = {
      val bytes = anim.clone()
      // find the first ANMF's VP8L sub-chunk tag and rename to 'VP8 '
      val idx = bytes.indexOfSlice("VP8L".getBytes, 30)
      // first hit is the frame sub-chunk (the container has no
      // top-level VP8L here)
      bytes(idx + 3) = ' '
      bytes
    }
    val e = intercept[IllegalArgumentException] {
      VideoCodec.decode(lossyAnmf)
    }
    assert(e.getMessage.contains("lossy"), e.getMessage)
    // a STILL VP8L through the video path is a one-frame video
    val still = Vp8lCodec.encodeWebpVp8l(3, 2, 3,
      Array.tabulate(18)(i => i * 9))
    val sv = VideoCodec.decode(still).get
    assert(sv.frames.length == 1 && sv.width == 3 && sv.height == 2)
    assert(sv.frames.head.rgb.toSeq == (0 until 18).map(_ * 9))
  }

  test("WebP honors an EXIF chunk's orientation, prefixed or raw TIFF") {
    // 4x2, left half dark / right half bright — rotation visible
    val w = 4; val h = 2
    val px = Array.tabulate(w * h * 3)(i => if ((i / 3) % w < 2) 40 else 200)
    val still = Vp8lCodec.encodeWebpVp8l(w, h, 3, px)
    def tiff(orientation: Int): Array[Byte] =
      Array[Int]('I', 'I', 0x2a, 0, 8, 0, 0, 0, 1, 0,
        0x12, 0x01, 3, 0, 1, 0, 0, 0, orientation, 0, 0, 0,
        0, 0, 0, 0).map(_.toByte)
    def withExif(orientation: Int, prefixed: Boolean): Array[Byte] = {
      val payload = (if (prefixed) "Exif".getBytes ++ Array[Byte](0, 0)
        else Array.emptyByteArray) ++ tiff(orientation)
      val pad = payload.length & 1
      val out = java.nio.ByteBuffer
        .allocate(still.length + 8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(still).put("EXIF".getBytes).putInt(payload.length).put(payload)
      val bytes = out.array()
      // patch the RIFF size for the appended chunk
      java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(4, bytes.length - 8)
      bytes
    }
    for (prefixed <- Seq(false, true)) {
      val o6 = Vp8lCodec.decodeWebp(withExif(6, prefixed))
      assert(o6.width == 2 && o6.height == 4, s"prefixed=$prefixed")
      // rotate 90 CW: stored LEFT half becomes displayed TOP half
      val want = Array.tabulate(2 * 4 * 3)(i => if (i / 3 / 2 < 2) 40 else 200)
      assert(o6.pixels.toSeq == want.toSeq, s"prefixed=$prefixed")
    }
    // orientation 1 and a missing EXIF chunk decode identically
    assert(Vp8lCodec.decodeWebp(withExif(1, prefixed = false))
      .pixels.toSeq == px.toSeq)
    assert(Vp8lCodec.decodeWebp(still).pixels.toSeq == px.toSeq)
  }

  test("WebP detect + featurize: real decoded dims and pixel stats") {
    val w = 6; val h = 5
    val px = Array.tabulate(w * h * 3)(i => (i * 13 + 5) % 256)
    val bytes = Vp8lCodec.encodeWebpVp8l(w, h, 3, px, subtractGreen = true)
    assert(ImageCodec.detect(bytes).contains("image/webp"))
    val media = Seq((42L, bytes)).toDF("doc_id", "content")
      .selectExpr("doc_id", "content", "'declared/wrong' AS format",
        "99 AS width", "99 AS height")
    val row = Multimodal.featurize(media).collect().head
    assert(row.format == "image/webp" && row.width == w && row.height == h)
    val want = px.sum / px.length.toDouble
    assert(math.abs(row.mean_byte - want) < 1e-12)
    // a WAV payload is NOT misdetected as WebP (both are RIFF)
    val wav = graft.operators.AudioCodec.encodeWav(8000, 1, 8,
      Array.tabulate(16)(i => i * 10))
    assert(ImageCodec.detect(wav).isEmpty)
  }
}
