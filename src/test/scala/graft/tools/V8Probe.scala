package graft.tools
import graft.operators.{Vp8lCodec, ImageCodec}

object V8Probe {
  def rt(name: String, w: Int, h: Int, ch: Int, px: Array[Int],
      enc: => Array[Byte]): Unit = {
    try {
      val bytes = enc
      val img = Vp8lCodec.decodeWebp(bytes)
      val expCh = if (ch == 4 && px.grouped(4).exists(p => p(3) != 255)) 4 else 3
      val exp: Array[Int] = ch match {
        case 1 => Array.tabulate(w * h * 3)(i => px(i / 3))
        case 3 => px
        case 4 if expCh == 4 => px
        case 4 => Array.tabulate(w * h * 3)(i => px((i / 3) * 4 + i % 3))
      }
      val ok = img.width == w && img.height == h && img.channels == expCh &&
        img.pixels.toSeq == exp.toSeq
      println(s"$name: ${if (ok) "OK" else s"MISMATCH ch=${img.channels} " +
        s"w=${img.width} h=${img.height} " +
        s"px=${img.pixels.take(12).toSeq} exp=${exp.take(12).toSeq}"} " +
        s"(${bytes.length} bytes)")
    } catch { case e: Throwable => println(s"$name: THREW ${e.getMessage}") }
  }

  def main(args: Array[String]): Unit = {
    val w = 11; val h = 7
    def pix(ch: Int) = Array.tabulate(w * h * ch)(i => (i * 37 + 11) % 256)
    rt("plain-rgb", w, h, 3, pix(3), Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3)))
    rt("gray", w, h, 1, pix(1), Vp8lCodec.encodeWebpVp8l(w, h, 1, pix(1)))
    rt("rgba", w, h, 4, pix(4), Vp8lCodec.encodeWebpVp8l(w, h, 4, pix(4)))
    rt("no-lz77", w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), useLz77 = false))
    rt("sg", w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), subtractGreen = true))
    for (m <- 0 to 13)
      rt(s"pred$m", w, h, 3, pix(3),
        Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), predictor = m))
    rt("color-xform", w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), colorXform = 0x2a1b0c))
    rt("sg+pred+cx", w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), subtractGreen = true,
        predictor = 11, colorXform = 0x80ff40))
    rt("cache", w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), cacheBits = 5))
    rt("meta", w, h, 3, pix(3),
      Vp8lCodec.encodeWebpVp8l(w, h, 3, pix(3), metaBits = 2))
    // repetitive image → real LZ77 refs incl. row-copy distances
    val rep = Array.tabulate(w * h * 3)(i => (i / 3 % 4) * 50)
    rt("lz77-rep", w, h, 3, rep, Vp8lCodec.encodeWebpVp8l(w, h, 3, rep))
    rt("lz77-cache-rep", w, h, 3, rep,
      Vp8lCodec.encodeWebpVp8l(w, h, 3, rep, cacheBits = 6))
    // palettes: >16 colors (no bundling), <=16, <=4, <=2 (bundling)
    def palPx(ncol: Int) = Array.tabulate(w * h * 3) { i =>
      val c = (i / 3) % ncol; c * (255 / math.max(ncol - 1, 1))
    }
    for (ncol <- Seq(2, 3, 4, 7, 16, 17, 40))
      rt(s"palette$ncol", w, h, 3, palPx(ncol),
        Vp8lCodec.encodeWebpVp8l(w, h, 3, palPx(ncol), usePalette = true))
    // 1x1 and single-color edge cases
    rt("1x1", 1, 1, 3, Array(9, 8, 7),
      Vp8lCodec.encodeWebpVp8l(1, 1, 3, Array(9, 8, 7)))
    val flat = Array.fill(w * h * 3)(123)
    rt("flat", w, h, 3, flat, Vp8lCodec.encodeWebpVp8l(w, h, 3, flat))
    // wide image so distances > 120 occur
    val w2 = 40; val h2 = 9
    val px2 = Array.tabulate(w2 * h2 * 3)(i => (i / 3 / w2 * 31 + i % 3) % 256)
    rt("wide-rowcopy", w2, h2, 3, px2, Vp8lCodec.encodeWebpVp8l(w2, h2, 3, px2))
  }
}
