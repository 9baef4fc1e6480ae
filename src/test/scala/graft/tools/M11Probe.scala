package graft.tools

import graft.operators.Vp8lCodec

object M11Probe {
  def main(args: Array[String]): Unit = {
    for (id <- 0L until 60L) {
      val w = (4 + Math.floorMod(id, 5L)).toInt
      val h = (3 + Math.floorMod(id, 4L)).toInt
      val ch = Math.floorMod(id, 3L) match {
        case 0L => 1; case 1L => 3; case _ => 4 }
      val px = Array.tabulate(w * h * ch)(i =>
        Math.floorMod(id * 11 + i * 17L, 256L).toInt)
      val mode = Math.floorMod(id, 6L)
      val bytes = mode match {
        case 0L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px)
        case 1L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px, subtractGreen = true)
        case 2L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
          predictor = Math.floorMod(id / 6, 14L).toInt)
        case 3L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px, usePalette = true)
        case 4L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
          cacheBits = 4, metaBits = 2)
        case _ => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
          colorXform = 0x2a1b0c)
      }
      val img = Vp8lCodec.decodeWebp(bytes)
      val expCh =
        if (ch == 4 && px.grouped(4).exists(p => p(3) != 255)) 4 else 3
      val exp: Array[Int] = ch match {
        case 1 => Array.tabulate(w * h * 3)(i => px(i / 3))
        case 3 => px
        case 4 if expCh == 4 => px
        case _ => Array.tabulate(w * h * 3)(i => px((i / 3) * 4 + i % 3))
      }
      val ok = img.width == w && img.height == h &&
        img.channels == expCh && img.pixels.toSeq == exp.toSeq
      if (!ok) println(s"id=$id mode=$mode ch=$ch ${w}x$h: MISMATCH " +
        s"decCh=${img.channels} px=${img.pixels.take(9).toSeq} " +
        s"exp=${exp.take(9).toSeq}")
    }
    println("done")
  }
}
