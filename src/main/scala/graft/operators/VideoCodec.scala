package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM AVI (RIFF) video codec with uncompressed DIB frames —
  * the video rung of the honest-decode multimodal family
  * (ImageCodec's BMP/farbfeld/PNG, AudioCodec's WAV): real container
  * parse, real per-frame pixel decode, frame SAMPLING over the
  * decoded rasters instead of a byte-histogram fake.
  *
  * Container (the public Microsoft AVI RIFF form — `RIFF 'AVI '`):
  *  - `LIST 'hdrl'`: the `avih` main header (microseconds per frame,
  *    total frames, stream count, declared width/height) followed by
  *    one `LIST 'strl'` per stream — `strh` (stream header: fccType
  *    `vids`, fccHandler, rate/scale) + `strf` (for video: a
  *    BITMAPINFOHEADER, exactly BMP's info header).
  *  - optional `JUNK`/`idx1`/vendor chunks — skipped by declared
  *    size with RIFF word-alignment padding, same walk as WAV.
  *  - `LIST 'movi'`: the frame stream — `00db` (uncompressed DIB)
  *    or `00dc` (compressed; accepted here only when `strf` says
  *    BI_RGB) chunks, each payload a bottom-up BGR raster with rows
  *    padded to 4 bytes — byte-identical to BMP's pixel array.
  *
  * Compressed handlers (`MJPG`, `cvid`, `XVID`, `H264`, RLE…) refuse
  * BY NAME with guidance; hostile headers (sizes past EOF,
  * implausible dimensions, frame/strf mismatch) refuse before
  * allocation. The decode is the authority: dimensions come from
  * `strf`, frame count from the movi walk, never from declared
  * metadata or even `avih` (cross-checked, not trusted).
  */
object VideoCodec {

  /** One decoded frame: `rgb` is row-major top-down, 3 ints per
    * pixel (0..255) — the same raster contract as ImageCodec. */
  final case class DecodedFrame(index: Int, rgb: Array[Int])

  /** Decoded video: dimensions/usPerFrame from the parsed headers,
    * `frames` in movi order. */
  final case class DecodedVideo(format: String, width: Int, height: Int,
    usPerFrame: Int, frames: Array[DecodedFrame])

  private val riffMagic = "RIFF".getBytes("US-ASCII")

  private def rowStride(width: Int): Int = ImageCodec.bmpRowStride(width)

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Container size for the canonical layout [[encodeAvi]] writes —
    * the closed form the m07 oracle recomputes. */
  def aviSize(width: Int, height: Int, nFrames: Int,
      plantJunkChunk: Boolean): Int = {
    val frameBytes = rowStride(width) * height // stride is 4-aligned: even
    12 +                       // RIFF + size + 'AVI '
      (8 + 4 + 64 + 124) +     // LIST hdrl: avih(8+56) + LIST strl(12+64+48)
      (if (plantJunkChunk) 8 + 25 + 1 else 0) + // odd JUNK + pad
      (8 + 4) +                // LIST movi header
      nFrames * (8 + frameBytes)
  }

  /** Encode frames (each row-major top-down RGB, width*height*3 ints
    * 0..255) as RIFF/AVI with raw `00db` DIB payloads (bottom-up BGR,
    * 4-byte-padded rows). `plantJunkChunk` inserts an odd-sized
    * (25-byte) JUNK chunk + pad byte between hdrl and movi — the
    * chunk-walk + word-alignment proof, mirroring m06's LIST plant. */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
      frames: Array[Array[Int]], plantJunkChunk: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "encodeAvi: no frames")
    require(frames.forall(_.length == width * height * 3),
      s"encodeAvi: every frame needs ${width * height * 3} channel values")
    val stride = rowStride(width)
    val frameBytes = stride * height
    val total = aviSize(width, height, frames.length, plantJunkChunk)
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(riffMagic).putInt(total - 8).put(fourCC("AVI "))
    // LIST hdrl
    bb.put(fourCC("LIST")).putInt(4 + 64 + 124).put(fourCC("hdrl"))
    bb.put(fourCC("avih")).putInt(56)
      .putInt(usPerFrame)
      .putInt(0)                       // dwMaxBytesPerSec (advisory)
      .putInt(0)                       // dwPaddingGranularity
      .putInt(0x10)                    // dwFlags: AVIF_HASINDEX clear, WASCAPTUREFILE-ish
      .putInt(frames.length)           // dwTotalFrames
      .putInt(0)                       // dwInitialFrames
      .putInt(1)                       // dwStreams
      .putInt(frameBytes)              // dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    // LIST strl: strh + strf
    bb.put(fourCC("LIST")).putInt(4 + 64 + 48).put(fourCC("strl"))
    bb.put(fourCC("strh")).putInt(56)
      .put(fourCC("vids")).put(fourCC("DIB "))
      .putInt(0)                       // dwFlags
      .putShort(0).putShort(0)         // wPriority, wLanguage
      .putInt(0)                       // dwInitialFrames
      .putInt(1)                       // dwScale
      .putInt(if (usPerFrame > 0) (1000000L / usPerFrame).toInt else 0) // dwRate
      .putInt(0)                       // dwStart
      .putInt(frames.length)           // dwLength
      .putInt(frameBytes)              // dwSuggestedBufferSize
      .putInt(-1)                      // dwQuality
      .putInt(0)                       // dwSampleSize
      .putShort(0).putShort(0).putShort(0).putShort(0) // rcFrame
    bb.put(fourCC("strf")).putInt(40)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0)                       // biCompression = BI_RGB
      .putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    if (plantJunkChunk) {
      bb.put(fourCC("JUNK")).putInt(25)
      var k = 0
      while (k < 25) { bb.put(('a' + k % 26).toByte); k += 1 }
      bb.put(0.toByte) // RIFF pad to even offset
    }
    // LIST movi
    bb.put(fourCC("LIST")).putInt(4 + frames.length * (8 + frameBytes))
      .put(fourCC("movi"))
    frames.foreach { rgb =>
      bb.put(fourCC("00db")).putInt(frameBytes)
      var y = height - 1 // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val base = (y * width + x) * 3
          bb.put((rgb(base + 2) & 0xff).toByte) // BGR on disk
          bb.put((rgb(base + 1) & 0xff).toByte)
          bb.put((rgb(base) & 0xff).toByte)
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y -= 1
      }
    }
    bb.array()
  }

  /** Dispatch on magic: Some(decoded) for RIFF/'AVI ' containers,
    * None when the first bytes are no AVI (the opaque fallback path);
    * a blob that CLAIMS AVI but lies in the header throws
    * IllegalArgumentException (callers degrade to opaque). */
  def decode(bytes: Array[Byte]): Option[DecodedVideo] = {
    // GIF (still or animated) flows through the video path too: the
    // featurizer treats a GIF as a still and refuses animation; HERE
    // the full GIF89a animation model composites to canvas snapshots
    // (ImageCodec.decodeGifFrames — disposal, transparency, sub-rect)
    if (ImageCodec.isGif(bytes))
      return Some(ImageCodec.decodeGifFrames(bytes))
    // animated WebP likewise: ANMF frames composite to canvas
    // snapshots (Vp8lCodec.decodeWebpFrames — blend, dispose,
    // sub-rect placement); a still VP8L yields a one-frame video
    if (Vp8lCodec.isWebp(bytes))
      return Some(Vp8lCodec.decodeWebpFrames(bytes))
    if (bytes.length < 12 ||
        !riffMagic.indices.forall(i => bytes(i) == riffMagic(i)) ||
        bytes(8) != 'A' || bytes(9) != 'V' || bytes(10) != 'I' ||
        bytes(11) != ' ')
      return None
    Some(decodeAvi(bytes))
  }

  private def u16(bb: ByteBuffer): Int = bb.getShort() & 0xffff

  private def compressionName(fcc: Int): String = fcc match {
    case 1 => "BI_RLE8 (1)"
    case 2 => "BI_RLE4 (2)"
    case 3 => "BI_BITFIELDS (3)"
    case other =>
      val s = new String(Array(
        (other & 0xff).toByte, ((other >> 8) & 0xff).toByte,
        ((other >> 16) & 0xff).toByte, ((other >> 24) & 0xff).toByte),
        "US-ASCII")
      if (s.forall(c => c >= ' ' && c < 127)) s"'$s'" else s"tag $other"
  }

  private def decodeAvi(bytes: Array[Byte]): DecodedVideo = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    val riffSize = bb.getInt()
    require(riffSize >= 4 && 8L + riffSize <= bytes.length,
      s"AVI: RIFF size $riffSize exceeds the ${bytes.length}-byte payload")
    bb.position(12) // past 'AVI '
    var usPerFrame = 0
    var width = 0; var height = 0; var topDown = false
    var strfSeen = false
    var streamIsVideo = false // set by the current strl's strh
    var frames = List.empty[DecodedFrame]
    var frameIdx = 0

    def walkChunks(end: Int, inMovi: Boolean, inHdrl: Boolean,
        depth: Int): Unit = {
      require(depth <= 32,
        "AVI: chunk nesting deeper than 32 levels — hostile container")
      while (bb.position() + 8 <= end) {
        val id = new Array[Byte](4); bb.get(id)
        val idStr = new String(id, "US-ASCII")
        val size = bb.getInt()
        require(size >= 0 && bb.position().toLong + size <= bytes.length,
          s"AVI: chunk '$idStr' declares $size bytes past end of file")
        // RIFF pads odd chunks, but the pad is absent when the final
        // chunk ends exactly at EOF — clamp instead of refusing
        val next = math.min(bb.position().toLong + size + size % 2,
          bytes.length.toLong).toInt
        idStr match {
          case "LIST" =>
            require(size >= 4, s"AVI: LIST chunk of $size bytes")
            val form = new Array[Byte](4); bb.get(form)
            val formStr = new String(form, "US-ASCII")
            formStr match {
              case "hdrl" => walkChunks(bb.position() + size - 4,
                inMovi = false, inHdrl = true, depth + 1)
              case "strl" if inHdrl =>
                // each strl describes ONE stream: reset the type flag so
                // a malformed strl carrying strf before (or without)
                // strh cannot inherit the previous stream's type and
                // parse a WAVEFORMATEX as BITMAPINFOHEADER
                streamIsVideo = false
                walkChunks(bb.position() + size - 4,
                  inMovi = false, inHdrl = true, depth + 1)
              case "movi" =>
                require(strfSeen, "AVI: movi list before the stream format header")
                walkChunks(bb.position() + size - 4,
                  inMovi = true, inHdrl = false, depth + 1)
              case "rec " if inMovi => // interleaved-AVI record group:
                // frame chunks live INSIDE these in capture files
                walkChunks(bb.position() + size - 4,
                  inMovi = true, inHdrl = false, depth + 1)
              case _ => // INFO etc: skip
            }
          case "avih" =>
            require(size >= 32, s"AVI: avih is $size bytes, need >= 32")
            usPerFrame = bb.getInt()
            require(usPerFrame >= 0 && usPerFrame <= 10000000,
              s"AVI: implausible usPerFrame $usPerFrame")
          case "strh" =>
            require(size >= 8, s"AVI: strh is $size bytes, need >= 8")
            val typ = new Array[Byte](4); bb.get(typ)
            val typStr = new String(typ, "US-ASCII")
            streamIsVideo = typStr == "vids"
            if (streamIsVideo) {
              val handler = new Array[Byte](4); bb.get(handler)
              val h = new String(handler, "US-ASCII")
              require(h == "DIB " || h == "RAW " || handler.forall(_ == 0), {
                s"AVI: video handler '$h' is compressed — this decoder " +
                  "handles raw DIB frames (handler 'DIB '/'RAW '/0); " +
                  "transcode or extend the codec"
              })
            }
          case "strf" if streamIsVideo =>
            // BITMAPINFOHEADER — the same header BMP carries. Audio
            // streams' strf (WAVEFORMATEX) is skipped by the guard:
            // an AVI with a PCM track alongside raw DIB video decodes
            require(size >= 40, s"AVI: strf is $size bytes, need >= 40")
            val start = bb.position()
            val biSize = bb.getInt()
            require(biSize >= 40, s"AVI: strf biSize=$biSize")
            width = bb.getInt()
            val rawHeight = bb.getInt()
            topDown = rawHeight < 0
            height = math.abs(rawHeight)
            val planes = u16(bb)
            val bpp = u16(bb)
            val compression = bb.getInt()
            require(planes == 1, s"AVI: strf planes=$planes")
            require(compression == 0,
              s"AVI: compression ${compressionName(compression)} is not " +
                "BI_RGB — this decoder handles uncompressed 24bpp DIB " +
                "frames; transcode or extend the codec")
            require(bpp == 24, s"AVI: ${bpp}bpp DIB unsupported (24 only)")
            // Long math: crafted near-2^20 dims overflow Int in
            // stride*height before the truncation require
            require(width > 0 && height > 0 &&
              width.toLong * height <= (1L << 26),
              s"AVI: implausible dimensions ${width}x$rawHeight")
            strfSeen = true
            bb.position(start)
          case fid if inMovi && fid.length == 4 &&
              (fid.endsWith("db") || fid.endsWith("dc")) =>
            // 00db = uncompressed DIB; 00dc accepted because strf
            // already proved BI_RGB (some raw writers use dc)
            val stride = rowStride(width)
            require(size == stride.toLong * height,
              s"AVI: frame chunk '$fid' is $size bytes, strf says " +
                s"${stride.toLong * height} (${width}x$height 24bpp)")
            val off = bb.position()
            val rgb = new Array[Int](width * height * 3)
            var y = 0
            while (y < height) {
              val srcRow = if (topDown) y else height - 1 - y
              var x = 0
              while (x < width) {
                val src = off + srcRow * stride + x * 3
                val dst = (y * width + x) * 3
                rgb(dst) = bytes(src + 2) & 0xff     // R (disk BGR)
                rgb(dst + 1) = bytes(src + 1) & 0xff // G
                rgb(dst + 2) = bytes(src) & 0xff     // B
                x += 1
              }
              y += 1
            }
            frames = DecodedFrame(frameIdx, rgb) :: frames
            frameIdx += 1
          case _ => // JUNK, idx1, unknown: skip by declared size + pad
        }
        bb.position(next)
      }
    }

    walkChunks(math.min(bytes.length, 8 + riffSize),
      inMovi = false, inHdrl = false, depth = 0)
    require(strfSeen, "AVI: no vids stream format (strf) header")
    require(frames.nonEmpty, "AVI: no frame chunks in movi")
    DecodedVideo("video/avi", width, height, usPerFrame,
      frames.reverse.toArray)
  }
}
