package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF) PCM codec, extending the honest-decode
  * multimodal family (ImageCodec's BMP/farbfeld/PNG) to audio:
  * header-parsed sample rate / channel count / bit depth and
  * amplitude stats from the DECODED samples, not a byte-histogram
  * fake.
  *
  * Container (the canonical RIFF/WAVE layout every PCM dump uses):
  * `RIFF` + u32-LE riff size + `WAVE`, then a chunk walk — each chunk
  * is a 4-byte id + u32-LE size + payload, padded to an EVEN offset
  * (RIFF word alignment; a decoder that forgets the pad byte
  * misparses every file with an odd-sized LIST/INFO chunk). `fmt `
  * must carry audioFormat=1 (integer PCM — float/ADPCM/extensible
  * refuse BY NAME with guidance), `data` carries the interleaved
  * frames. Unknown chunks (LIST, INFO, cue…) skip by their declared
  * size, exactly like a real reader.
  *
  * Samples: 8-bit PCM is UNSIGNED bytes; 16-bit PCM is SIGNED
  * little-endian — the asymmetry is the format's own (and the thing a
  * naive decoder gets wrong first). Decoded samples surface
  * NORMALIZED to 0..255 (unsigned top byte: u8 as-is, (s16+32768)>>8)
  * so amplitude statistics share one domain across bit depths — the
  * standard amplitude-histogram treatment.
  */
object AudioCodec {

  /** Decoded PCM: `samples` is frame-interleaved (frame-major,
    * channel-minor), one Int (0..255 normalized amplitude) per
    * channel sample; `frames` = samples per channel. */
  final case class DecodedAudio(format: String, sampleRate: Int,
    channels: Int, bits: Int, frames: Int, samples: Array[Int])

  private val riffMagic = "RIFF".getBytes("US-ASCII")

  /** Encode normalized 0..255 amplitudes (frame-interleaved) as RIFF/
    * WAVE PCM at the given bit depth: 8-bit stores the value as an
    * unsigned byte, 16-bit as the signed LE sample `u*256 - 32768`
    * (so decode's top-byte normalization is exact). `plantListChunk`
    * inserts an odd-sized (25-byte) LIST chunk + pad byte between
    * `fmt ` and `data` — the chunk-walk + word-alignment proof. */
  def encodeWav(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Int], plantListChunk: Boolean = false): Array[Byte] = {
    require(bits == 8 || bits == 16, s"encodeWav: bits=$bits (8 or 16)")
    require(samples.length % channels == 0,
      s"encodeWav: ${samples.length} samples not a multiple of $channels channels")
    val dataSize = samples.length * (bits / 8)
    val dataPad = dataSize % 2
    val listBytes = if (plantListChunk) 8 + 25 + 1 else 0 // odd size + pad
    val riffSize = 4 + (8 + 16) + listBytes + 8 + dataSize + dataPad
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(riffMagic).putInt(riffSize).put("WAVE".getBytes("US-ASCII"))
    val blockAlign = channels * (bits / 8)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    if (plantListChunk) {
      bb.put("LIST".getBytes("US-ASCII")).putInt(25)
      var k = 0
      while (k < 25) { bb.put(('a' + k % 26).toByte); k += 1 }
      bb.put(0.toByte) // RIFF pad to even offset
    }
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) {
      val u = samples(i) & 0xff
      if (bits == 8) bb.put(u.toByte)
      else bb.putShort((u * 256 - 32768).toShort)
      i += 1
    }
    if (dataPad == 1) bb.put(0.toByte)
    bb.array()
  }

  /** Dispatch on magic: Some(decoded) for RIFF/WAVE PCM, None for
    * anything whose first bytes are no RIFF container (the opaque
    * fallback path); a blob that CLAIMS RIFF but lies in the header
    * throws IllegalArgumentException (the featurizer degrades it to
    * opaque, like ImageCodec's contract). */
  def decode(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes.length < 12 || !riffMagic.indices.forall(i => bytes(i) == riffMagic(i)))
      return None
    Some(decodeWav(bytes))
  }

  private def u16(bb: ByteBuffer): Int = bb.getShort() & 0xffff

  private def decodeWav(bytes: Array[Byte]): DecodedAudio = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    val riffSize = bb.getInt()
    require(riffSize >= 4 && 8L + riffSize <= bytes.length,
      s"WAV: RIFF size $riffSize exceeds the ${bytes.length}-byte payload")
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE",
      s"WAV: RIFF form is '${new String(wave, "US-ASCII")}', not WAVE")
    // chunk walk: fmt must precede data (the spec's ordering rule);
    // unknown chunks skip by declared size + the word-alignment pad
    var sampleRate = 0; var channels = 0; var bits = 0; var fmtSeen = false
    while (bb.remaining() >= 8) {
      val id = new Array[Byte](4); bb.get(id)
      val idStr = new String(id, "US-ASCII")
      val size = bb.getInt()
      require(size >= 0 && bb.position() + size <= bytes.length,
        s"WAV: chunk '$idStr' declares $size bytes past end of file")
      idStr match {
        case "fmt " =>
          require(size >= 16, s"WAV: fmt chunk is $size bytes, need >= 16")
          val start = bb.position()
          val audioFormat = u16(bb)
          require(audioFormat == 1, {
            val name = audioFormat match {
              case 3 => "IEEE float (3)"
              case 6 => "A-law (6)"
              case 7 => "mu-law (7)"
              case 0x11 => "IMA ADPCM (0x11)"
              case 0xfffe => "WAVE_FORMAT_EXTENSIBLE (0xfffe)"
              case other => s"format tag $other"
            }
            s"WAV: $name is not integer PCM — this decoder handles " +
              "audioFormat=1 (8/16-bit PCM); transcode or extend the codec"
          })
          channels = u16(bb)
          require(channels >= 1 && channels <= 64,
            s"WAV: implausible channel count $channels")
          sampleRate = bb.getInt()
          require(sampleRate > 0 && sampleRate <= 1000000,
            s"WAV: implausible sample rate $sampleRate")
          bb.getInt() // byte rate (derived; not trusted)
          u16(bb) // block align (derived; not trusted)
          bits = u16(bb)
          require(bits == 8 || bits == 16,
            s"WAV: $bits-bit PCM unsupported (8 or 16)")
          fmtSeen = true
          bb.position(start + size + size % 2)
        case "data" =>
          require(fmtSeen, "WAV: data chunk before fmt chunk")
          val bytesPerSample = bits / 8
          require(size % (channels * bytesPerSample) == 0,
            s"WAV: data size $size is not whole ${channels}-channel frames")
          val n = size / bytesPerSample
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (bits == 8) bb.get() & 0xff
              else ((bb.getShort() & 0xffff) + 32768 & 0xffff) >> 8
            i += 1
          }
          return DecodedAudio("audio/wav", sampleRate, channels, bits,
            n / channels, out)
        case _ =>
          bb.position(bb.position() + size + size % 2) // skip + pad
      }
    }
    throw new IllegalArgumentException(
      if (fmtSeen) "WAV: no data chunk" else "WAV: no fmt chunk")
  }
}
