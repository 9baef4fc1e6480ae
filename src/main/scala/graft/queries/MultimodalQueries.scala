package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** m01 (SURVEY §2): binary-column media plumbing + stub featurizer.
  * Rows-only — the featurizer runs through typed mapPartitions, which
  * has no SQL twin; MultimodalSpec pins the decode math and schema. */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(

    // Frame sampling over the BINARY payload — every 2nd 32-byte
    // frame. Spark slices the binary column; the oracle slices the
    // (ASCII) varchar source, which is byte-identical, so even the
    // per-frame md5 is cross-engine checked.
    "m02_frame_sample" -> Q(
      """SELECT d.doc_id, i AS frame_idx,
        |  length(substring(d.text, CAST(i * 32 + 1 AS INT), 32)) AS frame_len,
        |  md5(substring(d.text, CAST(i * 32 + 1 AS INT), 32)) AS frame_md5
        |FROM documents d, range(0, 100) t(i)
        |WHERE i * 32 < length(d.text) AND i % 2 = 0
        |ORDER BY d.doc_id, frame_idx""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.sampleFrames(media, frameBytes = 32, every = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // Binary near-dup by frame fingerprints (m03): the oracle builds
    // the same decimated frame sets over the varchar twin of the
    // payload and replays the df-cap + set-Jaccard verify. The
    // documents corpus plants near-dup texts, so shared-prefix
    // payloads produce real matches.
    "m03_binary_neardup" -> Q(
      """WITH fr AS (
        |  SELECT doc_id, fm,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS sz
        |  FROM (
        |    SELECT DISTINCT d.doc_id,
        |      md5(substring(d.text, CAST(i * 32 + 1 AS INT), 32)) AS fm
        |    FROM documents d, range(0, 100) t(i)
        |    WHERE i * 32 < length(d.text) AND i % 2 = 0)),
        |ff AS (
        |  SELECT * FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY fm) AS df FROM fr)
        |  WHERE df <= 100),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter,
        |         MIN(a.sz) AS sa, MIN(b.sz) AS sb
        |  FROM ff a JOIN ff b ON a.fm = b.fm AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, CAST(inter AS DOUBLE)/(sa + sb - inter) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE)/(sa + sb - inter) >= 0.3
        |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.binaryNearDup(media, frameBytes = 32, every = 2,
          maxFrameDf = 100, minJaccard = 0.3)
        .orderBy("id1", "id2")
    },

    // The stub featurizer is deterministic byte-histogram math over
    // the (ASCII) payload, so it gets a full DuckDB oracle: per-byte
    // explode → exact integer sums → the same mean/variance/bucket
    // formulas, with f0/f3 passed through a REAL cast to replicate
    // the featurizer's float32 feature array bit-for-bit.
    "m01_multimodal" -> Q(
      """WITH b AS (
        |  SELECT d.doc_id, ascii(substring(d.text, CAST(i AS INT), 1)) AS v
        |  FROM documents d, range(1, 3201) t(i)
        |  WHERE i <= length(d.text)),
        |s AS (
        |  SELECT doc_id, SUM(v) AS sv, SUM(CAST(v AS DOUBLE) * v) AS svv,
        |    SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS h0,
        |    SUM(CASE WHEN v >= 96 AND v < 128 THEN 1 ELSE 0 END) AS h3
        |  FROM b GROUP BY doc_id),
        |m AS (
        |  SELECT d.doc_id, 'fake/raw' AS format,
        |    CAST(length(d.text) % 48 + 16 AS INT) AS width,
        |    CAST(length(d.text) * 7 % 48 + 16 AS INT) AS height,
        |    length(d.text) AS n_bytes,
        |    CAST(GREATEST(length(d.text), 1) AS DOUBLE) AS nn,
        |    CAST(COALESCE(s.sv, 0) AS DOUBLE) AS sv,
        |    COALESCE(s.svv, 0) AS svv,
        |    COALESCE(s.h0, 0) AS h0, COALESCE(s.h3, 0) AS h3
        |  FROM documents d LEFT JOIN s USING (doc_id))
        |SELECT doc_id, format, width, height, n_bytes,
        |  round(sv / nn, 6) AS mean_byte,
        |  round(sqrt(GREATEST(svv / nn - (sv / nn) * (sv / nn), 0)), 6) AS std_byte,
        |  round(CAST(CAST(h0 / nn AS REAL) AS DOUBLE), 6) AS f0,
        |  round(CAST(CAST(h3 / nn AS REAL) AS DOUBLE), 6) AS f3
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.featurize(media)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("n_bytes"), round(col("mean_byte"), 6).as("mean_byte"),
          round(col("std_byte"), 6).as("std_byte"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    },

    // REAL image decode (m04): every document plants a 24bpp BMP whose
    // dimensions and pixels are a closed-form function of doc_id; the
    // featurizer must recover width/height FROM THE PARSED HEADER and
    // the channel stats FROM THE DECODED PIXELS (declared metadata is
    // deliberately wrong: 0x0). The oracle knows nothing about BMP —
    // it recomputes the stats from the generator formula, so a decoder
    // that misreads the header, the BGR order, the bottom-up rows, or
    // the 4-byte row padding cannot match. n_bytes pins the container
    // layout itself (54-byte headers + padded strides).
    "m04_image_decode" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id, (d.doc_id * 7 + i * 13) % 256 AS v
        |  FROM documents d, range(0, 144) t(i)
        |  WHERE i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4) * 3),
        |s AS (
        |  SELECT doc_id, SUM(v) AS sv, SUM(CAST(v AS DOUBLE) * v) AS svv,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS h0,
        |    SUM(CASE WHEN v >= 96 AND v < 128 THEN 1 ELSE 0 END) AS h3
        |  FROM px GROUP BY doc_id)
        |SELECT s.doc_id, 'image/bmp' AS format,
        |  CAST(4 + s.doc_id % 5 AS INT) AS width,
        |  CAST(3 + s.doc_id % 4 AS INT) AS height,
        |  CAST(54 + (((4 + s.doc_id % 5) * 3 + 3) // 4) * 4
        |    * (3 + s.doc_id % 4) AS BIGINT) AS n_bytes,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_byte,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6) AS std_byte,
        |  round(CAST(CAST(CAST(h0 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f0,
        |  round(CAST(CAST(CAST(h3 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f3
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{ImageCodec, MediaRow}
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val media = docs.map { id =>
        val w = (4 + Math.floorMod(id, 5L)).toInt
        val h = (3 + Math.floorMod(id, 4L)).toInt
        val rgb = Array.tabulate(w * h * 3)(i =>
          Math.floorMod(id * 7 + i * 13L, 256L).toInt)
        MediaRow(id, ImageCodec.encodeBmp(w, h, rgb), "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.featurize(media)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("n_bytes"), round(col("mean_byte"), 6).as("mean_byte"),
          round(col("std_byte"), 6).as("std_byte"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    },

    // REAL PNG decode (m05, the m04 discipline on the container web
    // corpora actually carry): every document plants a non-interlaced
    // 8-bit PNG — channel count cycles gray/RGB/RGBA by doc_id, each
    // scanline carries a DIFFERENT filter type (y % 5, so None / Sub /
    // Up / Average / Paeth must ALL unfilter correctly) — and the
    // featurizer must recover width/height from the parsed IHDR and
    // the stats from the fully-unfiltered pixels. The oracle knows no
    // PNG: it recomputes from the generator formula, so a misread
    // filter, channel count or inflate boundary cannot match. n_bytes
    // is deliberately NOT projected (deflate output has no closed
    // form); the decode proof is the pixel math.
    "m05_png_decode" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id,
        |    (d.doc_id * 11 + i * 17) % 256 AS v
        |  FROM documents d, range(0, 320) t(i)
        |  WHERE i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4)
        |    * (CASE d.doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)),
        |s AS (
        |  SELECT doc_id, SUM(v) AS sv, SUM(CAST(v AS DOUBLE) * v) AS svv,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS h0,
        |    SUM(CASE WHEN v >= 96 AND v < 128 THEN 1 ELSE 0 END) AS h3
        |  FROM px GROUP BY doc_id)
        |SELECT s.doc_id, 'image/png' AS format,
        |  CAST(4 + s.doc_id % 5 AS INT) AS width,
        |  CAST(3 + s.doc_id % 4 AS INT) AS height,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_byte,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6) AS std_byte,
        |  round(CAST(CAST(CAST(h0 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f0,
        |  round(CAST(CAST(CAST(h3 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f3
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{ImageCodec, MediaRow}
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val media = docs.map { id =>
        val w = (4 + Math.floorMod(id, 5L)).toInt
        val h = (3 + Math.floorMod(id, 4L)).toInt
        val ch = Math.floorMod(id, 3L) match {
          case 0L => 1; case 1L => 3; case _ => 4 }
        val px = Array.tabulate(w * h * ch)(i =>
          Math.floorMod(id * 11 + i * 17L, 256L).toInt)
        MediaRow(id, ImageCodec.encodePng(w, h, ch, px, y => y % 5),
          "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.featurize(media)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          round(col("mean_byte"), 6).as("mean_byte"),
          round(col("std_byte"), 6).as("std_byte"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    },

    // REAL WAV/RIFF audio decode (m06, the m04/m05 discipline on the
    // cheapest real audio container): every document plants a PCM
    // WAVE whose rate/channels/bit-depth/frame-count and samples are
    // closed-form functions of doc_id — bit depth ALTERNATES 8-bit
    // unsigned / 16-bit signed-LE (the format's own asymmetry), every
    // 5th file carries an odd-sized LIST chunk (chunk walk + RIFF
    // word-alignment pad must both be honored), and declared metadata
    // is deliberately wrong. The featurizer must recover the metadata
    // FROM THE PARSED fmt CHUNK and the amplitude stats FROM THE
    // DECODED samples (16-bit normalized by top byte, exact for the
    // planted u*256-32768 values). n_bytes pins the container layout
    // (44-byte canonical header + LIST + data pad). The oracle knows
    // no RIFF — it recomputes everything from the generator formula.
    "m06_wav_decode" -> Q(
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits,
        |    CAST(16 + doc_id % 32 AS INT) AS n_frames
        |  FROM documents),
        |sm AS (
        |  SELECT m.doc_id,
        |    (m.doc_id * 13 + (i // m.channels) * 7 + (i % m.channels) * 3) % 256 AS v
        |  FROM m, range(0, 94) t(i)
        |  WHERE i < m.n_frames * m.channels),
        |s AS (
        |  SELECT doc_id, SUM(v) AS sv, SUM(CAST(v AS DOUBLE) * v) AS svv,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS h0,
        |    SUM(CASE WHEN v >= 96 AND v < 128 THEN 1 ELSE 0 END) AS h3
        |  FROM sm GROUP BY doc_id)
        |SELECT m.doc_id, 'audio/wav' AS format, m.sample_rate, m.channels,
        |  m.bits, m.n_frames,
        |  CAST(44 + CASE WHEN m.doc_id % 5 = 0 THEN 34 ELSE 0 END
        |    + m.n_frames * m.channels * (m.bits // 8)
        |    + (m.n_frames * m.channels * (m.bits // 8)) % 2 AS BIGINT) AS n_bytes,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_sample,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6) AS std_sample,
        |  round(CAST(CAST(CAST(h0 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f0,
        |  round(CAST(CAST(CAST(h3 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f3
        |FROM m JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{AudioCodec, MediaRow}
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val media = docs.map { id =>
        val rate = (8000 + Math.floorMod(id, 4L) * 4000).toInt
        val ch = (1 + Math.floorMod(id, 2L)).toInt
        val bits = if (Math.floorMod(id, 3L) == 0L) 8 else 16
        val frames = (16 + Math.floorMod(id, 32L)).toInt
        val u = Array.tabulate(frames * ch)(i =>
          Math.floorMod(id * 13 + (i / ch) * 7L + (i % ch) * 3L, 256L).toInt)
        MediaRow(id, AudioCodec.encodeWav(rate, ch, bits, u,
          plantListChunk = Math.floorMod(id, 5L) == 0L),
          "declared/wrong", 0, 0)
      }.toDF()
      graft.operators.Multimodal.featurizeAudio(media)
        .select(col("doc_id"), col("format"), col("sample_rate"),
          col("channels"), col("bits"), col("n_frames"), col("n_bytes"),
          round(col("mean_sample"), 6).as("mean_sample"),
          round(col("std_sample"), 6).as("std_sample"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    },

    // m07: REAL AVI/RIFF video decode + frame sampling. Every doc
    // plants a closed-form DIB-frame AVI (width cycles 4..8 so the
    // 4-byte row padding takes every value, every 5th file carries an
    // odd-sized JUNK chunk, declared metadata deliberately wrong);
    // the featurizer must chunk-walk the container, parse avih/strh/
    // strf, decode the bottom-up BGR rasters, and keep every 2nd
    // frame. The oracle knows no RIFF: it recomputes dimensions,
    // n_bytes (header+JUNK+movi layout) and the per-frame pixel
    // stats from the generator formula — a misread stride, flipped
    // row order, or swapped channel can't hash-match.
    "m07_avi_frames" -> Q(
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 5 AS INT) AS width,
        |    CAST(2 + doc_id % 3 AS INT) AS height,
        |    CAST(3 + doc_id % 6 AS INT) AS n_frames,
        |    CAST(33333 + (doc_id % 7) * 1000 AS INT) AS us_per_frame
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.width, m.height, m.us_per_frame, m.n_frames,
        |    f.i AS frame_idx,
        |    (m.doc_id*31 + f.i*17 + y.i*7 + x.i*5 + c.i*3) % 256 AS v
        |  FROM m, range(0, 8) f(i), range(0, 4) y(i), range(0, 8) x(i),
        |       range(0, 3) c(i)
        |  WHERE f.i < m.n_frames AND f.i % 2 = 0
        |    AND y.i < m.height AND x.i < m.width),
        |s AS (
        |  SELECT doc_id, frame_idx, SUM(v) AS sv,
        |    SUM(CAST(v AS DOUBLE) * v) AS svv, COUNT(*) AS n
        |  FROM px GROUP BY doc_id, frame_idx)
        |SELECT m.doc_id, 'video/avi' AS format, m.width, m.height,
        |  m.us_per_frame, m.n_frames,
        |  CAST(224 + CASE WHEN m.doc_id % 5 = 0 THEN 34 ELSE 0 END
        |    + m.n_frames * (8 + m.height * ((m.width*3+3)//4*4)) AS BIGINT)
        |    AS n_bytes,
        |  CAST(s.frame_idx AS INT) AS frame_idx,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_px,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6)
        |    AS std_px
        |FROM m JOIN s USING (doc_id)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{MediaRow, VideoCodec}
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val media = docs.map { id =>
        val w = (4 + Math.floorMod(id, 5L)).toInt
        val h = (2 + Math.floorMod(id, 3L)).toInt
        val nf = (3 + Math.floorMod(id, 6L)).toInt
        val us = (33333 + Math.floorMod(id, 7L) * 1000).toInt
        val frames = Array.tabulate(nf) { f =>
          Array.tabulate(h * w * 3) { i =>
            val y = i / (w * 3); val x = (i / 3) % w; val c = i % 3
            Math.floorMod(id * 31 + f * 17L + y * 7L + x * 5L + c * 3L,
              256L).toInt
          }
        }
        MediaRow(id, VideoCodec.encodeAvi(w, h, us, frames,
          plantJunkChunk = Math.floorMod(id, 5L) == 0L),
          "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.sampleVideoFrames(media, every = 2)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("us_per_frame"), col("n_frames"), col("n_bytes"),
          col("frame_idx"),
          round(col("mean_px"), 6).as("mean_px"),
          round(col("std_px"), 6).as("std_px"))
        .orderBy("doc_id", "frame_idx")
    },

    // m08: REAL GIF decode — the OTHER container web corpora carry,
    // and the first with palette INDIRECTION: every doc plants a
    // single-image GIF whose palette entries AND pixel indices are
    // closed-form functions of doc_id (palette size cycles 4/8/16, so
    // the LZW min code size takes 2/3/4), every 7th file is
    // interlaced or moves the palette to a LOCAL color table, every
    // 5th plants comment + graphic-control extensions (sub-block walk
    // hazard). The decoder must LZW-decompress the variable-width
    // code stream, map indices through the active color table, and
    // de-interlace — the oracle knows no GIF: it recomputes the
    // decoded bytes from palette[index(p)] arithmetic, so a misread
    // code width, palette, or table choice cannot hash-match (the
    // byte-order hazards — interlace row order, LCT bytes — are
    // pinned exactly in MultimodalSpec). n_bytes is deliberately NOT
    // projected: LZW output has no closed form (the m05 rule).
    "m08_gif_decode" -> Q(
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 5 AS INT) AS width,
        |    CAST(3 + doc_id % 4 AS INT) AS height,
        |    CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 16 END AS nc
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id,
        |    (m.doc_id * 7 + ((m.doc_id + p.i * 3) % m.nc) * 13
        |      + c.i * 101) % 256 AS v
        |  FROM m, range(0, 48) p(i), range(0, 3) c(i)
        |  WHERE p.i < m.width * m.height),
        |s AS (
        |  SELECT doc_id, SUM(v) AS sv, SUM(CAST(v AS DOUBLE) * v) AS svv,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS h0,
        |    SUM(CASE WHEN v >= 96 AND v < 128 THEN 1 ELSE 0 END) AS h3
        |  FROM px GROUP BY doc_id)
        |SELECT m.doc_id, 'image/gif' AS format, m.width, m.height,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_byte,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6)
        |    AS std_byte,
        |  round(CAST(CAST(CAST(h0 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f0,
        |  round(CAST(CAST(CAST(h3 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f3
        |FROM m JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{ImageCodec, MediaRow}
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val media = docs.map { id =>
        val w = (4 + Math.floorMod(id, 5L)).toInt
        val h = (3 + Math.floorMod(id, 4L)).toInt
        val nc = Math.floorMod(id, 3L) match {
          case 0L => 4; case 1L => 8; case _ => 16 }
        val palette = Array.tabulate(nc * 3) { i =>
          Math.floorMod(id * 7 + (i / 3) * 13L + (i % 3) * 101L, 256L).toInt
        }
        val idx = Array.tabulate(w * h)(p =>
          Math.floorMod(id + p * 3L, nc.toLong).toInt)
        val m7 = Math.floorMod(id, 7L)
        MediaRow(id, ImageCodec.encodeGif(w, h, palette, idx,
          interlaced = m7 == 1L,
          plantExtension = Math.floorMod(id, 5L) == 0L,
          localTable = m7 == 3L),
          "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.featurize(media)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          round(col("mean_byte"), 6).as("mean_byte"),
          round(col("std_byte"), 6).as("std_byte"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    },

    // m09: ANIMATED GIF frame sampling through the video path — the
    // composition model is the test: frame 0 paints the full canvas,
    // every later frame paints ONE ROW (y = f) as a sub-rectangle
    // with a TRANSPARENT index (0), so each emitted snapshot is a
    // genuine composite: painted pixels show frame f's palette color,
    // transparent ones show through to frame 0's. A decoder that
    // ignores placement, transparency, or paints frames independently
    // cannot reproduce the per-frame stats. The oracle knows no GIF —
    // it replays the composition arithmetic (painted = row in 1..f
    // AND index ≠ 0). Every 5th file carries the NETSCAPE loop
    // extension (application-extension skip hazard); delay comes from
    // the per-frame GCE. n_bytes not projected (LZW, the m05 rule).
    "m09_gif_frames" -> Q(
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(5 + doc_id % 4 AS INT) AS width,
        |    CAST(4 + doc_id % 3 AS INT) AS height,
        |    CAST(2 + doc_id % 3 AS INT) AS n_frames,
        |    CAST((4 + doc_id % 5) * 10000 AS INT) AS us_per_frame
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.width, m.height, m.n_frames, m.us_per_frame,
        |    f.i AS frame_idx,
        |    CASE WHEN y.i >= 1 AND y.i <= f.i
        |           AND (m.doc_id + y.i * 5 + x.i * 3) % 8 <> 0
        |      THEN (m.doc_id * 11
        |        + ((m.doc_id + y.i * 5 + x.i * 3) % 8) * 17 + c.i * 29) % 256
        |      ELSE (m.doc_id * 11
        |        + ((m.doc_id + (y.i * m.width + x.i) * 3) % 8) * 17
        |        + c.i * 29) % 256
        |    END AS v
        |  FROM m, range(0, 4) f(i), range(0, 6) y(i), range(0, 8) x(i),
        |       range(0, 3) c(i)
        |  WHERE f.i < m.n_frames AND f.i % 2 = 0
        |    AND y.i < m.height AND x.i < m.width),
        |s AS (
        |  SELECT doc_id, frame_idx, SUM(v) AS sv,
        |    SUM(CAST(v AS DOUBLE) * v) AS svv, COUNT(*) AS n
        |  FROM px GROUP BY doc_id, frame_idx)
        |SELECT m.doc_id, 'image/gif' AS format, m.width, m.height,
        |  m.us_per_frame, m.n_frames, CAST(s.frame_idx AS INT) AS frame_idx,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_px,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6)
        |    AS std_px
        |FROM m JOIN s USING (doc_id)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{ImageCodec, MediaRow}
      val docs = fanOut(Tables(s, dir).documents
        .select(col("doc_id").cast("long"))).as[Long]
      val media = docs.map { id =>
        val w = (5 + Math.floorMod(id, 4L)).toInt
        val h = (4 + Math.floorMod(id, 3L)).toInt
        val nf = (2 + Math.floorMod(id, 3L)).toInt
        val delay = (4 + Math.floorMod(id, 5L)).toInt
        val palette = Array.tabulate(24) { i =>
          Math.floorMod(id * 11 + (i / 3) * 17L + (i % 3) * 29L, 256L).toInt
        }
        val frames = ImageCodec.GifFrame(0, 0, w, h,
          Array.tabulate(w * h)(p => Math.floorMod(id + p * 3L, 8L).toInt),
          delay, disposal = 1) +:
          (1 until nf).map { f =>
            ImageCodec.GifFrame(0, f, w, 1,
              Array.tabulate(w)(x =>
                Math.floorMod(id + f * 5L + x * 3L, 8L).toInt),
              delay, disposal = 1, transparentIdx = 0)
          }
        MediaRow(id, ImageCodec.encodeGifAnim(w, h, palette, frames,
          loop = Math.floorMod(id, 5L) == 0L),
          "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.sampleVideoFrames(media, every = 2)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("us_per_frame"), col("n_frames"), col("frame_idx"),
          round(col("mean_px"), 6).as("mean_px"),
          round(col("std_px"), 6).as("std_px"))
        .orderBy("doc_id", "frame_idx")
    },

    // m10: REAL baseline JPEG decode — THE web-corpus container. Every
    // doc plants a grayscale JPEG of per-8x8-block FLAT values (the
    // DC-only regime where the round-trip is BIT-EXACT: the encoder's
    // q0=8 divides a flat block's F(0,0)=8·(v-128) evenly), dims
    // 8..16 x 8..14 so partial edge blocks exercise pad-and-crop,
    // every 5th file carries restart markers (DRI + RSTn resync +
    // DC-predictor reset). The decoder walks the marker stream,
    // parses DQT/DHT, Huffman-decodes with byte unstuffing, undoes DC
    // prediction, dequantizes and runs the full IDCT. The oracle
    // knows no JPEG — it recomputes pixels from the block formula, so
    // a broken Huffman table, DC predictor, quant step or IDCT
    // normalization cannot hash-match. (The AC path and color
    // pipeline are exercised by MultimodalSpec, incl. ±1
    // cross-validation against the JDK's javax.imageio JPEG codec in
    // both directions; n_bytes not projected — entropy coding has no
    // closed form, the m05 rule.)
    "m10_jpeg_decode" -> Q(
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + doc_id % 7 AS INT) AS height
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id,
        |    (m.doc_id * 7 + (x.i // 8) * 31 + (y.i // 8) * 57) % 256 AS v
        |  FROM m, range(0, 14) y(i), range(0, 16) x(i)
        |  WHERE y.i < m.height AND x.i < m.width),
        |s AS (
        |  SELECT doc_id, SUM(v) AS sv, SUM(CAST(v AS DOUBLE) * v) AS svv,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS h0,
        |    SUM(CASE WHEN v >= 96 AND v < 128 THEN 1 ELSE 0 END) AS h3
        |  FROM px GROUP BY doc_id)
        |SELECT m.doc_id, 'image/jpeg' AS format, m.width, m.height,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_byte,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6)
        |    AS std_byte,
        |  round(CAST(CAST(CAST(h0 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f0,
        |  round(CAST(CAST(CAST(h3 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f3
        |FROM m JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{JpegCodec, MediaRow}
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val media = docs.map { id =>
        val w = (8 + Math.floorMod(id, 9L)).toInt
        val h = (8 + Math.floorMod(id, 7L)).toInt
        val px = Array.tabulate(w * h) { i =>
          val bx = (i % w) / 8; val by = (i / w) / 8
          Math.floorMod(id * 7 + bx * 31L + by * 57L, 256L).toInt
        }
        MediaRow(id, JpegCodec.encodeJpeg(w, h, 1, px,
          restartEvery = if (Math.floorMod(id, 5L) == 0L) 1 else 0),
          "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.featurize(media)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          round(col("mean_byte"), 6).as("mean_byte"),
          round(col("std_byte"), 6).as("std_byte"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    },

    // REAL WebP lossless decode (m11, the m05 discipline on the
    // modern web's most common "new" image format): every document
    // plants a VP8L-coded WebP — channel count cycles gray/RGB/RGBA by
    // doc_id, and the ENCODING MODE cycles plain / subtract-green /
    // fixed-mode predictor (mode itself cycles 0..13) / color-indexing
    // palette / color-cache+LZ77+meta-prefix / color-transform, so the
    // corpus exercises every transform chain the decoder implements.
    // Lossless means the featurizer must recover width/height from the
    // parsed VP8L header and EXACT pixel stats from the fully
    // inverse-transformed raster; the oracle knows no WebP — it
    // recomputes from the generator formula, so a misread prefix code,
    // transform, palette delta or cache slot cannot match. (Gray
    // payloads decode as r=g=b RGB; their channel-replicated moments
    // and bucket fractions are bit-identical to the 1-channel ones, so
    // one oracle formula covers all three channel cycles.)
    "m11_webp_decode" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id,
        |    (d.doc_id * 11 + i * 17) % 256 AS v
        |  FROM documents d, range(0, 320) t(i)
        |  WHERE i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4)
        |    * (CASE d.doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)),
        |s AS (
        |  SELECT doc_id, SUM(v) AS sv, SUM(CAST(v AS DOUBLE) * v) AS svv,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS h0,
        |    SUM(CASE WHEN v >= 96 AND v < 128 THEN 1 ELSE 0 END) AS h3
        |  FROM px GROUP BY doc_id)
        |SELECT s.doc_id, 'image/webp' AS format,
        |  CAST(4 + s.doc_id % 5 AS INT) AS width,
        |  CAST(3 + s.doc_id % 4 AS INT) AS height,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_byte,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6) AS std_byte,
        |  round(CAST(CAST(CAST(h0 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f0,
        |  round(CAST(CAST(CAST(h3 AS DOUBLE) / n AS REAL) AS DOUBLE), 6) AS f3
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{MediaRow, Vp8lCodec}
      val docs = fanOut(Tables(s, dir).documents
        .select(col("doc_id").cast("long"))).as[Long]
      val media = docs.map { id =>
        val w = (4 + Math.floorMod(id, 5L)).toInt
        val h = (3 + Math.floorMod(id, 4L)).toInt
        val ch = Math.floorMod(id, 3L) match {
          case 0L => 1; case 1L => 3; case _ => 4 }
        val px = Array.tabulate(w * h * ch)(i =>
          Math.floorMod(id * 11 + i * 17L, 256L).toInt)
        val bytes = Math.floorMod(id, 6L) match {
          case 0L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px)
          case 1L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
            subtractGreen = true)
          case 2L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
            predictor = Math.floorMod(id / 6, 14L).toInt)
          case 3L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
            usePalette = true)
          case 4L => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
            cacheBits = 4, metaBits = 2)
          case _ => Vp8lCodec.encodeWebpVp8l(w, h, ch, px,
            colorXform = 0x2a1b0c)
        }
        MediaRow(id, bytes, "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.featurize(media)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          round(col("mean_byte"), 6).as("mean_byte"),
          round(col("std_byte"), 6).as("std_byte"),
          round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("feature"), 4).cast("double"), 6).as("f3"))
        .orderBy("doc_id")
    },

    // ANIMATED WebP through the VIDEO path (m12, the m09 discipline on
    // the VP8X/ANIM/ANMF container): frame 0 paints the full opaque
    // canvas; frame f alpha-BLENDS a growing (0,0)-anchored sub-rect
    // whose row 0 is fully transparent and rows 1..f mix transparent
    // holes (show frame 0 through) with opaque repaints — so every
    // snapshot is a genuine composite and the planted model (and its
    // oracle) is EXACTLY m09's: a decoder that misreads placement,
    // blending, or the VP8L frame payloads cannot match. Durations ride
    // the ANMF header (ms -> us_per_frame). sampleVideoFrames decimates
    // (every=2) inside the same partition-preserving flatMap.
    "m12_webp_frames" -> Q(
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(5 + doc_id % 4 AS INT) AS width,
        |    CAST(4 + doc_id % 3 AS INT) AS height,
        |    CAST(2 + doc_id % 3 AS INT) AS n_frames,
        |    CAST((4 + doc_id % 5) * 10000 AS INT) AS us_per_frame
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.width, m.height, m.n_frames, m.us_per_frame,
        |    f.i AS frame_idx,
        |    CASE WHEN y.i >= 1 AND y.i <= f.i
        |           AND (m.doc_id + y.i * 5 + x.i * 3) % 8 <> 0
        |      THEN (m.doc_id * 11
        |        + ((m.doc_id + y.i * 5 + x.i * 3) % 8) * 17 + c.i * 29) % 256
        |      ELSE (m.doc_id * 11
        |        + ((m.doc_id + (y.i * m.width + x.i) * 3) % 8) * 17
        |        + c.i * 29) % 256
        |    END AS v
        |  FROM m, range(0, 4) f(i), range(0, 6) y(i), range(0, 8) x(i),
        |       range(0, 3) c(i)
        |  WHERE f.i < m.n_frames AND f.i % 2 = 0
        |    AND y.i < m.height AND x.i < m.width),
        |s AS (
        |  SELECT doc_id, frame_idx, SUM(v) AS sv,
        |    SUM(CAST(v AS DOUBLE) * v) AS svv, COUNT(*) AS n
        |  FROM px GROUP BY doc_id, frame_idx)
        |SELECT m.doc_id, 'image/webp' AS format, m.width, m.height,
        |  m.us_per_frame, m.n_frames, CAST(s.frame_idx AS INT) AS frame_idx,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS mean_px,
        |  round(sqrt(GREATEST(svv / n
        |    - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n), 0)), 6)
        |    AS std_px
        |FROM m JOIN s USING (doc_id)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{MediaRow, Vp8lCodec}
      val docs = fanOut(Tables(s, dir).documents
        .select(col("doc_id").cast("long"))).as[Long]
      val media = docs.map { id =>
        val w = (5 + Math.floorMod(id, 4L)).toInt
        val h = (4 + Math.floorMod(id, 3L)).toInt
        val nf = (2 + Math.floorMod(id, 3L)).toInt
        val durMs = ((4 + Math.floorMod(id, 5L)) * 10).toInt
        def color(k: Long, c: Int): Int =
          Math.floorMod(id * 11 + k * 17 + c * 29, 256L).toInt
        val base = Vp8lCodec.WebpFrame(0, 0, w, h, durMs,
          blend = false, disposeBg = false,
          Array.tabulate(w * h * 4) { i =>
            if (i % 4 == 3) 255
            else color(Math.floorMod(id + (i / 4) * 3L, 8L), i % 4)
          })
        val overlays = (1 until nf).map { f =>
          Vp8lCodec.WebpFrame(0, 0, w, f + 1, durMs,
            blend = true, disposeBg = false,
            Array.tabulate(w * (f + 1) * 4) { i =>
              val p = i / 4; val y = p / w; val x = p % w
              val k = Math.floorMod(id + y * 5L + x * 3L, 8L)
              if (y == 0 || k == 0L) 0 // transparent: base shows through
              else if (i % 4 == 3) 255
              else color(k, i % 4)
            })
        }
        MediaRow(id, Vp8lCodec.encodeWebpAnim(w, h, 0xff000000,
          loop = 0, base +: overlays), "declared/wrong", 0, 0)
      }.toDF()
      Multimodal.sampleVideoFrames(media, every = 2)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("us_per_frame"), col("n_frames"), col("frame_idx"),
          round(col("mean_px"), 6).as("mean_px"),
          round(col("std_px"), 6).as("std_px"))
        .orderBy("doc_id", "frame_idx")
    }
  )
}
