package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata. At 100 TB
  * this is the layout for image/audio/video corpora: content as a
  * parquet binary column (row groups keep it out of the way of
  * metadata-only scans thanks to column pruning), typed metadata as
  * ordinary columns so filters on format/size prune before any byte
  * of content is read. */
final case class MediaRow(
  doc_id: Long, content: Array[Byte], format: String, width: Int, height: Int)

/** Extracted features per media row. */
final case class MediaFeatures(
  doc_id: Long, format: String, width: Int, height: Int, n_bytes: Long,
  mean_byte: Double, std_byte: Double, feature: Array[Float])

/** Extracted features per audio row (m06): header-parsed PCM
  * metadata + amplitude stats over the decoded samples. Opaque
  * (non-RIFF / hostile-header) payloads keep sample_rate/channels/
  * bits/n_frames at 0 and carry raw-byte stats. */
final case class AudioFeatures(
  doc_id: Long, format: String, sample_rate: Int, channels: Int,
  bits: Int, n_frames: Int, n_bytes: Long,
  mean_sample: Double, std_sample: Double, feature: Array[Float])

/** Per-sampled-frame stats from a REAL container decode (m07): one
  * row per kept frame, dimensions/timing from the parsed AVI
  * headers, pixel moments over the decoded RGB raster. */
final case class VideoFrameStats(
  doc_id: Long, format: String, width: Int, height: Int,
  us_per_frame: Int, n_frames: Int, n_bytes: Long, frame_idx: Int,
  mean_px: Double, std_px: Double)

/** Multimodal column plumbing (SURVEY §2 m01). The real thing a
  * 100 TB pipeline needs from Spark — binary schema, metadata
  * pushdown, partition-preserving batched featurization via
  * mapPartitions with typed Encoders — is all here and tested.
  *
  * The DECODE step is REAL for the containers this classpath can
  * decode without a codec dependency — 24bpp BMP and farbfeld
  * (ImageCodec): header-parsed dimensions and channel-value stats,
  * pinned against planted images (MultimodalSpec) and a DuckDB
  * oracle (m04). Payloads that aren't a known container fall back to
  * `opaqueFeatures`, the honest treatment of an undecodable blob
  * (byte moments + histogram). A production JPEG/PNG/audio decoder
  * slots into the same dispatch without touching any of the
  * Spark-side contract. mapPartitions (not a per-row UDF) is
  * deliberate: a real decoder amortizes codec init per PARTITION, the
  * same shape a Pandas-UDF batch gives PySpark.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata to each document.
    * Payload is synthesized deterministically from the text bytes
    * (UTF-8 cast); metadata derives from stable row attributes. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("content"),
      lit("fake/raw").as("format"),
      (pmod(length(col(textCol)), lit(48)) + 16).cast("int").as("width"),
      (pmod(length(col(textCol)) * 7, lit(48)) + 16).cast("int").as("height"))

  /** Opaque-payload featurizer: 8-bucket byte histogram + moments —
    * the fallback when the payload is no known container. (This was
    * the r9 "decodeStub"; it is now the documented opaque branch, the
    * honest treatment of an undecodable blob, not a stand-in.) */
  def opaqueFeatures(bytes: Array[Byte]): (Double, Double, Array[Float]) =
    valueStats(bytes.length, i => bytes(i) & 0xff)

  /** moments + 8-bucket histogram over n values in 0..255. */
  private def valueStats(n0: Int, at: Int => Int): (Double, Double, Array[Float]) = {
    val hist = new Array[Long](8)
    var sum = 0.0
    var sumSq = 0.0
    var i = 0
    while (i < n0) {
      val v = at(i)
      hist(v >>> 5) += 1
      sum += v
      sumSq += v.toDouble * v
      i += 1
    }
    val n = math.max(n0, 1).toDouble
    val mean = sum / n
    val variance = math.max(sumSq / n - mean * mean, 0.0)
    (mean, math.sqrt(variance), hist.map(h => (h / n).toFloat))
  }

  /** Frame sampling for video-like payloads: slice the binary content
    * into fixed-size frames and keep every `every`-th — the decimation
    * step before any expensive per-frame decode. Pure column
    * arithmetic on the BINARY type (substring/length/md5 all operate
    * on bytes), so it runs at scan speed and never leaves codegen;
    * emits (doc_id, frame_idx, frame_len, frame_md5). */
  def sampleFrames(media: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    val nFrames = (floor((length(col("content")) - 1) / frameBytes) + 1).cast("int")
    // decimate BEFORE slicing: only every `every`-th index is generated
    // (sequence step), so substring/md5 work is 1/every of the frames —
    // at video scale the whole point of decimation. The kept index IS
    // the original frame index.
    media.select(col("doc_id"), col("content"),
        explode(sequence(lit(0), nFrames - 1, lit(every))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        call_function("substring", col("content"),
          col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("__frame"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("__frame")).as("frame_len"),
        md5(col("__frame")).as("frame_md5"))
  }

  /** m03: binary near-dup by frame fingerprints — the multimodal twin
    * of d04. Two video-like payloads are near-dups when their sampled
    * frames mostly hash alike (frame-SET Jaccard, alignment-sensitive
    * like real perceptual frame matching). Pipeline: decimated frames
    * (1/every of the slicing work) → distinct (doc, frame-hash) sets →
    * d04's df-capped blocked self-join + exact Jaccard verify. A
    * frame hash shared by > maxFrameDf payloads (intros, test
    * patterns, black frames) is dropped before the join — the same
    * boilerplate bound that keeps d04 linear in corpus size. */
  def binaryNearDup(media: DataFrame, frameBytes: Int = 32, every: Int = 2,
      maxFrameDf: Int = 100, minJaccard: Double = 0.3): DataFrame = {
    // collect_set builds the per-doc distinct frame set in ONE shuffle
    // (replacing the old distinct + count-window pair). Deliberately
    // NOT persisted, and the result is LAZY: r10 cached the doc-level
    // frame sets so the core's three plantings of the element table
    // would scan the binary corpus once instead of three times — but
    // FunnelScaleProbe r11 measured the cached form LOSING at every
    // size (50k–200k docs × 4.5 KB blobs, parquet-backed so re-scans
    // pay real source IO): min 2.78/2.85/5.91 s cached vs
    // 2.18/2.62/4.02 s recomputed. Deserializing arrays-of-hashes from
    // the columnar cache costs more than the slicing + md5 it saves —
    // the same mechanism as the r10 IVF finding ("float-array cache
    // deserialization > assignment flops"). dev/scale_probe_r11.txt
    // has the full table; revisit only for genuinely cold remote IO.
    val docSets = sampleFrames(media, frameBytes, every)
      .groupBy("doc_id")
      .agg(collect_set(col("frame_md5")).as("__gs"))
    val items = docSets.select(col("doc_id"), lit("*").as("__blk"),
      size(col("__gs")).as("__sz"), explode(col("__gs")).as("__g"))
    Dedup.setJaccardPairs(items, "doc_id", minJaccard, maxFrameDf)
  }

  /** The audio twin of featurize (m06): RIFF/WAVE PCM payloads REALLY
    * decode — sample rate / channels / bit depth from the parsed
    * `fmt ` chunk (overriding declared metadata; the decode is the
    * authority), amplitude moments + 8-bucket histogram over the
    * decoded, 0..255-normalized samples. Same partition-preserving
    * mapPartitions shape; hostile RIFF headers degrade to the opaque
    * treatment instead of killing the job. */
  def featurizeAudio(media: DataFrame): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val decoded =
          try AudioCodec.decode(r.content)
          catch { case _: IllegalArgumentException => None }
        decoded match {
          case Some(a) =>
            val (mean, std, feat) =
              valueStats(a.samples.length, a.samples(_))
            AudioFeatures(r.doc_id, a.format, a.sampleRate, a.channels,
              a.bits, a.frames, r.content.length.toLong, mean, std, feat)
          case None =>
            val (mean, std, feat) = opaqueFeatures(r.content)
            AudioFeatures(r.doc_id, r.format, 0, 0, 0, 0,
              r.content.length.toLong, mean, std, feat)
        }
      }
    }
  }

  /** Video frame sampling with a REAL decode (m07): parse the AVI
    * container, keep every `every`-th frame of the decoded stream,
    * emit per-frame pixel stats. Decode-then-decimate happens inside
    * one partition-preserving mapPartitions pass (flatMap shape — a
    * doc fans out to its kept frames with no shuffle; at 100 TB the
    * fan-out stays executor-local and downstream aggs see a row
    * stream already partitioned by the storage key). Non-AVI payloads
    * and hostile headers contribute NO rows — the quarantine
    * treatment for a frame-level output (a doc-level featurizer
    * degrades to opaque stats; a frame table has nothing honest to
    * say about an undecodable blob). */
  def sampleVideoFrames(media: DataFrame, every: Int): Dataset[VideoFrameStats] = {
    import media.sparkSession.implicits._
    require(every >= 1, s"sampleVideoFrames: every=$every")
    media.as[MediaRow].flatMap { r =>
      val decoded =
        try VideoCodec.decode(r.content)
        catch { case _: IllegalArgumentException => None }
      decoded match {
        case Some(v) =>
          v.frames.iterator
            .filter(_.index % every == 0)
            .map { f =>
              val (mean, std, _) = valueStats(f.rgb.length, f.rgb(_))
              VideoFrameStats(r.doc_id, v.format, v.width, v.height,
                v.usPerFrame, v.frames.length, r.content.length.toLong,
                f.index, mean, std)
            }
        case None => Iterator.empty
      }
    }
  }

  /** Batched featurization: one decoder pass per partition iterator,
    * no shuffle (narrow dependency — partitioning of the input is
    * preserved, so an upstream repartition by storage key survives).
    * Known containers (BMP, farbfeld) REALLY decode: format, width
    * and height come from the parsed header (overriding the declared
    * metadata — the decode is the authority), and the moments /
    * 8-bucket histogram run over decoded channel values. Opaque
    * payloads keep the declared metadata and get raw-byte stats. */
  def featurize(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder state (buffers, JNI handles for a real
      // codec) would init HERE, once per partition
      rows.map { r =>
        // a blob whose magic says "container" but whose header is
        // corrupt/hostile must NOT kill the job at corpus scale — it
        // degrades to the opaque treatment (a real pipeline quarantines
        // on declared-vs-detected format mismatch downstream)
        val decoded =
          try ImageCodec.decode(r.content)
          catch { case _: IllegalArgumentException => None }
        decoded match {
          case Some(img) =>
            val (mean, std, feat) =
              valueStats(img.pixels.length, img.pixels(_))
            MediaFeatures(r.doc_id, img.format, img.width, img.height,
              r.content.length.toLong, mean, std, feat)
          case None =>
            val (mean, std, feat) = opaqueFeatures(r.content)
            MediaFeatures(r.doc_id, r.format, r.width, r.height,
              r.content.length.toLong, mean, std, feat)
        }
      }
    }
  }
}
