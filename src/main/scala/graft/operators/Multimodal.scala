package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.8): image/audio/video payloads are
  * opaque `binary` columns with typed metadata travelling alongside. The
  * Spark-side machinery — schema, batch shape, partition-parallel decode,
  * typed aggregation — is real. The IMAGE codec is real too: payloads whose
  * magic bytes an installed `javax.imageio` reader recognizes (PNG, BMP,
  * JPEG, GIF, … — ships with the JDK, zero new dependencies) decode their
  * true width/height/frame-count from the container header. Audio/video
  * payloads — and the text-bytes fixture — have no in-JVM codec and fall
  * back to [[fakeDecode]], a deterministic pseudo-metadata stub, so every
  * fixture-driven test asserts on reproducible values. Swap the fallback
  * for a real A/V decoder (JNI/FFM) without touching anything else.
  */
object Multimodal {

  /** Typed media metadata extracted by the decoder. */
  final case class MediaMeta(docId: Long, nBytes: Long, width: Int, height: Int, nFrames: Int)

  /** STUB fallback decoder: deterministic pseudo-metadata derived from the
    * payload length, for payload types no real tier recognizes (the
    * fixture's text bytes, and containers whose headers fail to parse —
    * images, WAV/AIFF, MP3 and MP4 metadata are all REAL above this). */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, n, width = (16 + n % 64).toInt, height = (16 + (n * 7) % 64).toInt,
      nFrames = (1 + n / 100).toInt)
  }

  /** Magic-byte signatures of the formats the JDK ships ImageIO readers
    * for (PNG, BMP, JPEG, GIF, TIFF) — checked BEFORE any stream/SPI
    * machinery, so a non-image payload (the overwhelming majority of a
    * mixed corpus; all of the text-bytes fixture) costs one array compare
    * per row, not an ImageInputStream + reader probe (which measured 3×
    * on ext_multimodal_meta when it ran unconditionally). */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 &&
      ((p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 'B' && p(1) == 'M') ||
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
        (p(0) == 'I' && p(1) == 'I' && p(2) == 0x2A.toByte && p(3) == 0) ||
        (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 0x2A.toByte))

  /** REAL image decode via `javax.imageio`: sniff the payload's magic bytes
    * for an installed reader and, if one claims it, read width/height (and
    * frame count for multi-image containers like GIF) from the HEADER —
    * `ImageReader.getWidth(0)` never decodes the raster, so this stays a
    * cheap per-row metadata probe, not a full pixel decode. Returns None
    * for anything no reader recognizes (then: [[fakeDecode]]). */
  def imageDecode(docId: Long, payload: Array[Byte]): Option[MediaMeta] = {
    if (!looksLikeImage(payload)) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (iis == null) return None // no cache SPI available in this JVM
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
          // allowSearch: bounded by the payload (already in memory)
          val n = try math.max(r.getNumImages(true), 1)
                  catch { case _: Exception => 1 }
          Some(MediaMeta(docId, payload.length.toLong, r.getWidth(0), r.getHeight(0), n))
        } finally r.dispose()
      } // scan-time corruption (truncated header) falls through to the stub
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** The decode slot: real image metadata when a JDK reader recognizes the
    * payload, deterministic stub otherwise. */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta =
    imageDecode(docId, payload).getOrElse(fakeDecode(docId, payload))

  /** Typed AUDIO metadata — modality-specific schema, as a real pipeline
    * keys each modality to its own meta struct. */
  final case class AudioMeta(docId: Long, nBytes: Long, sampleRate: Int,
                             channels: Int, nFrames: Long, durationMs: Long)

  /** RIFF/WAVE or FORM/AIFF container signature — the same cheap pre-sniff
    * discipline as [[looksLikeImage]]. */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      ((p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
        (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
          p(8) == 'A' && p(9) == 'I' && p(10) == 'F'))

  /** REAL audio metadata, pure JDK, zero new dependencies. Two tiers:
    * WAV/AIFF containers parse via `javax.sound.sampled` (sample rate,
    * channels, frame count, duration); MP3 parses its own FRAME HEADER
    * ([[mp3Decode]] — no codec needed for metadata, only the 4-byte sync
    * word and the CBR arithmetic). Both are header probes, never a sample
    * decode. Payloads neither tier recognizes return None (then: the
    * deterministic stub). A malformed-but-sniff-passing header must never
    * fail a scan, so the catch is NonFatal, not just the checked types —
    * JDK readers can throw unchecked (ArrayIndexOutOfBounds etc.) on
    * adversarial bytes. */
  def audioDecode(docId: Long, payload: Array[Byte]): Option[AudioMeta] = {
    if (!looksLikeAudio(payload)) return mp3Decode(docId, payload)
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength.toLong
      val rate = math.round(fmt.getSampleRate)
      val durMs = if (rate > 0 && frames >= 0) frames * 1000L / rate else -1L
      Some(AudioMeta(docId, payload.length.toLong, rate, fmt.getChannels,
        frames, durMs))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // MPEG audio frame-header tables (Layer III): sample rates by version,
  // bitrates (kbps) by version class. Index 0 = "free", 15 = invalid.
  private val Mp3RatesV1 = Array(44100, 48000, 32000)
  private val Mp3RatesV2 = Array(22050, 24000, 16000)
  private val Mp3RatesV25 = Array(11025, 12000, 8000)
  private val Mp3BitrateV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** MP3 (MPEG-1/2/2.5 Layer III) metadata from the first frame header —
    * pure byte parsing, the compressed-format slot the WAV/AIFF tier can't
    * cover. Skips a leading ID3v2 tag (syncsafe size), validates the sync
    * word + version/layer/bitrate/samplerate fields, then derives sample
    * rate and channels exactly and frame count/duration by the CBR
    * estimate (audio bytes ÷ frame size; VBR streams get the first-frame
    * approximation — honest for a header probe). Returns None unless a
    * plausible Layer-III frame starts where the audio should. */
  def mp3Decode(docId: Long, payload: Array[Byte]): Option[AudioMeta] = {
    try {
      // ID3v2 tag: "ID3" + version(2) + flags(1) + syncsafe size(4)
      val off =
        if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
            payload(2) == '3') {
          10 + (((payload(6) & 0x7F) << 21) | ((payload(7) & 0x7F) << 14) |
            ((payload(8) & 0x7F) << 7) | (payload(9) & 0x7F))
        } else 0
      if (off < 0 || off + 4 > payload.length) return None
      val b1 = payload(off) & 0xFF; val b2 = payload(off + 1) & 0xFF
      val b3 = payload(off + 2) & 0xFF; val b4 = payload(off + 3) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None
      val versionBits = (b2 >> 3) & 3 // 0=MPEG2.5 1=reserved 2=MPEG2 3=MPEG1
      val layerBits = (b2 >> 1) & 3   // 1 = Layer III
      if (versionBits == 1 || layerBits != 1) return None
      val bitrateIdx = (b3 >> 4) & 0xF
      val rateIdx = (b3 >> 2) & 3
      if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
      val padding = (b3 >> 1) & 1
      val mpeg1 = versionBits == 3
      val sampleRate = (versionBits match {
        case 3 => Mp3RatesV1
        case 2 => Mp3RatesV2
        case _ => Mp3RatesV25
      })(rateIdx)
      val bitrate = (if (mpeg1) Mp3BitrateV1 else Mp3BitrateV2)(bitrateIdx) * 1000L
      val samplesPerFrame = if (mpeg1) 1152L else 576L
      val channels = if (((b4 >> 6) & 3) == 3) 1 else 2
      val frameSize = samplesPerFrame / 8L * bitrate / sampleRate + padding
      if (frameSize <= 4) return None
      val audioBytes = (payload.length - off).toLong
      val nFrames = math.max(audioBytes / frameSize, 1L)
      val durMs = nFrames * samplesPerFrame * 1000L / sampleRate
      Some(AudioMeta(docId, payload.length.toLong, sampleRate, channels,
        nFrames * samplesPerFrame, durMs))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Typed VIDEO metadata from an MP4/ISO-BMFF container: presentation
    * timescale (ticks/sec), duration in ticks and ms. */
  final case class VideoMeta(docId: Long, nBytes: Long, timescale: Long,
                             duration: Long, durationMs: Long)

  /** ISO-BMFF primitives shared by [[mp4Decode]] and [[mp4Tracks]]: 32/64
    * big-endian reads and the size+fourcc box-stream iterator (64-bit
    * largesize, size-0 to-end boxes, malformed-size stop). */
  private def mp4U32(payload: Array[Byte])(o: Int): Long =
    ((payload(o) & 0xFFL) << 24) | ((payload(o + 1) & 0xFFL) << 16) |
      ((payload(o + 2) & 0xFFL) << 8) | (payload(o + 3) & 0xFFL)

  private def mp4U64(payload: Array[Byte])(o: Int): Long =
    (mp4U32(payload)(o) << 32) | mp4U32(payload)(o + 4)

  private def mp4Fourcc(payload: Array[Byte])(o: Int): String =
    new String(payload, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the box stream in [from, until): yields (type, payloadStart,
    * payloadEnd). */
  private def mp4Boxes(payload: Array[Byte])(from: Int, until: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var o = from
      def hasNext: Boolean = o + 8 <= until
      def next(): (String, Int, Int) = {
        val sz = mp4U32(payload)(o)
        val (start, end) =
          if (sz == 1 && o + 16 <= until) (o + 16, o + mp4U64(payload)(o + 8))
          else if (sz == 0) (o + 8, until.toLong)
          else (o + 8, o + sz)
        val t = mp4Fourcc(payload)(o)
        val e = math.min(end, until.toLong).toInt
        val cur = o
        o = if (e > cur) e else until // malformed size: stop
        (t, start, math.max(e, start))
      }
    }

  /** MP4 `moov/mvhd` metadata — pure box-structure walking (size+fourcc
    * headers, 64-bit largesize, version-0/1 mvhd layouts), no codec. The
    * container's movie header carries the presentation clock: timescale +
    * duration, which is what a sampling/packing pipeline needs before it
    * ever decodes a frame. Returns None for anything that isn't an
    * `ftyp`-led box stream with a parseable `moov/mvhd`. */
  def mp4Decode(docId: Long, payload: Array[Byte]): Option[VideoMeta] = {
    val u32 = mp4U32(payload) _
    val u64 = mp4U64(payload) _
    val fourcc = mp4Fourcc(payload) _
    val boxes = mp4Boxes(payload) _
    try {
      if (payload.length < 16 || fourcc(0) != "ftyp") return None
      for {
        (t, s, e) <- boxes(0, payload.length) if t == "moov"
        (t2, s2, e2) <- boxes(s, e) if t2 == "mvhd" && s2 + 4 <= e2
      } {
        val version = payload(s2) & 0xFF
        val (ts, dur) =
          if (version == 1 && s2 + 32 <= e2) (u32(s2 + 20), u64(s2 + 24))
          else if (version == 0 && s2 + 20 <= e2) (u32(s2 + 12), u32(s2 + 16))
          else return None
        if (ts <= 0) return None
        return Some(VideoMeta(docId, payload.length.toLong, ts, dur,
          dur * 1000L / ts))
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One MP4 track's header + sample-description metadata: id from `tkhd`,
    * handler fourcc from `mdia/hdlr` ("vide"/"soun"/…), codec fourcc from
    * the first `stsd` entry ("avc1"/"hev1"/"mp4a"/…), and the 16.16-fixed
    * `tkhd` display dimensions (0 for non-visual tracks). */
  final case class TrackMeta(docId: Long, trackId: Long, handler: String,
                             codec: String, width: Long, height: Long)

  /** Per-track MP4 metadata — the `moov/trak` walk ([[mp4Decode]]'s movie
    * header companion): for each `trak`, `tkhd` (version 0/1 layouts —
    * track id at +12/+20, 16.16 width/height at +76/+88) plus the
    * `mdia/hdlr` handler type and the first `mdia/minf/stbl/stsd` entry's
    * format fourcc. Still pure box walking, no codec work — this is what
    * routing needs (video vs audio vs subtitle track counts, display size,
    * codec id) before any decoder is chosen. Empty for anything without a
    * parseable `moov`. */
  def mp4Tracks(docId: Long, payload: Array[Byte]): Seq[TrackMeta] = {
    val u32 = mp4U32(payload) _
    val fourcc = mp4Fourcc(payload) _
    val boxes = mp4Boxes(payload) _
    try {
      if (payload.length < 16 || fourcc(0) != "ftyp") return Nil
      val out = Seq.newBuilder[TrackMeta]
      for {
        (t, s, e) <- boxes(0, payload.length) if t == "moov"
        (t2, s2, e2) <- boxes(s, e) if t2 == "trak"
      } {
        var trackId = -1L
        var width = 0L
        var height = 0L
        var handler = ""
        var codec = ""
        for ((t3, s3, e3) <- boxes(s2, e2)) t3 match {
          case "tkhd" if s3 + 4 <= e3 =>
            val v = payload(s3) & 0xFF
            val idOff = if (v == 1) s3 + 20 else s3 + 12
            val whOff = if (v == 1) s3 + 88 else s3 + 76
            if (idOff + 4 <= e3) trackId = u32(idOff)
            if (whOff + 8 <= e3) {
              width = u32(whOff) >> 16 // 16.16 fixed-point display size
              height = u32(whOff + 4) >> 16
            }
          case "mdia" =>
            for ((t4, s4, e4) <- boxes(s3, e3)) t4 match {
              case "hdlr" if s4 + 12 <= e4 =>
                handler = fourcc(s4 + 4) // version/flags(4) + predefined(4)
              case "minf" =>
                for {
                  (t5, s5, e5) <- boxes(s4, e4) if t5 == "stbl"
                  (t6, s6, e6) <- boxes(s5, e5) if t6 == "stsd" && s6 + 16 <= e6
                } codec = fourcc(s6 + 8) // version/flags(4) + entry_count(4)
              case _ => ()
            }
          case _ => ()
        }
        if (trackId >= 0) out += TrackMeta(docId, trackId, handler, codec, width, height)
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Attach an opaque binary `media` column when the frame doesn't already
    * carry one (the fixture has no real media, so its utf-8 text bytes
    * stand in; a frame that brings real payload bytes keeps them — the
    * column type and row shape are what matters downstream). */
  def withMediaColumn(docs: DataFrame): DataFrame =
    if (docs.columns.contains("media")) docs
    else docs.withColumn("media", col("text").cast("binary"))

  /** Partition-parallel decode: mapPartitions over (docId, payload) so a
    * real codec amortizes per-batch setup (model load, JNI handles) across
    * each partition — the Pandas-UDF batch shape, in Scala. */
  def decodeMeta(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    implicit val enc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
    withMediaColumn(docs)
      .select(col("doc_id"), col("media"))
      .mapPartitions { rows: Iterator[Row] =>
        // a heavier codec would open its decoder handle ONCE here, per
        // partition; ImageIO's per-row header sniff needs no shared handle
        rows.map(row => decode(row.getLong(0), row.getAs[Array[Byte]](1)))
      }
  }

  /** One sampled frame row per media payload: every `stride`-th frame index
    * with a deterministic pseudo frame-hash — the exploded (doc, frame)
    * shape a video pipeline feeds to per-frame models. Pure column
    * expressions; a real codec replaces the hash with decoded bytes inside
    * the same row shape. */
  /** 60-bit DIFFERENCE hash (dHash) of an image payload — the perceptual
    * fingerprint CV pipelines dedup on: decode, area-average down to an
    * 11×6 grayscale grid, emit one bit per horizontal neighbour pair
    * (10 × 6 = 60 bits). Robust to re-encoding/resizing (the grid survives
    * both); a flipped bit per local brightness inversion, so near-identical
    * images land within a few bits of hamming distance. None for payloads
    * no ImageIO reader claims. 60 bits (not the classic 64) so the hash —
    * and the md5 fallback below — always fits a non-negative BIGINT in
    * every engine. */
  def dHash60(payload: Array[Byte]): Option[Long] =
    dHashDiffs(payload).map(signFold60)

  /** The INTEGER feature vector beneath [[dHash60]]: the 60 grayscale
    * neighbour DIFFERENCES of the 11×6 area-averaged grid, indexed so
    * that `signFold60(f)` reproduces the dHash bit layout exactly
    * (feature b drives hash bit b). The pre-sign differences carry what
    * the bits throw away — magnitude — so a cosine over them separates a
    * rescaled/brightness-shifted duplicate (differences preserved up to
    * a positive scale, cosine ≈ 1) from a distinct image that happens to
    * share some bit signs. Range per element: [−255, 255]. */
  def dHashDiffs(payload: Array[Byte]): Option[Array[Int]] = {
    if (!looksLikeImage(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val (w, h) = (11, 6)
      val scaled = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = scaled.createGraphics()
      g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING),
        0, 0, null)
      g.dispose()
      val f = new Array[Int](60)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w - 1) {
          // walk index i filled the (59 − i)-th bit in the MSB-first fold
          f(59 - i) = scaled.getRaster.getSample(x, y, 0) -
            scaled.getRaster.getSample(x + 1, y, 0)
          i += 1
          x += 1
        }
        y += 1
      }
      Some(f)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The one sign fold both hash tiers share: hash bit b is set iff
    * feature b is strictly positive — so the 60-bit pHash IS the SimHash
    * of the feature vector (Charikar 2002), which is what makes its
    * 6×10-bit bands a principled LSH candidate generator for the
    * feature's COSINE in [[semPairs]]. */
  def signFold60(f: Array[Int]): Long = {
    var bits = 0L
    var b = 0
    while (b < 60) { if (f(b) > 0) bits |= 1L << b; b += 1 }
    bits
  }

  /** Deterministic LOCALITY-SENSITIVE 60-bit fallback for non-image
    * payloads: a simhash over code-point 4-grams of the UTF-8-decoded
    * payload (decode is lossy for true binary but deterministic) — each
    * gram's md5-derived 60-bit hash votes ±1 per bit position, the sign
    * fold is the fingerprint, so near-duplicate payloads land within a few
    * bits of hamming distance (Charikar 2002), the same property [[dHash60]]
    * gives images. md5 (not xxhash) and code-point grams (not UTF-16
    * units) are deliberate: both are computable in SQL with identical
    * semantics, which is what lets `ext_multimodal_phash` hash-gate end to
    * end. Payloads under 4 code points fingerprint to 0 (no grams — the
    * documented degenerate bucket). */
  def fallbackHash60(payload: Array[Byte]): Long =
    signFold60(fallbackVotes(payload))

  /** The INTEGER feature vector beneath [[fallbackHash60]]: the 60
    * per-bit SimHash VOTE TALLIES before the sign fold (vote b drives
    * hash bit b). The tallies carry the evidence the fold throws away,
    * so near-duplicate payloads have near-parallel vote vectors (cosine
    * ≈ 1) while unrelated payloads decorrelate — the same
    * hash-is-sign-of-feature relationship [[dHashDiffs]] gives images,
    * which is what lets ONE ANN tier ([[semPairs]]) serve both payload
    * classes. |vote b| ≤ gram count ≤ payload code points. */
  def fallbackVotes(payload: Array[Byte]): Array[Int] = {
    val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val cps = s.codePoints().toArray
    val votes = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i + 4 <= cps.length) {
      val gram = new String(cps, i, 4)
      val dig = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // the top 60 bits of the first 8 digest bytes, big-endian — exactly
      // the value of the first 15 hex chars of md5's hexdigest (what the
      // oracle computes in SQL), without materializing the hex string
      var be = 0L
      var j = 0
      while (j < 8) { be = (be << 8) | (dig(j) & 0xffL); j += 1 }
      val h = be >>> 4
      var b = 0
      while (b < 60) { votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1); b += 1 }
      md.reset()
      i += 1
    }
    votes
  }

  /** One 60-bit perceptual/fallback hash per payload — partition-parallel
    * like [[decodeMeta]] (a heavier codec amortizes setup per partition).
    * Per-row decode cost DOMINATES scan cost here (an md5 per gram / a
    * full image decode per row), so a scan narrower than the cluster —
    * one small parquet file reads as ONE task — is rebalanced to full
    * parallelism first; at scale the scan already carries ≥ that many
    * partitions and the rebalance is a no-op branch. */
  def imageHashes(docs: DataFrame)(implicit spark: SparkSession): DataFrame =
    imageFeatures(docs).select(col("doc_id"), col("phash"))

  /** One decode pass, BOTH fingerprint tiers: per payload the 60-dim
    * integer feature ([[dHashDiffs]] for images, [[fallbackVotes]]
    * otherwise), its exact squared norm, and the 60-bit pHash — which is
    * by construction [[signFold60]] of the feature, so the banded-hash
    * candidate tier and the cosine-verify tier ride ONE decode (the
    * session-share discipline: callers checkpoint this frame once and
    * every phash/semantic consumer projects from it). Partition-parallel
    * like [[decodeMeta]]; the narrow-scan rebalance as in the hash-only
    * form. */
  def imageFeatures(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val src = withMediaColumn(docs).select(col("doc_id"), col("media"))
    val par = spark.sparkContext.defaultParallelism
    val balanced = if (src.rdd.getNumPartitions < par) src.repartition(par) else src
    balanced
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { row =>
          val p = row.getAs[Array[Byte]](1)
          val f = dHashDiffs(p).getOrElse(fallbackVotes(p))
          var n2 = 0L
          var b = 0
          while (b < 60) { n2 += f(b).toLong * f(b); b += 1 }
          (row.getLong(0), signFold60(f), f.map(_.toLong), n2)
        }
      }
      .toDF("doc_id", "phash", "feat", "__n2")
  }

  /** SEMANTIC near-duplicate pairs — the image side's SemDeDup split: the
    * banded pHash catches re-encodes/crops within a few flipped bits
    * ([[phashPairs]], lossless ≤ 5); a rescaled or brightness/contrast-
    * shifted duplicate can flip more bits yet keeps its underlying
    * feature vector near-PARALLEL, so this tier verifies band candidates
    * by COSINE over the integer features instead of Hamming over the
    * folded bits. Because the pHash is the feature's SimHash
    * ([[signFold60]]), its 6×10-bit bands are a principled LSH for
    * cosine: P[some band agrees] = 1 − (1 − p^10)^6 with p the per-bit
    * sign-agreement rate — near-certain for cosine ≥ 0.9, vanishing for
    * unrelated payloads (the standard SimHash-band recall trade; the
    * Hamming tier stays the lossless floor for tiny perturbations).
    *
    * Exactness: dot and norms are exact int64 (|dot| ≤ max ‖f‖² ≤
    * 60·(payload code points)² — overflow needs a 10⁸-code-point
    * payload); the one cosine division and the sqrt of the
    * double-multiplied norms are correctly-rounded IEEE on every engine,
    * so the ≥-threshold verdict is engine-independent (the oracle
    * replays it in SQL). Zero-norm features (degenerate < 4-code-point
    * payloads) never pair — cosine is undefined there.
    *
    * Scale shape: identical to [[phashPairs]] — Σ bucket² band
    * candidates, the 60-multiply verify BEFORE the pair distinct, media
    * bytes never move (callers pass the decoded [[imageFeatures]]
    * checkpoint). */
  def semPairs(features: DataFrame, minCosine: Double = 0.9): DataFrame = {
    // zero-norm features (degenerate < 4-code-point payloads) can never
    // pair — drop them BEFORE banding: they all fingerprint to phash 0,
    // so left in, a corpus's degenerate slice self-joins quadratically
    // in the key-0 bucket of every band for rows a later filter discards
    val f = features.select(col("doc_id"), col("phash"), col("feat"), col("__n2"))
      .filter(col("__n2") > 0)
    val bands = f.select(col("doc_id"), col("phash"), col("feat"), col("__n2"),
      explode(sequence(lit(0), lit(5))).as("band"))
      .withColumn("__key", expr("(phash >> (band * 10)) & 1023"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.__key") === col("b.__key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        graft.functions.VectorFns.longDot(col("a.feat"), col("b.feat"))
          .as("__dot"),
        col("a.__n2").as("__na"), col("b.__n2").as("__nb"))
      .withColumn("cosine",
        col("__dot").cast("double") /
          sqrt(col("__na").cast("double") * col("__nb").cast("double")))
      .filter(col("cosine") >= minCosine)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
      .distinct()
  }

  /** Near-duplicate pairs by hamming distance over the 60-bit hashes —
    * banded LSH exactly like the text tiers: 6 bands of 10 bits; a pair
    * within `maxHamming` < 6 flipped bits has ≥ 1 untouched band by
    * pigeonhole, so banding is LOSSLESS here (not probabilistic), and a
    * band bucket join + one bit_count verify replaces the all-pairs
    * quadratic. Candidates are Σ bucket² per band — bounded by hash
    * diversity; identical payloads collide in every band but dedup through
    * the candidate distinct. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 5): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 6,
      s"phashPairs: banding is lossless only for maxHamming < 6, got $maxHamming")
    // materialize the (tiny: one long per doc) hash frame ONCE — the
    // band self-join reads it twice, and recomputing means re-decoding
    // every payload on both sides
    val h = hashes.localCheckpoint(true)
    val bands = h.select(col("doc_id"), col("phash"),
      explode(sequence(lit(0), lit(5))).as("band"))
      .withColumn("__key", expr("(phash >> (band * 10)) & 1023"))
    // hamming-filter BEFORE the distinct: the filter keeps only true
    // near-dups (a sliver of the Σ bucket² candidates), so the pair dedup
    // runs over survivors, not the full candidate stream
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.__key") === col("b.__key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The SoftDeDup DECISION report over a pHash pair graph — shared
    * VERBATIM by the batch `ext_multimodal_dedup` and the streaming
    * maintainer ([[graft.streaming.MultimodalDedupStream.report]]), so the
    * continuous keep/reweight grid and the batch audit cannot drift: pairs
    * close into connected components ([[Dedup.duplicateClusters]] — the
    * same alternating-halving label propagation as the text tiers), then
    * every doc gets its cluster, copy count, SoftDeDup ppm weight and the
    * min-id `keep` verdict. `docs` only needs a `doc_id` column; CC runs
    * on the pair slice only, the weight/keep join-back is doc-keyed
    * ([[Dedup.softWeights]]) — media payloads never move here. */
  def softDedup(docs: DataFrame, pairs: DataFrame): DataFrame =
    Dedup.softWeights(docs, "doc_id",
        Dedup.duplicateClusters(pairs.select(col("doc_a"), col("doc_b"))))
      .withColumn("keep", col("doc_id") === col("cluster_id"))

  def frameSample(docs: DataFrame, stride: Int): DataFrame = {
    val meta = withMediaColumn(docs)
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .withColumn("n_frames", (lit(1) + col("n_bytes") / 100).cast("long"))
    meta
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
      .withColumn("frame_hash", pmod(col("doc_id") * 31 + col("frame_idx") * 7, lit(997L)))
  }

  /** Aspect-preserving resize plan: for each payload's (stub-decoded)
    * dimensions, the output box fitting the longer edge to `target` — the
    * metadata half of an image-resize stage (a real codec consumes
    * `(out_width, out_height)` and emits pixels; the planning arithmetic
    * here is the part an engine owns). All-INTEGER rounded division
    * (`(short·target + long div 2) div long`) so the plan is bit-identical
    * on every engine. Pure column expressions — zero shuffles. */
  def resizePlan(docs: DataFrame, target: Int): DataFrame = {
    val meta = withMediaColumn(docs)
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .withColumn("width", (lit(16L) + pmod(col("n_bytes"), lit(64L))))
      .withColumn("height", (lit(16L) + pmod(col("n_bytes") * 7, lit(64L))))
    val t = lit(target.toLong)
    val outW = when(col("width") >= col("height"), t)
      .otherwise(expr(s"(width * $target + (height div 2)) div height"))
    val outH = when(col("width") >= col("height"),
        expr(s"(height * $target + (width div 2)) div width"))
      .otherwise(t)
    meta.select(col("doc_id"), col("width"), col("height"),
      greatest(lit(1L), outW).as("out_width"),
      greatest(lit(1L), outH).as("out_height"))
  }

  /** Deterministic pseudo feature vector (dim `d`) from the payload — the
    * feature-extraction batch shape (one fixed-width vector per row, ready
    * for [[CentroidAgg]] / Knn). A real extractor swaps the arithmetic for a
    * model forward pass over `media`. */
  def featureVector(docs: DataFrame, d: Int): DataFrame =
    withMediaColumn(docs)
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(d - 1)),
          i => (pmod(col("n_bytes") * 13 + i * 17, lit(101L)) / 100.0).cast("float")).as("features"))

  /** Typed element-wise centroid of `array<float>` embeddings — an
    * `Aggregator` (map-side partial merge, one shuffle per group) used for
    * label centroids / cluster summaries. */
  final case class CentroidBuf(var sums: Array[Double], var n: Long)

  object CentroidAgg extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {
    override def zero: CentroidBuf = CentroidBuf(Array.empty, 0L)
    override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
      if (b.sums.isEmpty) b.sums = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { b.sums(i) += v(i); i += 1 }
      b.n += 1
      b
    }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      if (a.sums.isEmpty) b
      else if (b.sums.isEmpty) a
      else {
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.n += b.n
        a
      }
    }
    override def finish(r: CentroidBuf): Array[Double] =
      if (r.n == 0) Array.empty else r.sums.map(_ / r.n)
    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
