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
    * payload length, for payload types with no in-JVM codec (audio/video,
    * and the fixture's text bytes). */
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
    } catch { case _: java.io.IOException => None }
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

  /** REAL audio metadata via `javax.sound.sampled` (pure JDK, zero new
    * dependencies): WAV/AIFF container headers parse to sample rate,
    * channel count, frame count and duration — a header probe like the
    * image path, never a sample decode. Compressed formats (MP3 etc.) have
    * no JDK codec and return None; swap in a real decoder behind the same
    * slot. */
  def audioDecode(docId: Long, payload: Array[Byte]): Option[AudioMeta] = {
    if (!looksLikeAudio(payload)) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength.toLong
      val rate = math.round(fmt.getSampleRate)
      val durMs = if (rate > 0 && frames >= 0) frames * 1000L / rate else -1L
      Some(AudioMeta(docId, payload.length.toLong, rate, fmt.getChannels,
        frames, durMs))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
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
