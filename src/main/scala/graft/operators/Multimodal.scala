package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.8): image/audio/video payloads are
  * opaque `binary` columns with typed metadata travelling alongside. The
  * Spark-side machinery — schema, batch shape, partition-parallel decode,
  * typed aggregation — is real; the codec itself is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries), so
  * every test asserts on reproducible values. Swap [[fakeDecode]] for a real
  * decoder (JNI/FFM) without touching anything else.
  */
object Multimodal {

  /** Typed media metadata extracted by the (stubbed) decoder. */
  final case class MediaMeta(docId: Long, nBytes: Long, width: Int, height: Int, nFrames: Int)

  /** STUB decoder: deterministic pseudo-metadata derived from the payload
    * length. A real implementation parses the container header here. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, n, width = (16 + n % 64).toInt, height = (16 + (n * 7) % 64).toInt,
      nFrames = (1 + n / 100).toInt)
  }

  /** Attach an opaque binary `media` column (here: the utf-8 text bytes —
    * the fixture has no real media; the column type and row shape are what
    * matters downstream). */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

  /** Partition-parallel decode: mapPartitions over (docId, payload) so a
    * real codec amortizes per-batch setup (model load, JNI handles) across
    * each partition — the Pandas-UDF batch shape, in Scala. */
  def decodeMeta(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    implicit val enc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
    withMediaColumn(docs)
      .select(col("doc_id"), col("media"))
      .mapPartitions { rows: Iterator[Row] =>
        // a real codec opens its decoder handle ONCE here, per partition
        rows.map(row => fakeDecode(row.getLong(0), row.getAs[Array[Byte]](1)))
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
