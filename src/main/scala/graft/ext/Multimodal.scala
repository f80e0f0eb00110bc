package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-parallel batches.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (media codecs
  * are not in this container); the Spark-side shape is real: binary
  * column + typed metadata schema, `mapPartitions` batch processing with
  * case-class Encoders (the Scala analog of mapInPandas — per-partition
  * batches, no per-row driver involvement, safe at 100 TB because blobs
  * never leave executors).
  */
object Multimodal {

  /** An opaque media blob with routing metadata. */
  final case class MediaBlob(id: Long, kind: String, data: Array[Byte])

  /** Typed decode output (what a real image/audio decoder would emit). */
  final case class MediaMeta(
      id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder — deterministic arithmetic on the payload in place of a
    * real codec. A production build swaps only this function's body for
    * e.g. javax.imageio / ffmpeg bindings; the pipeline around it is
    * unchanged.
    */
  def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.data.length
    MediaMeta(
      id = b.id,
      kind = b.kind,
      n_bytes = n,
      width = 64 + n % 512,
      height = 64 + (n * 7) % 512,
      n_frames = 1 + n % 8)
  }

  /** Attach a binary payload column. For the fixtures (which carry no real
    * media) the document text is treated as the opaque blob — the point is
    * the binary-column plumbing, not the payload.
    */
  def asBlobs(docs: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "text"): Dataset[MediaBlob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).as("id"),
      lit("image").as("kind"),
      col(payloadCol).cast("binary").as("data")).as[MediaBlob]
  }

  private def isPng(d: Array[Byte]): Boolean =
    d.length >= 8 && d(0) == 0x89.toByte && d(1) == 'P' && d(2) == 'N' &&
      d(3) == 'G' && d(4) == 0x0d && d(5) == 0x0a && d(6) == 0x1a && d(7) == 0x0a

  private def isJpeg(d: Array[Byte]): Boolean =
    d.length >= 3 && d(0) == 0xff.toByte && d(1) == 0xd8.toByte && d(2) == 0xff.toByte

  /** REAL decode for the formats the bare JVM handles — PNG/JPEG via
    * `javax.imageio`, no native codec deps — with the deterministic stub
    * as the fallback for everything else. Dispatch is by content magic,
    * not the `kind` tag: the parquet fixtures carry text payloads, which
    * keep stub semantics (and the m01 oracle), while genuine image bytes
    * decode to their true dimensions.
    */
  def decodeBlob(b: MediaBlob): MediaMeta =
    if (isPng(b.data) || isJpeg(b.data)) {
      val img = try {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.data))
      } catch {
        // ImageIO throws unchecked exceptions on malformed-but-magic'd
        // payloads (IndexOutOfBounds, NegativeArraySize, CMMException…);
        // any decode failure falls back to the stub, never fails the job
        case scala.util.control.NonFatal(_) => null
      }
      if (img == null) decodeStub(b) // magic matched but payload corrupt
      else MediaMeta(b.id, b.kind, b.data.length, img.getWidth, img.getHeight, 1)
    } else decodeStub(b)

  /** Partition-parallel decode: the mapPartitions batch shape (iterator in,
    * iterator out — a real decoder amortizes codec init per partition
    * exactly here).
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(decodeBlob))
  }

  /** End-to-end: docs → blobs → decoded metadata frame. */
  def decodeDocs(spark: SparkSession, docs: DataFrame): DataFrame =
    decode(asBlobs(docs)).toDF()

  /** Resize planning: target dimensions for a max-edge constraint,
    * aspect-ratio preserved, never upscaled. Pure column arithmetic over
    * the decoded metadata — fully codegen'd, no UDF, no shuffle; the
    * actual pixel resample happens inside the (stubbed) per-partition
    * codec, but WHAT to resize to is a plan the engine computes
    * declaratively for the whole corpus.
    */
  def resizePlan(meta: DataFrame, maxEdge: Int = 224): DataFrame = {
    val scale = least(lit(1.0), lit(maxEdge.toDouble) / greatest(col("width"), col("height")))
    meta.select(
      col("id"), col("width"), col("height"),
      greatest(lit(1L), floor(col("width") * scale)).cast("int").as("out_width"),
      greatest(lit(1L), floor(col("height") * scale)).cast("int").as("out_height"))
  }

  /** Uniform frame sampling for video-ish blobs: up to `maxFrames` frames
    * per blob at a fixed stride (`ceil(n_frames / maxFrames)`). The frame
    * table is the explode of a generated sequence — rows stay on the
    * executor that holds the blob (no shuffle), and the downstream
    * per-frame decode is again partition-parallel.
    */
  def sampleFrames(meta: DataFrame, maxFrames: Int = 4): DataFrame = {
    // clamp: n_frames == 0 (still image / corrupt blob from a real codec)
    // would make the stride 0 and sequence() throw; such rows emit no frames
    val stride = greatest(lit(1),
      ceil(col("n_frames").cast("double") / maxFrames).cast("int"))
    meta.where(col("n_frames") > 0).select(
      col("id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, stride)).as("frame_idx"))
  }

  /** Byte-level feature summary (what a real extractor's pooling layer
    * reduces to): count/sum/min/max/distinct over the blob's raw bytes.
    */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Int,
      byte_sum: Long,
      byte_min: Int,
      byte_max: Int,
      n_distinct: Int)

  final case class MediaHash(id: Long, phash: Long)

  /** Average-hash perceptual signature over the payload: `bits` equal
    * byte segments, bit s set iff segment s's mean exceeds the global
    * mean. On a decoded grayscale grid this IS classic aHash; on the
    * stub payload it is the same arithmetic over raw bytes — the
    * pipeline (hash → pigeonhole Hamming join → verify) is what a
    * production build keeps when the decode stub is swapped out. The
    * comparison is exact integer cross-multiplication
    * (segSum·n > totalSum·segLen — no float means), and 60 bits keeps
    * the signature a positive BIGINT on any engine (the md5-60bit
    * precedent). One per-byte pass, typed mapPartitions.
    */
  def payloadHash(blobs: Dataset[MediaBlob], bits: Int = 60): Dataset[MediaHash] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { b =>
      val n = b.data.length
      if (n == 0) MediaHash(b.id, 0L)
      else {
        var total = 0L
        var i = 0
        while (i < n) { total += b.data(i) & 0xff; i += 1 }
        var h = 0L
        var s = 0
        while (s < bits) {
          val lo = s * n / bits
          val hi = (s + 1) * n / bits
          var segSum = 0L
          var j = lo
          while (j < hi) { segSum += b.data(j) & 0xff; j += 1 }
          // segMean > globalMean ⇔ segSum·n > total·segLen, exactly
          if (segSum * n > total * (hi - lo)) h |= 1L << s
          s += 1
        }
        MediaHash(b.id, h)
      }
    })
  }

  /** Feature extraction over raw payload bytes. This is genuinely
    * per-byte imperative work — exactly the case for typed mapPartitions
    * (SURVEY.md: RDD-style logic only where declarative ops can't reach):
    * one pass per blob, no boxing, blobs never leave their partition.
    */
  def byteFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { b =>
      var sum = 0L
      var min = 255
      var max = 0
      val seen = new Array[Boolean](256)
      var distinct = 0
      var i = 0
      while (i < b.data.length) {
        val v = b.data(i) & 0xff
        sum += v
        if (v < min) min = v
        if (v > max) max = v
        if (!seen(v)) { seen(v) = true; distinct += 1 }
        i += 1
      }
      MediaFeatures(b.id, b.data.length, sum,
        if (b.data.isEmpty) 0 else min, max, distinct)
    })
  }
}
