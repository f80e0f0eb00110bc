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

  /** Partition-parallel decode: the mapPartitions batch shape (iterator in,
    * iterator out — a real decoder amortizes codec init per partition
    * exactly here).
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(decodeStub))
  }

  /** End-to-end: docs → blobs → decoded metadata frame. */
  def decodeDocs(spark: SparkSession, docs: DataFrame): DataFrame =
    decode(asBlobs(docs)).toDF()
}
