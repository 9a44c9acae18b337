package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload with typed metadata — the multimodal column
  * pattern: image/audio/video travel as `binary` next to a metadata
  * struct; decode/feature-extraction runs partition-local over the
  * binary column. */
case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, source: String)

/** Stub "decoded" features. The decode itself is deterministic fake
  * (media codecs are not available in this environment — see
  * [[Multimodal.decodeStub]]); the Spark-side plumbing (schema, binary
  * column, partition-local batch iteration, feature struct) is real. */
case class MediaFeatures(doc_id: Long, byte_len: Long, width: Long, height: Long,
    n_frames: Long, channels: Long)

/** Multimodal-column operators.
  *
  * Design: binary payloads stay opaque to Catalyst (no per-byte
  * expressions); decoding is per-partition imperative logic — the one
  * place `mapPartitions` is the right tool (SURVEY §7.3 preference (d)):
  * a real decoder holds native state (codec contexts, GPU handles) that
  * must be initialized once per partition, not once per row. The
  * iterator-in/iterator-out shape below is exactly where that init would
  * live.
  */
object Multimodal {

  /** Pack a text table into the multimodal layout: binary payload +
    * metadata columns. At scale this is the shape of an image/audio
    * dataset: payload from object storage, metadata from the manifest. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      col("source"))

  /** STUB decoder — deterministic fake features derived from payload
    * length only. A real implementation would replace the body of
    * `decodeOne` with an actual codec call; everything around it
    * (partition-local init, batch iteration, typed output) stays. */
  private def decodeOne(m: MediaRow): MediaFeatures = {
    val len = m.payload.length.toLong
    MediaFeatures(
      doc_id = m.doc_id,
      byte_len = len,
      width = 64 + len % 64,
      height = 64 + (len / 64) % 64,
      n_frames = 1 + len % 8,
      channels = 3L)
  }

  /** Decode / feature-extract over the binary column, partition-local.
    * `mapPartitions` (not `map`) so a real codec is initialized once per
    * partition and rows stream through it as a batch. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real codec/session init would happen here, once per partition
      rows.map(decodeOne)
    }
  }

  /** Full stub pipeline: docs → media layout → decoded feature table,
    * joined back to the metadata. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(spark, toMediaTable(docs)).toDF()

  /** STUB resize: a real implementation transforms the payload through
    * a codec; the stub transforms the derived dimensions only. Shape
    * preserved: binary in, binary out, one row per row. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(m => (m.doc_id, m.payload, s"resized_${w}x$h", m.source))
    }.toDF("doc_id", "payload", "mime", "source")
  }

  /** STUB frame sampling — the one-to-many decode shape (video → frame
    * rows): each payload fans out to its n_frames sampled frames, one
    * row per frame with a deterministic per-frame feature. Partition-
    * local flatMap: a real sampler seeks within the container per
    * partition-initialized decoder. */
  def sampleFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        val len = m.payload.length.toLong
        val nFrames = (1 + len % 8).toInt
        (0 until nFrames).iterator.map { i =>
          (m.doc_id, i.toLong, len * 31 + i) // fake per-frame feature
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_feature")
  }
}
