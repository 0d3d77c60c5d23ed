package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.4): image/audio/video payloads
  * ride as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a partition-wise typed transform.
  *
  * The DECODE STEP IS A STUB — media codecs aren't in this container — a
  * deterministic fake derives metadata from the bytes. Everything around it
  * is the real Spark plumbing: binary columns, case-class encoders,
  * `mapPartitions` batch shape (one decoder init per partition, the same
  * shape a JNI/FFmpeg bridge needs), and column pruning up front.
  */
object Multimodal {

  /** An opaque media payload + id (image bytes, audio frames, ...). */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Typed decode output: metadata a real decoder would yield. */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, header_hex: String,
      width: Int, height: Int, channels: Int)

  /** STUBBED decoder: deterministic metadata from payload bytes. A real
    * implementation would hand `payload` to an image/audio codec here —
    * one codec instance per partition, reused across the iterator. */
  private def decodeStub(r: MediaRecord): MediaMeta = {
    val header = r.payload.take(8).map(b => f"${b & 0xff}%02X").mkString
    MediaMeta(r.doc_id, r.payload.length, header,
      width = r.payload.length % 640, height = (r.payload.length * 7) % 480, channels = 3)
  }

  /** Decode a binary media column into typed metadata, partition-wise. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // decoder init would happen once per partition here
        it.map(decodeStub)
      }
  }

  /** Documents-as-media fixture: text bytes standing in for image payloads
    * (the testdata has no binary column; the plumbing is what's real). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
}
