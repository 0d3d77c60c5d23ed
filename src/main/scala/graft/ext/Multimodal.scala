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

  /** Typed feature vector extracted from a payload. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** STUBBED feature extraction (a real impl would run an image/audio model
    * over the decoded frames): a deterministic 16-bin byte histogram,
    * L1-normalized — the batch shape (fixed-width float vector per row,
    * partition-wise) is exactly what an embedding model bridge produces. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord].mapPartitions { it =>
      // model weights would load once per partition here
      it.map { r =>
        val hist = new Array[Float](16)
        r.payload.foreach(b => hist((b & 0xff) / 16) += 1f)
        val total = math.max(1f, r.payload.length.toFloat)
        MediaFeatures(r.doc_id, hist.map(_ / total))
      }
    }
  }

  /** STUBBED resize: byte-stride subsampling standing in for image resize —
    * keeps every `factor`-th byte. Real impl: codec resize per partition. */
  def resize(spark: SparkSession, media: DataFrame, factor: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord].mapPartitions { it =>
      it.map(r => MediaRecord(r.doc_id,
        r.payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }))
    }
  }

  /** A sampled frame: parent id, frame index, frame bytes. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUBBED frame sampling: fixed-size chunks every `stride` bytes stand in
    * for video frame extraction — note the 1→N flatMap shape (one video row
    * fans out to many frame rows), which is the real plumbing a video
    * pipeline needs (explode happens executor-side, no driver involvement). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int, stride: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord].flatMap { r =>
      Iterator.range(0, math.max(0, r.payload.length - frameSize + 1), stride)
        .zipWithIndex
        .map { case (off, idx) =>
          MediaFrame(r.doc_id, idx, r.payload.slice(off, off + frameSize))
        }
    }
  }
}
