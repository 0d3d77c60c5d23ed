package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Multimodal plumbing: decode / feature-extract / resize / frame-sample
  * shapes over binary columns (codecs stubbed, Spark shapes real). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def media = Multimodal.mediaFromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("decodeMeta yields deterministic typed metadata per payload") {
    val meta = Multimodal.decodeMeta(spark, media).collect()
    assert(meta.length == media.count())
    assert(meta.forall(m => m.channels == 3 && m.header_hex.length == 16))
    assert(meta.forall(m => m.width == m.n_bytes % 640))
  }

  test("extractFeatures yields normalized fixed-width vectors") {
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(f => math.abs(f.features.sum - 1f) < 1e-3))
  }

  test("resize subsamples payload bytes") {
    val resized = Multimodal.resize(spark, media, factor = 4).collect()
    val original = Multimodal.decodeMeta(spark, media).collect()
      .map(m => m.doc_id -> m.n_bytes).toMap
    assert(resized.forall(r => r.payload.length == (original(r.doc_id) + 3) / 4))
  }

  test("sampleFrames fans one payload out to many fixed-size frames") {
    val frames = Multimodal.sampleFrames(spark, media, frameSize = 32, stride = 64).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length == 32))
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.values.exists(_.length > 1)) // real fan-out happened
    assert(byDoc.values.forall(fs => fs.map(_.frame_idx).sorted.sameElements(fs.indices)))
  }
}
