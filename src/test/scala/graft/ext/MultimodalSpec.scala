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

  test("decodeImages REALLY decodes JDK-codec formats; garbage stays undecoded") {
    import spark.implicits._
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17 + seed) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val payloads = Seq(
      (1L, png(20, 10, 0)), (2L, png(7, 33, 99)),
      (3L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)))
      .toDF("doc_id", "payload")
    val metas = Multimodal.decodeImages(spark, payloads).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).decoded && metas(1L).width == 20 && metas(1L).height == 10
      && metas(1L).channels == 3)
    assert(metas(2L).decoded && metas(2L).width == 7 && metas(2L).height == 33)
    assert(!metas(3L).decoded)
  }

  test("resizeImages re-encodes to the target dimensions, verified by re-decode") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val resized = Multimodal.resizeImages(spark, df, 16, 12)
    val meta = Multimodal.decodeImages(spark, resized.toDF()).collect().head
    assert(meta.decoded && meta.width == 16 && meta.height == 12)
  }

  test("decodeWav parses a real PCM RIFF header") {
    import spark.implicits._
    // handcraft a 16-bit stereo 8kHz WAV with 100 frames
    val channels = 2; val rate = 8000; val bits = 16
    val block = channels * bits / 8
    val dataSize = 100 * block
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * block).putShort(block.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    val df = Seq((1L, bb.array()), (2L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val metas = Multimodal.decodeWav(spark, df).collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).decoded && metas(1L).channels == 2
      && metas(1L).sample_rate == 8000 && metas(1L).bits_per_sample == 16
      && metas(1L).n_frames == 100L)
    assert(!metas(2L).decoded)
  }

  test("imageDHash: PNG render->decode->hash equals the direct grid computation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val viaCodec = Multimodal.imageDHash(spark,
      Multimodal.renderDocImages(spark, docs).toDF())
      .collect().map(h => h.doc_id -> h).toMap
    val direct = docs.collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val n = math.max(toks.length, 1)
      val grid = Array.tabulate(72)(p => Multimodal.tokenGray(toks(p % n)))
      r.getLong(0) -> Multimodal.dhash60(grid)
    }.toMap
    assert(viaCodec.keySet == direct.keySet)
    viaCodec.foreach { case (id, h) =>
      assert(h.decoded, s"doc $id failed to decode its own PNG")
      assert(h.sig == direct(id), s"codec-path hash mismatch for doc $id")
    }
  }

  test("imageDHash is invariant to exact pixel replication (kx upscale)") {
    import spark.implicits._
    def pngOf(grid: Array[Int], k: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9 * k, 8 * k,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8 * k; x <- 0 until 9 * k) {
        val g = grid((y / k) * 9 + (x / k))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rnd = new scala.util.Random(42)
    val grid = Array.fill(72)(rnd.nextInt(256))
    val df = Seq((1L, pngOf(grid, 1)), (2L, pngOf(grid, 2)), (3L, pngOf(grid, 5)))
      .toDF("doc_id", "payload")
    val sigs = Multimodal.imageDHash(spark, df).collect().map(h => h.sig).toSet
    assert(sigs.size == 1, "upscaled replicas must hash identically")
    assert(sigs.head == Multimodal.dhash60(grid))
  }

  test("imageDHash flags undecodable payloads instead of failing") {
    import spark.implicits._
    val df = Seq((1L, "definitely not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val h = Multimodal.imageDHash(spark, df).collect().head
    assert(!h.decoded && h.sig == 0L)
  }

  test("renderDocWavs emits real RIFF payloads the WAV decoder accepts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(20)
    val metas = Multimodal.decodeWav(spark,
      Multimodal.renderDocWavs(spark, docs).toDF()).collect()
    assert(metas.length == 20)
    assert(metas.forall(m => m.decoded && m.channels == 1 && m.sample_rate == 8000
      && m.bits_per_sample == 16 && m.n_frames == Multimodal.AudioFixtureSamples.toLong))
  }

  test("audioFingerprint: WAV render->parse->fingerprint equals the direct computation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val viaCodec = Multimodal.audioFingerprint(spark,
      Multimodal.renderDocWavs(spark, docs).toDF())
      .collect().map(h => h.doc_id -> h).toMap
    val direct = docs.collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val n = math.max(toks.length, 1)
      val samples = Array.tabulate(Multimodal.AudioFixtureSamples)(
        p => Multimodal.tokenSample(toks(p % n)))
      r.getLong(0) -> Multimodal.deltaEnergySig(samples)
    }.toMap
    assert(viaCodec.keySet == direct.keySet)
    viaCodec.foreach { case (id, h) =>
      assert(h.decoded, s"doc $id failed to parse its own WAV")
      assert(h.sig == direct(id), s"codec-path fingerprint mismatch for doc $id")
    }
  }

  test("audioFingerprint reads the first channel of interleaved stereo") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ch0 = Array.fill(Multimodal.AudioFixtureSamples)(rnd.nextInt(65536) - 32768)
    def wav(channels: Int, junkOther: Boolean): Array[Byte] = {
      val block = channels * 2
      val dataSize = ch0.length * block
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(8000)
        .putInt(8000 * block).putShort(block.toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      ch0.foreach { s =>
        bb.putShort(s.toShort)
        (1 until channels).foreach(c => bb.putShort(
          if (junkOther) rnd.nextInt(65536).toShort else 0))
      }
      bb.array()
    }
    val df = Seq((1L, wav(1, junkOther = false)), (2L, wav(2, junkOther = true)))
      .toDF("doc_id", "payload")
    val sigs = Multimodal.audioFingerprint(spark, df).collect()
      .map(h => h.doc_id -> h).toMap
    assert(sigs(1L).decoded && sigs(2L).decoded)
    assert(sigs(1L).sig == Multimodal.deltaEnergySig(ch0))
    assert(sigs(2L).sig == sigs(1L).sig, "stereo junk channel must not leak in")
  }

  test("delta-energy fingerprint is volume-scale invariant; rejects non-PCM16") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val quiet = Array.fill(Multimodal.AudioFixtureSamples)(rnd.nextInt(2000) - 1000)
    val loud = quiet.map(_ * 4)
    assert(Multimodal.deltaEnergySig(quiet) == Multimodal.deltaEnergySig(loud),
      "uniform gain must not change the fingerprint")
    val df = Seq((1L, "definitely not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val h = Multimodal.audioFingerprint(spark, df).collect().head
    assert(!h.decoded && h.sig == 0L)
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
