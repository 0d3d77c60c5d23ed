package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.4): image/audio/video payloads
  * ride as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a partition-wise typed transform.
  *
  * Decode is REAL for the formats the JDK itself ships codecs for —
  * PNG/BMP/GIF via `javax.imageio` ([[decodeImages]], [[resizeImages]]) and
  * WAV/PCM via a RIFF header parse ([[decodeWav]]) — both headless-safe and
  * dependency-free. Only formats the JVM lacks (video containers, modern
  * image codecs) keep the deterministic STUB ([[decodeMeta]]); everything
  * around it is the real Spark plumbing either way: binary columns,
  * case-class encoders, `mapPartitions` batch shape (one decoder init per
  * partition, the same shape a JNI/FFmpeg bridge needs), and column pruning
  * up front.
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

  /** Real image metadata (formats with a JDK codec: PNG, BMP, GIF, JPEG). */
  final case class ImageMeta(doc_id: Long, decoded: Boolean, width: Int,
      height: Int, channels: Int)

  /** REAL image decode via the JDK's own codecs — `ImageIO.read` is
    * headless-safe and needs no external libraries. Non-image payloads
    * yield `decoded = false` rather than failing the partition. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) ImageMeta(r.doc_id, decoded = false, -1, -1, -1)
        else ImageMeta(r.doc_id, decoded = true, img.getWidth, img.getHeight,
          img.getColorModel.getNumComponents)
      }
    }
  }

  /** REAL image resize: decode, scale with Graphics2D, re-encode PNG —
    * all JDK, all headless. Undecodable payloads pass through unchanged. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      width: Int, height: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) r
        else {
          val out = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRecord(r.doc_id, bos.toByteArray)
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // Perceptual image hashing (dHash) + the deterministic doc->image fixture
  // ---------------------------------------------------------------------

  /** dHash grid: 9 columns x 8 rows of gray cells -> 60-bit signature
    * (adjacent-column comparisons, first 60 of the 64 — 60 keeps shift
    * math portable to the DuckDB oracle, where `1 << 63` overflows, and
    * matches the engine-wide 60-bit signature conventions). */
  val DHashCols = 9
  val DHashRows = 8
  val DHashBits = 60

  /** Luma in pure integer math: (77 R + 150 G + 29 B) >> 8. Coefficients
    * sum to 256, so a gray pixel (R=G=B=v) maps to exactly v — that
    * exactness is what lets a lossless PNG round-trip feed a bit-exact
    * oracle. */
  def grayOf(rgb: Int): Int =
    (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8

  /** Deterministic box-average downsample of a decoded image to the 9x8
    * dHash grid (row-major, 72 values). Integer bounds `c*W/9 .. (c+1)*W/9`
    * and integer-division averages — no float resampling, so equal inputs
    * give equal grids on any JVM, and an exact k-times pixel replication
    * (each source pixel duplicated kxk) averages back to the source gray
    * exactly. */
  def grayGrid(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](DHashCols * DHashRows)
    var r = 0
    while (r < DHashRows) {
      val y0 = r * h / DHashRows
      val y1 = math.max(y0 + 1, (r + 1) * h / DHashRows)
      var c = 0
      while (c < DHashCols) {
        val x0 = c * w / DHashCols
        val x1 = math.max(x0 + 1, (c + 1) * w / DHashCols)
        var sum = 0L; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            sum += grayOf(img.getRGB(x, y)); n += 1; x += 1
          }
          y += 1
        }
        out(r * DHashCols + c) = if (n == 0) 0 else (sum / n).toInt
        c += 1
      }
      r += 1
    }
    out
  }

  /** 60-bit dHash from a 9x8 gray grid: bit i (i in 0..59, r = i/8,
    * c = i%8) is set iff grid[r][c] < grid[r][c+1]. */
  def dhash60(grid: Array[Int]): Long = {
    require(grid.length == DHashCols * DHashRows, "grid must be 9x8 row-major")
    var sig = 0L
    var i = 0
    while (i < DHashBits) {
      val r = i / 8; val c = i % 8
      if (grid(r * DHashCols + c) < grid(r * DHashCols + c + 1)) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** A 64-bit-capable perceptual hash result. */
  final case class ImageHash(doc_id: Long, decoded: Boolean, sig: Long)

  /** REAL perceptual hash over a binary image column: ImageIO decode (the
    * actual JDK codec), deterministic box-downsample, integer dHash.
    * Undecodable payloads yield `decoded = false, sig = 0`. */
  def imageDHash(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) ImageHash(r.doc_id, decoded = false, 0L)
        else ImageHash(r.doc_id, decoded = true, dhash60(grayGrid(img)))
      }
    }
  }

  /** Gray level a token contributes to the doc-image fixture: low byte of
    * the engine's portable 60-bit content hash, so the DuckDB oracle can
    * recompute it (`CAST(('0x' || substring(md5(t),1,15)) AS BIGINT) & 255`). */
  def tokenGray(tok: String): Int =
    (graft.functions.SimhashSig.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(tok)) & 255L).toInt

  /** Deterministic documents-as-images fixture: each doc renders to a REAL
    * 9x8 grayscale PNG whose pixel (r, c) is [[tokenGray]] of token
    * `(r*9+c) mod n` — similar texts give similar images (shared tokens at
    * shared positions), so the corpus' near-dup structure carries into
    * pixel space. PNG is lossless, which makes the decoded pixels (and
    * everything computed from them) a pure function of the text that an
    * external oracle can replicate; the codec round-trip itself stays
    * real (`ImageIO` encode here, decode in [[imageDHash]]). */
  def renderDocImages(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)].mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          val n = math.max(toks.length, 1)
          val img = new java.awt.image.BufferedImage(DHashCols, DHashRows,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var p = 0
          while (p < DHashCols * DHashRows) {
            val g = if (toks.isEmpty) tokenGray("") else tokenGray(toks(p % n))
            img.setRGB(p % DHashCols, p / DHashCols, (g << 16) | (g << 8) | g)
            p += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, bos.toByteArray)
        }
      }
  }

  /** Real WAV/PCM metadata from the RIFF header (pure byte parsing). */
  final case class WavMeta(doc_id: Long, decoded: Boolean, channels: Int,
      sample_rate: Int, bits_per_sample: Int, n_frames: Long)

  /** REAL WAV decode: RIFF/WAVE header walk — fmt chunk for channel/rate/
    * depth, data chunk for the frame count. No library involved at all. */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[WavMeta] = {
    import spark.implicits._
    def le16(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(b: Array[Byte], o: Int) =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def ascii(b: Array[Byte], o: Int) = new String(b, o, 4, "US-ASCII")
    media.select(col("doc_id"), col("payload")).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val b = r.payload
        val bad = WavMeta(r.doc_id, decoded = false, -1, -1, -1, -1L)
        if (b.length < 44 || ascii(b, 0) != "RIFF" || ascii(b, 8) != "WAVE") bad
        else {
          var off = 12
          var channels = -1; var rate = -1; var bits = -1; var block = -1
          var frames = -1L
          while (off + 8 <= b.length) {
            val id = ascii(b, off); val sz = le32(b, off + 4)
            if (id == "fmt " && off + 24 <= b.length) {
              channels = le16(b, off + 10); rate = le32(b, off + 12)
              block = le16(b, off + 20); bits = le16(b, off + 22)
            } else if (id == "data" && block > 0) frames = sz.toLong / block
            off += 8 + sz + (sz & 1) // chunks are word-aligned
          }
          if (channels > 0 && frames >= 0)
            WavMeta(r.doc_id, decoded = true, channels, rate, bits, frames)
          else bad
        }
      }
    }
  }

  /** Audio fingerprint layout: `AudioFrames` frame energies give
    * `AudioFrames - 1` delta bits — 61 frames for the house 60-bit
    * signature width, so the fingerprint rides the same banded hamming
    * join as simhash (q63) and the image dHash (q116). */
  val AudioFrames = 61
  /** Samples per fixture frame (the fingerprint itself splits whatever
    * sample count it gets into `AudioFrames` even spans). */
  val AudioFixtureFrameLen = 4
  val AudioFixtureSamples: Int = AudioFrames * AudioFixtureFrameLen

  /** PCM16 sample a token contributes to the doc-audio fixture: the
    * [[tokenGray]] byte re-centered and scaled to 16-bit
    * (`(g - 128) * 256`, range [-32768, 32512]) — same portable-hash
    * provenance, so the DuckDB oracle recomputes it from `md5`. */
  def tokenSample(tok: String): Int = (tokenGray(tok) - 128) * 256

  /** Deterministic documents-as-audio fixture: each doc renders to a REAL
    * little-endian RIFF/WAVE payload (PCM16 mono 8 kHz, canonical 44-byte
    * header) whose sample `p` is [[tokenSample]] of token `p mod n` —
    * similar texts give similar waveforms, so the corpus' near-dup
    * structure carries into sample space. PCM is lossless, which makes the
    * decoded samples (and the fingerprint computed from them) a pure
    * function of the text that an external oracle can replicate; the codec
    * round-trip itself stays real (RIFF encode here, the RIFF/PCM parse in
    * [[audioFingerprint]]). */
  def renderDocWavs(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)].mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          val n = math.max(toks.length, 1)
          val dataBytes = AudioFixtureSamples * 2
          val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
            .put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1) // PCM
            .putShort(1) // mono
            .putInt(8000).putInt(16000) // rate, byte rate
            .putShort(2).putShort(16)   // block align, bits
          buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
          var p = 0
          while (p < AudioFixtureSamples) {
            buf.putShort(tokenSample(toks(p % n)).toShort)
            p += 1
          }
          MediaRecord(id, buf.array())
        }
      }
  }

  /** 60-bit delta-energy fingerprint over PCM16 frame energies: bit `i` is
    * set iff `E(i+1) > E(i)`, where `E(j)` is the exact integer sum of
    * squared samples over the j-th of [[AudioFrames]] even spans
    * (`[j*n/F, (j+1)*n/F)`). Comparing CONSECUTIVE frame energies (not
    * absolute levels) makes the signature volume-shift tolerant in the
    * same way dHash is brightness tolerant — the standard acoustic-
    * fingerprint trick, in pure integer math. Energy fits a Long to
    * ~8.5e9 samples per frame (n/F * 2^30). */
  def deltaEnergySig(samples: Array[Int]): Long = {
    val n = samples.length
    val e = new Array[Long](AudioFrames)
    var j = 0
    while (j < AudioFrames) {
      var i = j * n / AudioFrames
      val hi = (j + 1) * n / AudioFrames
      var sum = 0L
      while (i < hi) { val s = samples(i).toLong; sum += s * s; i += 1 }
      e(j) = sum
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < AudioFrames - 1) {
      if (e(i + 1) > e(i)) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** An audio fingerprint result (60-bit signature). */
  final case class AudioHash(doc_id: Long, decoded: Boolean, sig: Long)

  /** REAL acoustic fingerprint over a binary audio column: RIFF/WAVE parse
    * (the same chunk walk as [[decodeWav]]), PCM16 sample extraction
    * (first channel), integer delta-energy signature. Payloads that are
    * not 16-bit PCM RIFF yield `decoded = false, sig = 0`. */
  def audioFingerprint(spark: SparkSession, media: DataFrame): Dataset[AudioHash] = {
    import spark.implicits._
    def le16(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(b: Array[Byte], o: Int) =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def ascii(b: Array[Byte], o: Int) = new String(b, o, 4, "US-ASCII")
    media.select(col("doc_id"), col("payload")).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val b = r.payload
        val bad = AudioHash(r.doc_id, decoded = false, 0L)
        if (b.length < 44 || ascii(b, 0) != "RIFF" || ascii(b, 8) != "WAVE") bad
        else {
          var off = 12
          var channels = -1; var bits = -1; var block = -1
          var dataOff = -1; var dataLen = -1
          while (off + 8 <= b.length) {
            val id = ascii(b, off); val sz = le32(b, off + 4)
            if (id == "fmt " && off + 24 <= b.length) {
              channels = le16(b, off + 10); block = le16(b, off + 20)
              bits = le16(b, off + 22)
            } else if (id == "data") { dataOff = off + 8; dataLen = sz }
            off += 8 + sz + (sz & 1) // chunks are word-aligned
          }
          if (channels < 1 || bits != 16 || block != channels * 2 ||
              dataOff < 0 || dataOff + dataLen > b.length) bad
          else {
            val nFrames = dataLen / block
            if (nFrames < AudioFrames) bad
            else {
              // first channel only: sample i sits at dataOff + i*block
              val samples = new Array[Int](nFrames)
              var i = 0
              while (i < nFrames) {
                val o = dataOff + i * block
                samples(i) = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
                i += 1
              }
              AudioHash(r.doc_id, decoded = true, deltaEnergySig(samples))
            }
          }
        }
      }
    }
  }

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
