package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with decode / feature-extract /
  * frame-sample stages.
  *
  * IMAGES are decoded for real: the JDK ships PNG/JPEG/GIF/BMP codecs
  * (`javax.imageio.ImageIO`), so [[encodeGrayPng]] / [[decodeImageFeatures]]
  * run an actual encode→decode round trip over real compressed bytes.
  * AUDIO is decoded for real too: the JDK ships WAV/AIFF/AU containers
  * (`javax.sound.sampled`), so [[encodePcmWav]] / [[decodeAudioFeatures]]
  * run an actual PCM round trip through a genuine RIFF/WAVE stream.
  * COMPRESSED audio/video codecs (opus/h264) are NOT in this container,
  * so the generic byte-level decode below remains a clearly-marked
  * deterministic STUB —
  * what is real throughout, and what this module exists to pin down, is
  * the Spark-side shape a production pipeline needs:
  *  - payloads travel as `BinaryType` columns (Tungsten keeps them
  *    off-heap; parquet stores them as BYTE_ARRAY pages) with metadata
  *    in a sibling struct so pruning works — a scan that only needs
  *    metadata never touches payload bytes;
  *  - per-partition batch processing via `mapPartitions` on a typed
  *    Dataset: the decoder is instantiated once per partition (the
  *    expensive part for real codecs), then streamed over the iterator —
  *    the JVM twin of `mapInPandas`' batch contract;
  *  - outputs are columnar-friendly (fixed-width features,
  *    `array<float>` embeddings) so downstream similarity/dedup
  *    operators (graft.operators.Similarity) compose directly.
  */
object Multimodal {

  case class MediaRecord(id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(id: Long, media_type: String, n_bytes: Long,
      mean_byte: Double, embedding: Array[Float])
  case class ImageFeatures(id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, mean_pixel: Double, embedding: Array[Float])
  case class Frame(id: Long, frame_idx: Int, offset: Long, frame_bytes: Array[Byte])

  /** Wrap any table with a binary payload column into the canonical
    * media schema. (Test data has no real media; callers typically
    * `encode(text)` or read raw files via `spark.read.format("binaryFile")`.) */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        lit(mediaType).as("media_type"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Decode + feature-extract for NON-image media, batched per
    * partition.
    *
    * STUB: `decodeBytes` stands in for an audio/video codec (absent in
    * this container). It is deterministic (byte statistics + a seeded
    * byte-hash embedding) so results are reproducible and
    * oracle-checkable; swap its body for e.g. JavaCV without touching
    * the Spark plumbing around it. Images don't need this — use the
    * real [[decodeImageFeatures]].
    */
  def decodeFeatures(media: Dataset[MediaRecord], embeddingDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: instantiate the (expensive) codec ONCE per partition here
      it.map { r =>
        val (meanByte, emb) = decodeBytes(r.payload, embeddingDim)
        MediaFeatures(r.id, r.media_type, r.payload.length.toLong,
          meanByte, emb)
      }
    }
  }

  /** STUB decode: byte statistics + deterministic hash-folded embedding.
    * A real implementation decodes pixels/samples here. */
  private def decodeBytes(payload: Array[Byte], dim: Int): (Double, Array[Float]) = {
    var sum = 0L
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      acc(i % dim) += b.toLong * (i / dim + 1)
      i += 1
    }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    val emb = acc.map(v => (v % 1000L).toFloat / 1000.0f)
    (math.round(mean * 10000.0) / 10000.0, emb)
  }

  /** REAL image encode: pack each payload's bytes row-major into a
    * `width`-pixel-wide 8-bit grayscale image (zero-padded to the last
    * row) and compress it to PNG with the JDK's `javax.imageio` codec.
    * The output payloads are genuine PNG files; pixel values survive the
    * round trip exactly (8-bit gray PNG is lossless), which is what
    * makes the decoded features oracle-checkable: every pixel is a
    * deterministic function of the input bytes even though the PNG
    * byte stream itself is codec-version-dependent. */
  def encodeGrayPng(media: Dataset[MediaRecord], width: Int = 16): Dataset[MediaRecord] = {
    require(width >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val h = math.max(1, (r.payload.length + width - 1) / width)
        val img = new java.awt.image.BufferedImage(width, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        val n = width * h
        while (i < n) {
          raster.setSample(i % width, i / width, 0,
            if (i < r.payload.length) r.payload(i) & 0xff else 0)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(r.id, "image/png", bos.toByteArray)
      }
    }
  }

  /** REAL image decode + feature extraction, batched per partition:
    * `ImageIO.read` decompresses the actual PNG/JPEG/GIF/BMP bytes,
    * then features come from the decoded raster — dimensions, mean
    * luminance (band 0), and an `embeddingDim`-band embedding (mean
    * luminance of `embeddingDim` horizontal stripes: a real, if tiny,
    * pooled-pixel feature). Undecodable payloads fail loudly rather
    * than degrade to byte statistics. */
  def decodeImageFeatures(media: Dataset[MediaRecord],
      embeddingDim: Int = 8): Dataset[ImageFeatures] = {
    require(embeddingDim >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // ImageIO scans for codec plugins on first use; per-partition reuse
      // after that — the mapPartitions boundary is where a heavier codec
      // (JavaCV etc.) would be instantiated once
      it.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"payload of id=${r.id} is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var sum = 0L
        val bandSum = new Array[Long](embeddingDim)
        val bandN = new Array[Long](embeddingDim)
        var y = 0
        while (y < h) {
          val band = math.min(embeddingDim - 1, y * embeddingDim / h)
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            bandSum(band) += v
            bandN(band) += 1
            x += 1
          }
          y += 1
        }
        val nPix = w.toLong * h
        val mean = if (nPix == 0) 0.0 else sum.toDouble / nPix
        val emb = Array.tabulate(embeddingDim)(j =>
          if (bandN(j) == 0) 0.0f else (bandSum(j).toDouble / bandN(j) / 255.0).toFloat)
        ImageFeatures(r.id, r.media_type, r.payload.length.toLong, w, h,
          math.round(mean * 10000.0) / 10000.0, emb)
      }
    }
  }

  /** REAL audio encode: each payload byte becomes one 16-bit PCM
    * sample (`(b − 128) · 256`, mono, signed little-endian) and the
    * stream is wrapped into a genuine RIFF/WAVE container by the JDK's
    * `javax.sound.sampled` codec (java.desktop ships WAV/AIFF/AU —
    * no external libs). PCM WAV is lossless, so samples survive the
    * round trip exactly: every decoded sample is a deterministic
    * function of the input bytes even though the container's header
    * bytes are writer-internal — the same oracle-ability argument as
    * [[encodeGrayPng]]. */
  def encodePcmWav(media: Dataset[MediaRecord], sampleRate: Int = 8000): Dataset[MediaRecord] = {
    require(sampleRate >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false) // 16-bit signed mono LE
      it.map { r =>
        val pcm = new Array[Byte](r.payload.length * 2)
        var i = 0
        while (i < r.payload.length) {
          val s = ((r.payload(i) & 0xff) - 128) * 256
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, r.payload.length.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(r.id, "audio/wav", bos.toByteArray)
      }
    }
  }

  case class AudioFeatures(id: Long, media_type: String, n_bytes: Long,
      sample_rate: Int, n_samples: Long, mean_amp: Double,
      zero_crossings: Long, embedding: Array[Float])

  /** REAL audio decode + feature extraction, batched per partition:
    * `AudioSystem.getAudioInputStream` parses the actual WAV container
    * and yields the PCM stream (16-bit signed mono — anything else
    * fails loudly rather than degrade to byte statistics). Features
    * come from the decoded samples: count, mean |amplitude| (scaled to
    * [0, 1]), zero-crossing count (exact integer — the classic
    * voiced/unvoiced signal), and an `embeddingDim`-band embedding
    * (mean |amplitude| of `embeddingDim` time stripes — the audio twin
    * of [[decodeImageFeatures]]' luminance bands, and the same
    * composable `array<float>` shape the similarity stack consumes). */
  def decodeAudioFeatures(media: Dataset[MediaRecord],
      embeddingDim: Int = 8): Dataset[AudioFeatures] = {
    require(embeddingDim >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // the stream parser is per-payload; a heavier codec (opus etc.)
      // would be instantiated ONCE here at the partition boundary
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"payload of id=${r.id} is not 16-bit signed mono PCM")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        var sumAbs = 0L
        var crossings = 0L
        val bandSum = new Array[Long](embeddingDim)
        val bandN = new Array[Long](embeddingDim)
        var prevNeg = false
        var i = 0
        while (i < n) {
          // first byte is high in big-endian WAVs; .toInt sign-extends
          val s = if (fmt.isBigEndian)
            (pcm(2 * i).toInt << 8) | (pcm(2 * i + 1) & 0xff)
          else (pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)
          val neg = s < 0
          if (i > 0 && neg != prevNeg) crossings += 1
          prevNeg = neg
          val a = math.abs(s).toLong
          sumAbs += a
          val band = math.min(embeddingDim - 1, i * embeddingDim / n)
          bandSum(band) += a
          bandN(band) += 1
          i += 1
        }
        val mean = if (n == 0) 0.0 else sumAbs.toDouble / n / 32768.0
        val emb = Array.tabulate(embeddingDim)(j =>
          if (bandN(j) == 0) 0.0f
          else (bandSum(j).toDouble / bandN(j) / 32768.0).toFloat)
        AudioFeatures(r.id, r.media_type, r.payload.length.toLong,
          math.round(fmt.getSampleRate), n.toLong,
          math.round(mean * 10000.0) / 10000.0, crossings, emb)
      }
    }
  }

  /** Resize, batched per partition. STUB: deterministic byte
    * downsampling stands in for pixel-space scaling — a real codec
    * would decode, scale with an interpolation kernel, and re-encode.
    * Shape matters: payload-in → payload-out keeps the record count
    * stable (unlike frame sampling), so it composes anywhere in the
    * pipeline. */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: codec + scaler instantiated once per partition here
      it.map { r =>
        val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        r.copy(payload = out)
      }
    }
  }

  /** Frame sampling: split a payload into up to `maxFrames` fixed-size
    * slices (stand-in for keyframe extraction), exploded to one row per
    * frame. Row counts multiply here — exactly like real video pipelines —
    * so this runs AFTER any payload-level filtering. */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int,
      maxFrames: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = math.min(maxFrames,
        (r.payload.length + frameSize - 1) / math.max(frameSize, 1))
      (0 until n).iterator.map { fi =>
        val off = fi.toLong * frameSize
        val end = math.min(off + frameSize, r.payload.length.toLong).toInt
        Frame(r.id, fi, off, java.util.Arrays.copyOfRange(r.payload, off.toInt, end))
      }
    }
  }
}
