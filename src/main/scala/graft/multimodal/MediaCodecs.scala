package graft.multimodal

import scala.collection.concurrent.TrieMap

/** Pluggable media-codec registry — the one-class swap point for real
  * compressed codecs (opus, h264, …) that this container cannot carry
  * (no ffmpeg/JavaCV jars; documented in README §multimodal).
  *
  * Design:
  *  - Codecs are small `Serializable` strategy objects implementing one
  *    of the SPI traits below. The JDK-backed defaults ([[ImageIoCodec]]
  *    PNG/JPEG/GIF/BMP, [[JavaSoundCodec]] WAV/AIFF/AU) and the
  *    pure-JVM [[ImaAdpcmWavCodec]] (IMA ADPCM compressed audio) are
  *    REAL codecs; [[ByteSliceDemux]] and [[ByteStatsCodec]] are the
  *    documented deterministic stand-ins for the absent compressed
  *    codecs.
  *  - Registration is DRIVER-side, keyed by media_type prefix
  *    (longest-prefix match, so registering "video/h264" overrides the
  *    catch-all "" without touching other types). The operators in
  *    [[Multimodal]] snapshot the registry into an immutable map at
  *    PLAN-BUILD time and ship that snapshot inside the task closure —
  *    no executor-side registration step, no mutable global on the
  *    executor path, and a query plan keeps the codecs it was built
  *    with even if the registry changes afterwards (same capture
  *    discipline as Spark's own closure handling).
  *  - A registered codec must be `Serializable` (it travels in the
  *    closure) and thread-safe or cheap to call per record; expensive
  *    native contexts belong in a lazy per-JVM field inside the codec
  *    object (the mapPartitions batch contract in [[Multimodal]] keeps
  *    per-record overhead amortized).
  *
  * Swapping in a real video codec is then literally one class:
  * {{{
  *   object H264Demux extends MediaCodecs.FrameDemuxCodec {
  *     val name = "h264-javacv"
  *     def demux(payload: Array[Byte], frameSize: Int, maxFrames: Int) =
  *       ... // FFmpegFrameGrabber over payload, yield keyframes
  *   }
  *   MediaCodecs.registerDemux("video/", H264Demux)
  *   // q_video_pooled_embedding now runs unchanged through H264Demux
  * }}}
  */
object MediaCodecs {

  // javax.imageio defaults to a DISK-backed stream cache: every
  // ImageIO.read/write on a non-file stream spills through a temp file
  // (one create+delete per codec call — 10 per doc on the A/V
  // pipeline, tens of thousands per query at sf0.1, and the churn
  // degrades with filesystem state over a long bench session). All
  // payloads here are small in-memory byte arrays, so force the
  // memory-backed cache once per JVM — executors hit this static init
  // the first time any codec class loads.
  javax.imageio.ImageIO.setUseCache(false)

  /** Still-image decode to 8-bit grayscale (band 0): payload →
    * (width, height, row-major samples, one Int in [0,255] per pixel). */
  trait GrayImageCodec extends Serializable {
    def name: String
    def decodeGray(payload: Array[Byte], id: Long): (Int, Int, Array[Int])
  }

  /** Audio decode to 16-bit signed PCM: payload →
    * (sampleRate, samples as Int in [-32768, 32767]). */
  trait PcmAudioCodec extends Serializable {
    def name: String
    def decodePcm(payload: Array[Byte], id: Long): (Int, Array[Int])
  }

  /** Container demux / keyframe sampling: payload → up to `maxFrames`
    * (frameIdx, byteOffset, frameBytes) slices. */
  trait FrameDemuxCodec extends Serializable {
    def name: String
    def demux(payload: Array[Byte], frameSize: Int,
        maxFrames: Int): Iterator[(Int, Long, Array[Byte])]
  }

  /** Opaque feature decode for media with no richer SPI: payload →
    * (mean level in [0,255], dim-length embedding). */
  trait MediaFeatureCodec extends Serializable {
    def name: String
    def decode(payload: Array[Byte], dim: Int): (Double, Array[Float])
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP
    * ship with java.desktop — no external jars). Undecodable payloads
    * fail loudly rather than degrade to byte statistics. */
  object ImageIoCodec extends GrayImageCodec {
    val name = "jdk-imageio"
    def decodeGray(payload: Array[Byte], id: Long): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, s"payload of id=$id is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, px)
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * containers ship with java.desktop). Only 16-bit signed mono PCM is
    * accepted — anything else fails loudly.
    *
    * Canonical little-endian RIFF/WAVE PCM16-mono payloads (what
    * [[Multimodal.encodePcmWav]] produces) take a direct chunk-parser
    * fast path ([[parseRiffPcm16Mono]]): `AudioSystem.getAudioInputStream`
    * resolves its reader through a JVM-GLOBAL synchronized provider
    * registry (`JDK13Services.getProviders`) on EVERY call, and under
    * the round-16 read-side fan-out that per-row lock serialized the
    * 32-way audio stages into a convoy (measured 2–3× slower than
    * single-task). Anything the strict parser does not recognize —
    * AIFF, AU, multi-channel or non-PCM WAVs, malformed chunks — falls
    * back to the full javax.sound path, so accepted formats, decoded
    * samples, and error messages are unchanged (equivalence pinned in
    * MultimodalCodecSpec). */
  object JavaSoundCodec extends PcmAudioCodec {
    val name = "jdk-javasound"
    def decodePcm(payload: Array[Byte], id: Long): (Int, Array[Int]) =
      parseRiffPcm16Mono(payload) match {
        case Some(res) => res
        case None => decodePcmJavaSound(payload, id)
      }

    /** The original registry-resolved decode — the fallback for every
      * container the strict fast-path parser declines. */
    private[multimodal] def decodePcmJavaSound(payload: Array[Byte],
        id: Long): (Int, Array[Int]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"payload of id=$id is not 16-bit signed mono PCM")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        // first byte is high in big-endian WAVs; .toInt sign-extends
        samples(i) = if (fmt.isBigEndian)
          (pcm(2 * i).toInt << 8) | (pcm(2 * i + 1) & 0xff)
        else (pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)
        i += 1
      }
      (math.round(fmt.getSampleRate), samples)
    }

    /** Strict canonical-WAV parser: returns the (sampleRate, samples)
      * of a little-endian RIFF/WAVE whose fmt chunk says linear PCM,
      * 1 channel, 16 bits — None for everything else (fall back, don't
      * guess). Chunk walk honors the even-byte padding rule; samples
      * decode exactly as the javax.sound path does for this format
      * (LE int16, sign-extended). */
    private[multimodal] def parseRiffPcm16Mono(
        p: Array[Byte]): Option[(Int, Array[Int])] = {
      def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      def u32(o: Int): Long = (u16(o).toLong | (u16(o + 2).toLong << 16))
      def tag(o: Int, s: String): Boolean =
        p(o) == s.charAt(0) && p(o + 1) == s.charAt(1) &&
          p(o + 2) == s.charAt(2) && p(o + 3) == s.charAt(3)
      if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
      var off = 12
      var rate = -1L
      var fmtOk = false
      var dataOff = -1
      var dataLen = -1
      while (off + 8 <= p.length) {
        val sz = u32(off + 4)
        if (sz < 0 || off + 8 + sz > p.length) return None // malformed
        if (tag(off, "fmt ")) {
          if (sz < 16) return None
          fmtOk = u16(off + 8) == 1 && u16(off + 10) == 1 &&
            u16(off + 22) == 16
          rate = u32(off + 12)
          if (!fmtOk || rate < 1 || rate > Int.MaxValue) return None
        } else if (tag(off, "data") && dataOff < 0) {
          dataOff = off + 8
          dataLen = sz.toInt
        }
        off += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
      }
      if (!fmtOk || dataOff < 0) return None
      val n = dataLen / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) = (p(dataOff + 2 * i + 1).toInt << 8) |
          (p(dataOff + 2 * i) & 0xff)
        i += 1
      }
      Some((rate.toInt, samples))
    }
  }

  /** REAL compressed-audio decode: IMA/DVI ADPCM in the standard WAVE
    * fmt-0x0011 container, 4 bits/sample ([[ImaAdpcm]] — pure-integer
    * published spec, no external libs). Registered for `audio/adpcm`
    * so compressed payloads flow through [[Multimodal.decodeAudioFeatures]]
    * / [[Multimodal.audioQualityFeatures]] unchanged. */
  object ImaAdpcmWavCodec extends PcmAudioCodec {
    val name = "ima-adpcm-wav"
    def decodePcm(payload: Array[Byte], id: Long): (Int, Array[Int]) =
      ImaAdpcm.decodeWav(payload, id)
  }

  /** Marker for codecs that produce DETERMINISTIC PSEUDO-output
    * rather than a real decode — the container-absent compressed
    * codecs' placeholders. Operators surface the resolved codec's
    * name in their output (`codec` column) and offer a
    * `requireReal` switch that makes resolution of a stand-in a loud
    * failure, so a pipeline composing real codecs can never silently
    * ingest pseudo-features for, say, an opus payload. */
  trait StandIn { self: Serializable => }

  /** True iff the codec is a documented stand-in, not a real decode. */
  def isStandIn(c: AnyRef): Boolean = c.isInstanceOf[StandIn]

  /** STAND-IN demux: fixed-size byte slices in payload order — the
    * deterministic placeholder for a real keyframe extractor (h264
    * libs absent in this container). Oracle-checkable: every slice is
    * a pure function of the payload bytes. */
  object ByteSliceDemux extends FrameDemuxCodec with StandIn {
    val name = "byte-slice"
    def demux(payload: Array[Byte], frameSize: Int,
        maxFrames: Int): Iterator[(Int, Long, Array[Byte])] = {
      val n = math.min(maxFrames,
        (payload.length + frameSize - 1) / math.max(frameSize, 1))
      (0 until n).iterator.map { fi =>
        val off = fi.toLong * frameSize
        val end = math.min(off + frameSize, payload.length.toLong).toInt
        (fi, off, java.util.Arrays.copyOfRange(payload, off.toInt, end))
      }
    }
  }

  /** STAND-IN opaque decode: byte statistics + a deterministic
    * hash-folded embedding (the placeholder for opus/h264 feature
    * extraction). */
  object ByteStatsCodec extends MediaFeatureCodec with StandIn {
    val name = "byte-stats"
    def decode(payload: Array[Byte], dim: Int): (Double, Array[Float]) = {
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
  }

  // ---- registry: media_type prefix → codec, longest-prefix wins ----
  private val imageReg = TrieMap[String, GrayImageCodec]("" -> ImageIoCodec)
  private val audioReg = TrieMap[String, PcmAudioCodec](
    "" -> JavaSoundCodec,
    // REAL compressed audio out of the box: IMA ADPCM payloads decode
    // through the pure-integer [[ImaAdpcm]] state machine
    "audio/adpcm" -> ImaAdpcmWavCodec)
  private val demuxReg = TrieMap[String, FrameDemuxCodec](
    "" -> ByteSliceDemux,
    // REAL container demux out of the box: AVI payloads walk the RIFF
    // chunk stream ([[AviMjpegDemux]]); everything else keeps the
    // documented byte-slice stand-in until a codec is registered
    "video/x-msvideo" -> AviMjpegDemux,
    "video/avi" -> AviMjpegDemux,
    // REAL multi-frame decode out of the box for animated GIFs: every
    // frame LZW-decodes through the JDK's actual GIF reader
    "image/gif" -> GifAnimDemux)
  private val featureReg =
    TrieMap[String, MediaFeatureCodec]("" -> ByteStatsCodec)

  def registerImage(prefix: String, c: GrayImageCodec): Unit =
    imageReg.put(prefix, c)
  def registerAudio(prefix: String, c: PcmAudioCodec): Unit =
    audioReg.put(prefix, c)
  def registerDemux(prefix: String, c: FrameDemuxCodec): Unit =
    demuxReg.put(prefix, c)
  def registerFeature(prefix: String, c: MediaFeatureCodec): Unit =
    featureReg.put(prefix, c)

  /** Remove a registration (the "" catch-all defaults cannot be
    * removed — only overridden by re-registering ""). */
  def unregisterImage(prefix: String): Unit =
    if (prefix.nonEmpty) imageReg.remove(prefix)
  def unregisterAudio(prefix: String): Unit =
    if (prefix.nonEmpty) audioReg.remove(prefix)
  def unregisterDemux(prefix: String): Unit =
    if (prefix.nonEmpty) demuxReg.remove(prefix)
  def unregisterFeature(prefix: String): Unit =
    if (prefix.nonEmpty) featureReg.remove(prefix)

  // plan-build-time snapshots (immutable — safe to ship in closures)
  def imageSnapshot: Map[String, GrayImageCodec] = imageReg.toMap
  def audioSnapshot: Map[String, PcmAudioCodec] = audioReg.toMap
  def demuxSnapshot: Map[String, FrameDemuxCodec] = demuxReg.toMap
  def featureSnapshot: Map[String, MediaFeatureCodec] = featureReg.toMap

  /** Longest registered prefix of `mediaType` ("" catch-all always
    * matches a null/unknown type). */
  def resolve[C](snapshot: Map[String, C], mediaType: String): C = {
    val mt = Option(mediaType).getOrElse("")
    snapshot(snapshot.keysIterator.filter(mt.startsWith).maxBy(_.length))
  }
}
