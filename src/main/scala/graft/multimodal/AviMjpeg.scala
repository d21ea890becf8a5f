package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL video-container support, pure JVM: a minimal RIFF/AVI muxer +
  * demuxer for MJPEG-style streams (each frame an independently-coded
  * JPEG — the classic capture format, and the one video container a
  * zero-dependency JVM can both read and write for real). Wire format
  * follows the AVI RIFF spec (Microsoft Video for Windows):
  *
  * {{{
  * RIFF <size> 'AVI '
  *   LIST <size> 'hdrl'
  *     avih <56>            main header (µs/frame, frames, dims, …)
  *     LIST <size> 'strl'
  *       strh <56>          stream header ('vids'/'MJPG', scale/rate)
  *       strf <40>          BITMAPINFOHEADER
  *   LIST <size> 'movi'
  *     00dc <n> <jpeg bytes> [pad to even]   — one chunk per frame
  *   idx1 <16·frames>       chunk index (offset, length per frame)
  * }}}
  *
  * The demuxer walks the chunk stream structurally (fourcc + size),
  * so it accepts any AVI whose frames live in '00dc'/'00db' chunks —
  * the JPEG payloads then decode through the REAL ImageIO codec via
  * [[MediaCodecs.ImageIoCodec]]. Registered as the default
  * [[MediaCodecs.FrameDemuxCodec]] for `video/x-msvideo` / `video/avi`
  * media types ([[AviMjpegDemux]]), which makes
  * [[Multimodal.sampleFrames]] a real container demux on real AVIs
  * while other media types keep the documented byte-slice stand-in.
  * Compressed inter-frame codecs (h264/opus) remain out of reach in
  * this container (no native libs) — swapping one in is one more
  * registered class, the same seam this codec plugs into.
  */
object AviMjpeg {

  private val FOURCC_SIZE = 8 // fourcc + u32 size

  private def u32(b: ByteBuffer): Long = b.getInt.toLong & 0xffffffffL

  private def fourcc(b: ByteBuffer): String = {
    val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
  }

  /** Mux independently-coded frames (JPEG bytes from e.g.
    * `ImageIO.write(img, "jpg", …)`) into a spec-shaped AVI. The
    * output is a genuine RIFF/AVI file (plays in VLC/ffprobe-clean for
    * MJPEG frames); byte-exact frame payload round trip is guaranteed
    * ([[demuxFrames]] returns the identical chunk bytes). */
  def mux(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(width > 0 && height > 0 && fps > 0)
    val maxFrame = frames.map(_.length).max
    def chunkLen(n: Int) = FOURCC_SIZE + n + (n & 1) // even padding
    val moviBody = frames.map(f => chunkLen(f.length)).sum
    val hdrlSize = 4 + (FOURCC_SIZE + 56) + (FOURCC_SIZE + 4 +
      (FOURCC_SIZE + 56) + (FOURCC_SIZE + 40))
    val moviSize = 4 + moviBody
    val idx1Size = 16 * frames.size
    val riffSize = 4 + (FOURCC_SIZE + hdrlSize) + (FOURCC_SIZE + moviSize) +
      (FOURCC_SIZE + idx1Size)
    val out = ByteBuffer.allocate(FOURCC_SIZE + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    def putCc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    putCc("RIFF"); out.putInt(riffSize); putCc("AVI ")
    // ---- LIST hdrl ----
    putCc("LIST"); out.putInt(hdrlSize); putCc("hdrl")
    putCc("avih"); out.putInt(56)
    out.putInt(1000000 / fps) // dwMicroSecPerFrame
    out.putInt(maxFrame * fps) // dwMaxBytesPerSec
    out.putInt(0) // dwPaddingGranularity
    out.putInt(0x10) // dwFlags: AVIF_HASINDEX
    out.putInt(frames.size) // dwTotalFrames
    out.putInt(0) // dwInitialFrames
    out.putInt(1) // dwStreams
    out.putInt(maxFrame) // dwSuggestedBufferSize
    out.putInt(width); out.putInt(height)
    (0 until 4).foreach(_ => out.putInt(0)) // dwReserved
    // ---- LIST strl ----
    putCc("LIST"); out.putInt(4 + (FOURCC_SIZE + 56) + (FOURCC_SIZE + 40))
    putCc("strl")
    putCc("strh"); out.putInt(56)
    putCc("vids"); putCc("MJPG")
    out.putInt(0) // dwFlags
    out.putInt(0) // wPriority + wLanguage
    out.putInt(0) // dwInitialFrames
    out.putInt(1) // dwScale
    out.putInt(fps) // dwRate (rate/scale = fps)
    out.putInt(0) // dwStart
    out.putInt(frames.size) // dwLength
    out.putInt(maxFrame) // dwSuggestedBufferSize
    out.putInt(-1) // dwQuality
    out.putInt(0) // dwSampleSize
    out.putShort(0); out.putShort(0) // rcFrame left, top
    out.putShort(width.toShort); out.putShort(height.toShort)
    putCc("strf"); out.putInt(40)
    out.putInt(40) // biSize
    out.putInt(width); out.putInt(height)
    out.putShort(1) // biPlanes
    out.putShort(24) // biBitCount
    putCc("MJPG") // biCompression
    out.putInt(width * height * 3) // biSizeImage
    out.putInt(0); out.putInt(0) // biXPelsPerMeter, biYPelsPerMeter
    out.putInt(0); out.putInt(0) // biClrUsed, biClrImportant
    // ---- LIST movi ----
    putCc("LIST"); out.putInt(moviSize); putCc("movi")
    val offsets = new Array[Int](frames.size) // offset of chunk within movi
    var moviPos = 4 // after the 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = moviPos
      putCc("00dc"); out.putInt(f.length); out.put(f)
      if ((f.length & 1) == 1) out.put(0.toByte)
      moviPos += chunkLen(f.length)
    }
    // ---- idx1 ----
    putCc("idx1"); out.putInt(idx1Size)
    frames.zipWithIndex.foreach { case (f, i) =>
      putCc("00dc")
      out.putInt(0x10) // AVIIF_KEYFRAME (every MJPEG frame is one)
      out.putInt(offsets(i))
      out.putInt(f.length)
    }
    out.array()
  }

  /** Mux BOTH modalities into one AVI: stream 0 'vids' frames (as in
    * [[mux]]) + stream 1 'auds' 16-bit signed mono LE PCM. The audio
    * stream header is a WAVEFORMATEX strf (wFormatTag=1 PCM,
    * nBlockAlign=2, cbSize=0) and the samples land in a '01wb' movi
    * chunk; idx1 indexes both streams. The video demux
    * ([[demuxFrames]]) takes only '…dc'/'…db' chunks and the audio
    * demux ([[demuxAudioPcm]]) only '…wb' chunks, so the streams
    * cannot bleed into each other — byte-exact round trip on each
    * (pinned in MultimodalCodecSpec).
    *
    * `pcm` is raw 16-bit LE mono sample bytes (even length required) —
    * the exact byte layout [[Multimodal.encodePcmWav]] feeds the WAV
    * container, so the demuxed track re-wraps as a genuine WAV via
    * [[Multimodal.wrapPcmWav]] into the real javax.sound decode path. */
  def muxAv(frames: Seq[Array[Byte]], pcm: Array[Byte], width: Int,
      height: Int, fps: Int = 25, sampleRate: Int = 8000): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(width > 0 && height > 0 && fps > 0 && sampleRate > 0)
    require((pcm.length & 1) == 0,
      s"pcm must be whole 16-bit samples, got ${pcm.length} bytes")
    val maxFrame = frames.map(_.length).max
    val nSamples = pcm.length / 2
    def chunkLen(n: Int) = FOURCC_SIZE + n + (n & 1) // even padding
    val moviBody = frames.map(f => chunkLen(f.length)).sum + chunkLen(pcm.length)
    val strlVidSize = 4 + (FOURCC_SIZE + 56) + (FOURCC_SIZE + 40)
    val strlAudSize = 4 + (FOURCC_SIZE + 56) + (FOURCC_SIZE + 18)
    val hdrlSize = 4 + (FOURCC_SIZE + 56) +
      (FOURCC_SIZE + strlVidSize) + (FOURCC_SIZE + strlAudSize)
    val moviSize = 4 + moviBody
    val idx1Size = 16 * (frames.size + 1)
    val riffSize = 4 + (FOURCC_SIZE + hdrlSize) + (FOURCC_SIZE + moviSize) +
      (FOURCC_SIZE + idx1Size)
    val out = ByteBuffer.allocate(FOURCC_SIZE + riffSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    def putCc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    putCc("RIFF"); out.putInt(riffSize); putCc("AVI ")
    // ---- LIST hdrl ----
    putCc("LIST"); out.putInt(hdrlSize); putCc("hdrl")
    putCc("avih"); out.putInt(56)
    out.putInt(1000000 / fps) // dwMicroSecPerFrame
    out.putInt(maxFrame * fps + sampleRate * 2) // dwMaxBytesPerSec
    out.putInt(0) // dwPaddingGranularity
    out.putInt(0x10) // dwFlags: AVIF_HASINDEX
    out.putInt(frames.size) // dwTotalFrames
    out.putInt(0) // dwInitialFrames
    out.putInt(2) // dwStreams: vids + auds
    out.putInt(maxFrame) // dwSuggestedBufferSize
    out.putInt(width); out.putInt(height)
    (0 until 4).foreach(_ => out.putInt(0)) // dwReserved
    // ---- LIST strl (stream 0: vids) ----
    putCc("LIST"); out.putInt(strlVidSize); putCc("strl")
    putCc("strh"); out.putInt(56)
    putCc("vids"); putCc("MJPG")
    out.putInt(0) // dwFlags
    out.putInt(0) // wPriority + wLanguage
    out.putInt(0) // dwInitialFrames
    out.putInt(1) // dwScale
    out.putInt(fps) // dwRate (rate/scale = fps)
    out.putInt(0) // dwStart
    out.putInt(frames.size) // dwLength (frames)
    out.putInt(maxFrame) // dwSuggestedBufferSize
    out.putInt(-1) // dwQuality
    out.putInt(0) // dwSampleSize (0: chunk = one sample/frame)
    out.putShort(0); out.putShort(0) // rcFrame left, top
    out.putShort(width.toShort); out.putShort(height.toShort)
    putCc("strf"); out.putInt(40)
    out.putInt(40) // biSize
    out.putInt(width); out.putInt(height)
    out.putShort(1) // biPlanes
    out.putShort(24) // biBitCount
    putCc("MJPG") // biCompression
    out.putInt(width * height * 3) // biSizeImage
    out.putInt(0); out.putInt(0) // biXPelsPerMeter, biYPelsPerMeter
    out.putInt(0); out.putInt(0) // biClrUsed, biClrImportant
    // ---- LIST strl (stream 1: auds) ----
    putCc("LIST"); out.putInt(strlAudSize); putCc("strl")
    putCc("strh"); out.putInt(56)
    putCc("auds"); out.putInt(1) // handler: PCM
    out.putInt(0) // dwFlags
    out.putInt(0) // wPriority + wLanguage
    out.putInt(0) // dwInitialFrames
    out.putInt(1) // dwScale
    out.putInt(sampleRate) // dwRate (samples/sec)
    out.putInt(0) // dwStart
    out.putInt(nSamples) // dwLength (samples)
    out.putInt(pcm.length) // dwSuggestedBufferSize
    out.putInt(-1) // dwQuality
    out.putInt(2) // dwSampleSize: nBlockAlign (16-bit mono)
    out.putShort(0); out.putShort(0); out.putShort(0); out.putShort(0) // rcFrame
    putCc("strf"); out.putInt(18) // WAVEFORMATEX
    out.putShort(1) // wFormatTag: PCM
    out.putShort(1) // nChannels: mono
    out.putInt(sampleRate) // nSamplesPerSec
    out.putInt(sampleRate * 2) // nAvgBytesPerSec
    out.putShort(2) // nBlockAlign
    out.putShort(16) // wBitsPerSample
    out.putShort(0) // cbSize
    // ---- LIST movi: frame chunks then the audio track ----
    putCc("LIST"); out.putInt(moviSize); putCc("movi")
    val offsets = new Array[Int](frames.size + 1)
    var moviPos = 4 // after the 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = moviPos
      putCc("00dc"); out.putInt(f.length); out.put(f)
      if ((f.length & 1) == 1) out.put(0.toByte)
      moviPos += chunkLen(f.length)
    }
    offsets(frames.size) = moviPos
    putCc("01wb"); out.putInt(pcm.length); out.put(pcm)
    if ((pcm.length & 1) == 1) out.put(0.toByte)
    // ---- idx1 ----
    putCc("idx1"); out.putInt(idx1Size)
    frames.zipWithIndex.foreach { case (f, i) =>
      putCc("00dc")
      out.putInt(0x10) // AVIIF_KEYFRAME
      out.putInt(offsets(i))
      out.putInt(f.length)
    }
    putCc("01wb"); out.putInt(0x10); out.putInt(offsets(frames.size))
    out.putInt(pcm.length)
    out.array()
  }

  /** Demux the AUDIO track of an AVI payload: the concatenated bytes
    * of every '…wb' movi chunk, byte-for-byte — the inverse of
    * [[muxAv]]'s audio leg (which writes one chunk; interleaved files
    * with per-frame audio chunks concatenate in stream order, which IS
    * the track). Video chunks ('…dc'/'…db') are skipped, so the
    * streams cannot bleed — the mirror of [[demuxFrames]], which skips
    * '…wb'. Fails loudly on non-RIFF/AVI input; an AVI with no audio
    * stream yields an empty array. */
  def demuxAudioPcm(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    walkMovi(payload) { (cc, data) =>
      if (cc.endsWith("wb")) out.write(data)
    }
    out.toByteArray
  }

  /** Shared movi chunk walk: locate the movi LIST and visit every
    * chunk (descending into 'rec ' grouping sublists) with its fourcc
    * and exact payload bytes. */
  private def walkMovi(payload: Array[Byte])(
      visit: (String, Array[Byte]) => Unit): Unit = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(b.remaining >= 12, "payload too short for a RIFF header")
    require(fourcc(b) == "RIFF", "payload is not a RIFF container")
    u32(b) // riff size (trust the chunk walk, not the header)
    require(fourcc(b) == "AVI ", "RIFF payload is not an AVI")
    var moviStart = -1
    var moviEnd = -1
    while (moviStart < 0 && b.remaining >= FOURCC_SIZE) {
      val cc = fourcc(b)
      val size = u32(b).toInt
      require(size >= 0, s"chunk $cc: malformed size $size") // no backward walk
      if (cc == "LIST") {
        val listType = fourcc(b)
        if (listType == "movi") {
          moviStart = b.position()
          moviEnd = moviStart + size - 4
        } else b.position(b.position() + size - 4 + (size & 1))
      } else b.position(b.position() + size + (size & 1))
    }
    require(moviStart >= 0, "AVI has no movi LIST")
    var pos = moviStart
    while (pos + FOURCC_SIZE <= moviEnd) {
      b.position(pos)
      val cc = fourcc(b)
      val size = u32(b).toInt
      // a corrupt chunk size must throw, not move the walk backward
      // into an infinite executor-task loop (the ImaAdpcm.decodeWav
      // malformed-container contract)
      require(size >= 0 && pos + FOURCC_SIZE + size <= moviEnd,
        s"chunk $cc: malformed size $size at offset $pos")
      val dataPos = b.position()
      if (cc == "LIST" && size >= 4) {
        pos = dataPos + 4 // 'rec ' grouping list: descend
      } else {
        pos = dataPos + size + (size & 1)
        val data = new Array[Byte](size)
        b.get(data)
        visit(cc, data)
      }
    }
  }

  /** Demux an AVI payload into (frameIdx, byteOffset-in-payload,
    * frameBytes) — the exact '00dc'/'00db' chunk payloads, byte-for-
    * byte. Structural parse (no codec assumptions): locates the
    * 'movi' LIST and walks its chunk stream, honoring even padding and
    * skipping non-frame chunks ('rec ' sublists are descended into).
    * Fails loudly on non-RIFF/AVI input rather than degrading. */
  def demuxFrames(payload: Array[Byte]): Iterator[(Int, Long, Array[Byte])] = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(b.remaining >= 12, "payload too short for a RIFF header")
    require(fourcc(b) == "RIFF", "payload is not a RIFF container")
    u32(b) // riff size (trust the chunk walk, not the header)
    require(fourcc(b) == "AVI ", "RIFF payload is not an AVI")
    // walk top-level chunks to the movi LIST
    var moviStart = -1
    var moviEnd = -1
    while (moviStart < 0 && b.remaining >= FOURCC_SIZE) {
      val cc = fourcc(b)
      val size = u32(b).toInt
      require(size >= 0, s"chunk $cc: malformed size $size") // no backward walk
      if (cc == "LIST") {
        val listType = fourcc(b)
        if (listType == "movi") {
          moviStart = b.position()
          moviEnd = moviStart + size - 4
        } else b.position(b.position() + size - 4 + (size & 1))
      } else b.position(b.position() + size + (size & 1))
    }
    require(moviStart >= 0, "AVI has no movi LIST")
    new Iterator[(Int, Long, Array[Byte])] {
      private var pos = moviStart
      private var idx = 0
      private var nextFrame: (Int, Long, Array[Byte]) = null
      private def advance(): Unit = {
        nextFrame = null
        while (nextFrame == null && pos + FOURCC_SIZE <= moviEnd) {
          b.position(pos)
          val cc = fourcc(b)
          val size = u32(b).toInt
          // corrupt size → throw, don't walk backward forever
          require(size >= 0 && pos + FOURCC_SIZE + size <= moviEnd,
            s"chunk $cc: malformed size $size at offset $pos")
          val dataPos = b.position()
          if (cc == "LIST" && size >= 4) {
            // 'rec ' grouping list: descend (its chunks follow inline)
            pos = dataPos + 4
          } else {
            pos = dataPos + size + (size & 1)
            if (cc.endsWith("dc") || cc.endsWith("db")) {
              val data = new Array[Byte](size)
              b.get(data)
              nextFrame = (idx, dataPos.toLong, data)
              idx += 1
            }
          }
        }
      }
      advance()
      def hasNext: Boolean = nextFrame != null
      def next(): (Int, Long, Array[Byte]) = {
        val f = nextFrame; advance(); f
      }
    }
  }
}

/** [[MediaCodecs.FrameDemuxCodec]] over [[AviMjpeg.demuxFrames]] —
  * registered by default for AVI media types. `frameSize` is ignored
  * (a real container defines its own frame boundaries); `maxFrames`
  * caps the frames taken, like keyframe sampling. */
object AviMjpegDemux extends MediaCodecs.FrameDemuxCodec {
  val name = "avi-mjpeg"
  def demux(payload: Array[Byte], frameSize: Int,
      maxFrames: Int): Iterator[(Int, Long, Array[Byte])] =
    AviMjpeg.demuxFrames(payload).take(maxFrames)
}
