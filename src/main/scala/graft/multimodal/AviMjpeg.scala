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
