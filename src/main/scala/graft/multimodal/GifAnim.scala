package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriteParam}

/** SECOND real video-shaped container, pure JVM: animated GIF through
  * the JDK's actual GIF codec (`javax.imageio` ships LZW encode AND
  * decode — GIF is the one multi-frame format the JDK can both write
  * and read with real compression, complementing [[AviMjpeg]]'s
  * chunk-level RIFF walk with a codec-level container).
  *
  * Losslessness argument (what makes GIF pipelines oracle-checkable
  * the way the PNG path is): frames are 8-bit grayscale and GIF
  * palettes hold 256 entries, so an EXPLICIT identity gray palette
  * (index i → rgb(i,i,i)) represents every sample exactly — encode
  * quantizes nothing, LZW is lossless, and the decoded pixel equals
  * the source byte. Two JDK sharp edges are handled here and pinned in
  * MultimodalCodecSpec:
  *  - the GIF writer defaults to INTERLACED row order and the pair
  *    write-interlaced/read gave row-permuted pixels in this JDK —
  *    progressive mode is force-disabled;
  *  - a decoded frame is palette-INDEXED; pixels are read through
  *    `getRGB & 0xff` (palette lookup), never raw band-0 samples,
  *    so a reader that reorders the color table cannot corrupt
  *    values silently.
  *
  * [[GifAnimDemux]] registers as the default frame demux for
  * `image/gif`, returning each frame re-encoded as a genuine PNG
  * (pixel-lossless), so the standard demux → per-frame image model →
  * temporal pooling pipeline runs two REAL codecs deep with no
  * stand-in anywhere.
  */
object GifAnim {

  /** The identity gray palette: GIF color table index i = gray i. */
  private def grayIcm: java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Mux raw byte payloads into one animated GIF: each payload packs
    * row-major into a `width`-wide 8-bit gray frame (zero-padded to
    * the last row — the [[Multimodal.grayPngBytes]] packing) under the
    * identity palette. Output is a genuine GIF89a stream. */
  def muxGray(frames: Seq[Array[Byte]], width: Int): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(width >= 1)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    // MemoryCache stream, NOT ImageIO.createImageOutputStream: the
    // factory default is a FILE-backed cache — one temp file created
    // and deleted per muxed record, which measured as a per-run-GROWING
    // drag in the bench (tmpfs churn accumulates across a session)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(ios)
      val wp = w.getDefaultWriteParam
      // JDK writer defaults to interlaced; this JDK's write-interlaced
      // + read pair permutes rows — and non-interlaced is byte-exact
      wp.setProgressiveMode(ImageWriteParam.MODE_DISABLED)
      w.prepareWriteSequence(null)
      val icm = grayIcm
      frames.foreach { fb =>
        val h = math.max(1, (fb.length + width - 1) / width)
        val img = new BufferedImage(width, h,
          BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var i = 0
        while (i < width * h) {
          raster.setSample(i % width, i / width, 0,
            if (i < fb.length) fb(i) & 0xff else 0)
          i += 1
        }
        val md = w.getDefaultImageMetadata(new ImageTypeSpecifier(img), wp)
        w.writeToSequence(new IIOImage(img, null, md), wp)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Demux an animated GIF into per-frame PNG bytes (frameIdx, 0,
    * pngBytes) — a REAL LZW decode of every frame, then a lossless
    * PNG re-encode so downstream image stages consume the standard
    * format. Byte offsets are not meaningful after re-encoding and
    * are reported as 0. Fails loudly on non-GIF input. */
  def demuxFrames(payload: Array[Byte],
      maxFrames: Int): Iterator[(Int, Long, Array[Byte])] = {
    require(payload.length >= 6 &&
      new String(payload, 0, 3, "US-ASCII") == "GIF",
      "payload is not a GIF stream")
    val r = ImageIO.getImageReadersByFormatName("gif").next()
    // memory-cached input for the same reason as the writer side
    r.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload)))
    val n = math.min(r.getNumImages(true), maxFrames)
    (0 until n).iterator.map { f =>
      val img = r.read(f)
      // palette-indexed → gray VALUES via the color model (a reader
      // that reorders the table cannot corrupt this), packed into a
      // fresh gray raster — NOT Graphics.drawImage, whose gray color
      // space conversion is gamma-corrected and changes values
      val gray = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_BYTE_GRAY)
      val raster = gray.getRaster
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          raster.setSample(x, y, 0, img.getRGB(x, y) & 0xff)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(gray, "png", bos)
      (f, 0L, bos.toByteArray)
    }
  }
}

/** [[MediaCodecs.FrameDemuxCodec]] over [[GifAnim.demuxFrames]] —
  * registered by default for `image/gif`. `frameSize` is ignored (the
  * container defines frame boundaries); `maxFrames` caps frames read
  * (the reader stops decoding past the cap — real keyframe-sampling
  * behavior, not decode-then-discard). */
object GifAnimDemux extends MediaCodecs.FrameDemuxCodec {
  val name = "gif-anim"
  def demux(payload: Array[Byte], frameSize: Int,
      maxFrames: Int): Iterator[(Int, Long, Array[Byte])] =
    GifAnim.demuxFrames(payload, maxFrames)
}
