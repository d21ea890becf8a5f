package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL compressed-audio support, pure JVM: an IMA/DVI ADPCM codec
  * (4 bits/sample, 4:1 over 16-bit PCM) wrapped in the standard
  * Microsoft WAVE container for format tag 0x0011. The algorithm and
  * wire format are the published IMA ADPCM spec (the same scheme RFC
  * 3551 registers as DVI4 and every WAV tool ships): a 89-entry step
  * table, a 8-entry index-adaptation table, and per-sample 4-bit codes
  * produced by successive approximation against the current step.
  *
  * Everything is integer arithmetic — the encoder reconstructs each
  * sample with the decoder's own formula, so encoder-internal state and
  * decoder state are bit-identical by construction, and the whole
  * encode→decode trajectory replays exactly in the DuckDB oracle as a
  * recursive CTE over (predictor, stepIndex) (MultimodalQueries
  * `q_adpcm_roundtrip`).
  *
  * Container layout (WAVE fmt 0x0011, mono):
  * {{{
  * RIFF <sz> WAVE
  *   fmt  <20>  tag=0x11 ch=1 rate avgBps blockAlign bits=4 cb=2 spb
  *   fact <4>   total sample count (blocks are padded; this truncates)
  *   data <sz>  blocks: [s0:int16le][stepIndex:u8][0:u8] + nibble bytes
  * }}}
  * Each `blockAlign`-byte block carries `(blockAlign-4)*2 + 1` samples:
  * the header stores sample 0 verbatim (it re-seeds the predictor) and
  * each following byte packs two 4-bit codes, LOW nibble first. The
  * final block zero-pads unused nibbles; the `fact` count drops them on
  * decode. The running step index carries across blocks (seeded at 0),
  * as standard encoders do.
  */
object ImaAdpcm {

  val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adaptation by code's magnitude bits (code & 7). */
  val indexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampSample(s: Int): Int =
    if (s > 32767) 32767 else if (s < -32768) -32768 else s

  private def clampIndex(i: Int): Int =
    if (i > 88) 88 else if (i < 0) 0 else i

  /** One encode step: code for `sample` given state, plus the
    * reconstructed sample and next state (== what the decoder will
    * compute for that code). */
  def encodeStep(pred: Int, index: Int, sample: Int): (Int, Int, Int) = {
    val step = stepTable(index)
    var diff = sample - pred
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    if (diff >= step) { code |= 4; diff -= step }
    if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) code |= 1
    val (newPred, newIndex) = decodeStep(pred, index, code)
    (code, newPred, newIndex)
  }

  /** One decode step: next (predictor, stepIndex) for a 4-bit code —
    * the predictor IS the decoded sample. */
  def decodeStep(pred: Int, index: Int, code: Int): (Int, Int) = {
    val step = stepTable(index)
    var diffq = step >> 3
    if ((code & 4) != 0) diffq += step
    if ((code & 2) != 0) diffq += step >> 1
    if ((code & 1) != 0) diffq += step >> 2
    val next = clampSample(if ((code & 8) != 0) pred - diffq else pred + diffq)
    (next, clampIndex(index + indexTable(code & 7)))
  }

  /** Samples per `blockAlign`-byte mono block (header sample + 2 per
    * nibble byte). */
  def samplesPerBlock(blockAlign: Int): Int = (blockAlign - 4) * 2 + 1

  /** Encode 16-bit samples into a standard WAVE (fmt 0x0011) byte
    * stream. `blockAlign` must be ≥ 8 and a multiple of 4 (the spec's
    * alignment for mono nibble data). */
  def encodeWav(samples: Array[Int], sampleRate: Int,
      blockAlign: Int = 256): Array[Byte] = {
    require(sampleRate >= 1, "need sampleRate >= 1")
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign must be >= 8 and a multiple of 4, got $blockAlign")
    val spb = samplesPerBlock(blockAlign)
    val nBlocks = (samples.length + spb - 1) / spb
    val dataLen = nBlocks * blockAlign
    val avgBps = (sampleRate.toLong * blockAlign / spb).toInt
    val out = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 20 + 8 + 4 + 8 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
    out.putShort(0x0011).putShort(1).putInt(sampleRate).putInt(avgBps)
    out.putShort(blockAlign.toShort).putShort(4) // wBitsPerSample = 4
    out.putShort(2).putShort(spb.toShort)        // cbSize, samplesPerBlock
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var index = 0 // running step index carries across blocks
    var b = 0
    while (b < nBlocks) {
      val base = b * spb
      val s0 = clampSample(samples(base))
      out.putShort(s0.toShort).put(index.toByte).put(0.toByte)
      var pred = s0
      var i = 1
      var nibbleLow = -1 // pending low nibble, or -1
      while (i < spb) {
        val code =
          if (base + i < samples.length) {
            val (c, p, ix) = encodeStep(pred, index, samples(base + i))
            pred = p; index = ix; c
          } else 0 // zero-pad past the end; `fact` truncates on decode
        if (nibbleLow < 0) nibbleLow = code
        else { out.put((nibbleLow | (code << 4)).toByte); nibbleLow = -1 }
        i += 1
      }
      if (nibbleLow >= 0) out.put(nibbleLow.toByte)
      b += 1
    }
    out.array()
  }

  /** Decode a WAVE (fmt 0x0011, mono) byte stream back to
    * (sampleRate, 16-bit samples). Fails loudly on anything that is
    * not a mono IMA-ADPCM WAV. */
  def decodeWav(payload: Array[Byte], id: Long = -1L): (Int, Array[Int]) = {
    val in = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(in.remaining >= 12, s"id=$id: payload too short for RIFF")
    val riff = fourcc(in); in.getInt
    val wave = fourcc(in)
    require(riff == "RIFF" && wave == "WAVE",
      s"id=$id: not a RIFF/WAVE stream")
    var sampleRate = -1
    var blockAlign = -1
    var factSamples = -1L
    var data: Array[Byte] = null
    while (in.remaining >= 8) {
      val id4 = fourcc(in)
      val sz = in.getInt
      val next = in.position() + sz + (sz & 1) // chunks are even-padded
      // a corrupt/negative chunk size would move the walk BACKWARD and
      // spin this loop forever inside an executor task — fail loudly
      // instead (the documented malformed-container contract)
      require(sz >= 0, s"id=$id: chunk $id4: malformed size $sz")
      id4 match {
        case "fmt " =>
          val tag = in.getShort & 0xffff
          val ch = in.getShort & 0xffff
          require(tag == 0x0011 && ch == 1,
            s"id=$id: not mono IMA ADPCM (tag=0x${tag.toHexString}, ch=$ch)")
          sampleRate = in.getInt
          in.getInt // avg bytes/sec
          blockAlign = in.getShort & 0xffff
          require((in.getShort & 0xffff) == 4, s"id=$id: bits/sample != 4")
        case "fact" => factSamples = in.getInt.toLong & 0xffffffffL
        case "data" =>
          data = new Array[Byte](sz)
          in.get(data)
        case _ => () // skip LIST/INFO chunks
      }
      in.position(math.min(next, in.limit()))
    }
    require(sampleRate > 0 && blockAlign >= 8 && data != null,
      s"id=$id: missing fmt or data chunk")
    val spb = samplesPerBlock(blockAlign)
    val nBlocks = data.length / blockAlign
    val total =
      if (factSamples >= 0) factSamples.toInt else nBlocks * spb
    val out = new Array[Int](total)
    var emitted = 0
    var b = 0
    while (b < nBlocks && emitted < total) {
      val base = b * blockAlign
      var pred = ((data(base + 1).toInt << 8) | (data(base) & 0xff))
      var index = clampIndex(data(base + 2) & 0xff)
      out(emitted) = pred
      emitted += 1
      var i = 0
      val nNibbles = math.min((blockAlign - 4) * 2, total - emitted)
      while (i < nNibbles) {
        val byte = data(base + 4 + (i >> 1)) & 0xff
        val code = if ((i & 1) == 0) byte & 0x0f else byte >> 4
        val (p, ix) = decodeStep(pred, index, code)
        pred = p; index = ix
        out(emitted) = pred
        emitted += 1
        i += 1
      }
      b += 1
    }
    require(emitted == total,
      s"id=$id: data chunk truncated ($emitted of $total samples)")
    (sampleRate, out)
  }

  private def fourcc(b: ByteBuffer): String = {
    val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
  }
}
