package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImaAdpcmSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, Array[Byte])*) =
    Multimodal.asMedia(
      rows.toDF("id", "payload"), "id", "payload", "audio/raw")

  test("encodeStep/decodeStep: hand-computed first transitions of the " +
      "published state machine") {
    // pred=0, idx=0 (step 7), sample 100: diff=100 ≥ 7, ≥ 3, ≥ 1 →
    // code 7; diffq = 0 + 7 + 3 + 1 = 11; index += 8
    val (code, pred, idx) = ImaAdpcm.encodeStep(0, 0, 100)
    assert(code === 7 && pred === 11 && idx === 8)
    assert(ImaAdpcm.decodeStep(0, 0, 7) === ((11, 8)))
    // negative direction: sample -100 mirrors with the sign bit
    val (code2, pred2, idx2) = ImaAdpcm.encodeStep(0, 0, -100)
    assert(code2 === 15 && pred2 === -11 && idx2 === 8)
    // code 0 still moves by step>>3 and walks the index down
    assert(ImaAdpcm.decodeStep(100, 8, 0) === ((100 + (ImaAdpcm.stepTable(8) >> 3), 7)))
  }

  test("encodeWav produces a spec-shaped WAVE fmt-0x0011 container " +
      "and decodeWav inverts it bit-exactly on codec state") {
    val samples = Array.tabulate(300)(i => (math.sin(i / 10.0) * 8000).toInt)
    val wav = ImaAdpcm.encodeWav(samples, sampleRate = 8000, blockAlign = 68)
    // container: RIFF/WAVE magic, fmt tag 0x11 at offset 20
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    assert(((wav(21).toInt << 8) | (wav(20) & 0xff)) === 0x0011)
    // 300 samples / 129 per 68-byte block → 3 blocks + 60-byte header
    assert(wav.length === 60 + 3 * 68)
    val (rate, dec) = ImaAdpcm.decodeWav(wav)
    assert(rate === 8000 && dec.length === 300)
    // block-header samples are stored verbatim (zero error)
    assert(dec(0) === samples(0) && dec(129) === samples(129) &&
      dec(258) === samples(258))
    // adaptive tracking: the cold-start attack transient is real ADPCM
    // behavior (index climbs 8/step from 0), but once warmed the step
    // follows the ~800/sample slope and the error stays near one step
    val errs = samples.indices.map(i => math.abs(samples(i) - dec(i)))
    assert(errs.drop(40).max <= 1200,
      s"steady-state err ${errs.drop(40).max} too large for a smooth signal")
    assert(errs.max <= 4096, s"attack transient err ${errs.max} unbounded")
    // 4:1-ish compression vs 16-bit PCM (600 bytes) — container and all
    assert(wav.length < 300)
  }

  test("decodeWav: empty stream, fact-truncated tail, and loud " +
      "failure on non-ADPCM input") {
    val empty = ImaAdpcm.encodeWav(Array.empty[Int], 8000, 68)
    assert(empty.length === 60)
    val (rate0, dec0) = ImaAdpcm.decodeWav(empty)
    assert(rate0 === 8000 && dec0.length === 0)
    // 130 samples → 2 blocks, second nearly all padding; fact drops it
    val s130 = Array.tabulate(130)(i => i * 10)
    assert(ImaAdpcm.decodeWav(ImaAdpcm.encodeWav(s130, 8000, 68))._2.length === 130)
    // a PCM WAV (tag 1) must be rejected, not misdecoded
    val pcmWav = Multimodal.encodePcmWav(media((1L, Array[Byte](1, 2, 3))))
      .collect().head.payload
    val e = intercept[IllegalArgumentException](ImaAdpcm.decodeWav(pcmWav, 7L))
    assert(e.getMessage.contains("id=7"))
  }

  test("registry routing: encodeImaAdpcmWav payloads decode through " +
      "the audio registry unchanged — decodeAudioFeatures and " +
      "audioQualityFeatures run the compressed path with no caller code") {
    val payload = "hello adpcm world, a slowly varying byte stream"
      .getBytes("US-ASCII")
    val adpcm = Multimodal.encodeImaAdpcmWav(media((1L, payload)))
    val rec = adpcm.collect().head
    assert(rec.media_type === "audio/adpcm")
    // features flow through MediaCodecs.resolve → ImaAdpcmWavCodec
    val f = Multimodal.decodeAudioFeatures(adpcm).collect().head
    assert(f.sample_rate === 8000 && f.n_samples === payload.length.toLong)
    val q = Multimodal.audioQualityFeatures(adpcm).collect().head
    assert(q.n_samples === payload.length.toLong && q.peak > 0)
    // and the decoded stream is the ADPCM reconstruction of the exact
    // PCM mapping (b − 128)·256 — sample 0 survives verbatim
    val (_, dec) = ImaAdpcm.decodeWav(rec.payload)
    assert(dec(0) === ((payload(0) & 0xff) - 128) * 256)
  }

  test("adpcmRoundTripStats: exact stats vs a local replay; empty " +
      "payload scores the all-zero row with the bare container size") {
    val payload = "graft".getBytes("US-ASCII")
    val out = Multimodal.adpcmRoundTripStats(
        media((1L, payload), (2L, Array.empty[Byte])),
        blockAlign = 68)
      .collect().map(r => r.id -> r).toMap
    val samples = payload.map(b => ((b & 0xff) - 128) * 256)
    val (_, dec) = ImaAdpcm.decodeWav(ImaAdpcm.encodeWav(samples, 8000, 68))
    val errs = samples.indices.map(i => math.abs(samples(i) - dec(i)))
    val got = out(1L)
    assert(got.n_samples === 5L && got.compressed_bytes === 128L)
    assert(got.max_abs_err === errs.max)
    assert(got.mean_abs_err ===
      math.round(errs.sum.toDouble / 5 * 1e6) / 1e6)
    assert(got.decoded_sum === dec.map(_.toLong).sum)
    val e = out(2L)
    assert(e.n_samples === 0L && e.compressed_bytes === 60L &&
      e.max_abs_err === 0 && e.mean_abs_err === 0.0 && e.decoded_sum === 0L)
  }
}
