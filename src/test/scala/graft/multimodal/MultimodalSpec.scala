package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, Array[Byte])*) =
    Multimodal.asMedia(
      rows.toDF("id", "payload"), "id", "payload", "image/fake")

  test("decodeFeatures: deterministic byte stats and embedding shape") {
    val payload = Array[Byte](0, 10, 20, 30)
    val got = Multimodal.decodeFeatures(media((1L, payload)), embeddingDim = 2)
      .collect().head
    assert(got.n_bytes === 4L)
    assert(got.mean_byte === 15.0)
    assert(got.embedding.length === 2)
    // acc(0) = 0*1 + 20*2 = 40 ; acc(1) = 10*1 + 30*2 = 70
    assert(got.embedding.toSeq === Seq(0.040f, 0.070f))
    // empty payload: no NaNs
    val empty = Multimodal.decodeFeatures(media((2L, Array.empty[Byte])), 2)
      .collect().head
    assert(empty.mean_byte === 0.0 && empty.n_bytes === 0L)
  }

  test("png round trip: real ImageIO decode recovers dimensions and pixels") {
    // 5 bytes at width 4 -> 4x2 image padded with 3 zeros
    val payload = Array[Byte](10, 20, 30, 40, 50)
    val png = Multimodal.encodeGrayPng(media((1L, payload)), width = 4)
      .collect().head
    assert(png.media_type === "image/png")
    // genuine PNG container: magic bytes
    assert(png.payload.take(4).toSeq ===
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val feats = Multimodal.decodeImageFeatures(
        Multimodal.encodeGrayPng(media((1L, payload)), width = 4),
        embeddingDim = 2)
      .collect().head
    assert(feats.width === 4 && feats.height === 2)
    // mean over the PADDED 8 pixels: 150/8 = 18.75
    assert(feats.mean_pixel === 18.75)
    // band 0 = row 0 mean /255, band 1 = row 1 mean /255
    assert(feats.embedding.toSeq === Seq(25.0f / 255.0f, 12.5f / 255.0f))
    assert(feats.n_bytes === png.payload.length.toLong)
  }

  test("decodeImageFeatures: hand-crafted PNG decodes to exact pixel stats") {
    // build a 2x2 gray PNG directly with ImageIO (independent of
    // encodeGrayPng) — decode must see exactly these pixels
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 0)
    img.getRaster.setSample(1, 0, 0, 255)
    img.getRaster.setSample(0, 1, 0, 100)
    img.getRaster.setSample(1, 1, 0, 101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val feats = Multimodal.decodeImageFeatures(
        media((7L, bos.toByteArray)), embeddingDim = 2)
      .collect().head
    assert(feats.width === 2 && feats.height === 2)
    assert(feats.mean_pixel === 114.0) // (0+255+100+101)/4
    assert(feats.embedding.toSeq === Seq(127.5f / 255.0f, 100.5f / 255.0f))
  }

  test("decodeImageFeatures: non-image payload fails loudly") {
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageFeatures(media((1L, Array[Byte](1, 2, 3)))).collect()
    }
  }

  test("sampleFrames: slicing, cap, and tail frame") {
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val frames = Multimodal.sampleFrames(media((1L, payload)), frameSize = 4, maxFrames = 5)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 3) // 4 + 4 + 2
    assert(frames(0).frame_bytes.toSeq === (0 until 4).map(_.toByte))
    assert(frames(2).frame_bytes.toSeq === Seq(8.toByte, 9.toByte))
    assert(frames.map(_.offset).toSeq === Seq(0L, 4L, 8L))
    val capped = Multimodal.sampleFrames(media((1L, payload)), frameSize = 2, maxFrames = 3)
      .collect()
    assert(capped.length === 3)
  }

  test("resize: deterministic downsample, record count stable") {
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val out = Multimodal.resize(media((1L, payload)), factor = 3).collect()
    assert(out.length === 1)
    assert(out.head.payload.toSeq === Seq(0.toByte, 3.toByte, 6.toByte, 9.toByte))
    // factor 1 = identity
    val same = Multimodal.resize(media((1L, payload)), factor = 1).collect().head
    assert(same.payload.toSeq === payload.toSeq)
  }

  test("wav round trip: genuine RIFF container, samples recovered exactly") {
    val payload = Array[Byte](0, 64, 127.toByte, 128.toByte, 200.toByte, 255.toByte)
    val wav = Multimodal.encodePcmWav(media((7L, payload)), sampleRate = 8000)
      .collect().head
    assert(wav.media_type === "audio/wav")
    // a real RIFF/WAVE stream, not our input bytes
    assert(new String(wav.payload.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.payload.slice(8, 12), "US-ASCII") === "WAVE")
    // decode with the JDK parser and compare every sample to the
    // defining transform (b - 128) * 256
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav.payload))
    val pcm = ais.readAllBytes()
    val got = (0 until pcm.length / 2).map(i =>
      ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)))
    val want = payload.map(b => ((b & 0xff) - 128) * 256).toSeq
    assert(got === want)
  }

  test("audioQualityFeatures: exact silence/clip/peak/rms on a hand " +
      "signal; empty payload scores the all-zero row") {
    // 64 PCM-zero bytes (one silent window), 64 full-scale bytes (one
    // clipped loud window), 8 PCM-zero bytes (partial silent window)
    val payload = Array.fill[Byte](64)(128.toByte) ++
      Array.fill[Byte](64)(255.toByte) ++ Array.fill[Byte](8)(128.toByte)
    val q = Multimodal.audioQualityFeatures(
      Multimodal.encodePcmWav(media((1L, payload)))).collect().head
    assert(q.sample_rate === 8000 && q.n_samples === 136L)
    assert(q.peak === 32512 && q.clipped_samples === 64L)
    assert(q.clip_ratio === math.round(64.0 / 136 * 1e6) / 1e6)
    assert(q.n_windows === 3L && q.silent_windows === 2L)
    assert(q.silence_ratio === math.round(2.0 / 3 * 1e6) / 1e6)
    assert(q.rms ===
      math.round(math.sqrt(64.0 * 32512 * 32512 / 136) / 32768.0 * 1e6) / 1e6)
    val e = Multimodal.audioQualityFeatures(
      Multimodal.encodePcmWav(media((2L, Array.empty[Byte])))).collect().head
    assert(e.n_samples === 0L && e.peak === 0 && e.n_windows === 0L &&
      e.clip_ratio === 0.0 && e.silence_ratio === 0.0 && e.rms === 0.0)
  }

  test("audioQualityFeatures: the silence test is the exact integer " +
      "boundary, mean == 1% full scale is NOT silent") {
    // windowSize 25 makes the boundary integer-realizable:
    // 32768·25/100 = 8192 = |(96-128)·256| exactly
    val atThreshold = Array[Byte](96.toByte) ++ Array.fill[Byte](24)(128.toByte)
    val below = Array[Byte](97.toByte) ++ Array.fill[Byte](24)(128.toByte)
    val out = Multimodal.audioQualityFeatures(
        Multimodal.encodePcmWav(media((1L, atThreshold), (2L, below))),
        windowSize = 25)
      .collect().sortBy(_.id)
    assert(out(0).silent_windows === 0L)
    assert(out(1).silent_windows === 1L)
  }

  test("decodeAudioFeatures: exact stats on a hand signal; empty payload; non-PCM fails") {
    // signal: bytes 130, 120, 130, 128 -> samples 512, -2048, 512, 0
    // |s| sum = 3072; crossings: +,-,+,0(nonneg) -> 2
    val payload = Array[Byte](130.toByte, 120, 130.toByte, 128.toByte)
    val f = Multimodal.decodeAudioFeatures(
        Multimodal.encodePcmWav(media((1L, payload))), embeddingDim = 2)
      .collect().head
    assert(f.sample_rate === 8000)
    assert(f.n_samples === 4L)
    assert(f.zero_crossings === 2L)
    assert(f.mean_amp === math.round(3072.0 / 4 / 32768.0 * 10000.0) / 10000.0)
    // bands: [512, -2048] and [512, 0] -> mean |s| 1280 and 256
    assert(f.embedding.toSeq ===
      Seq((1280.0 / 32768.0).toFloat, (256.0 / 32768.0).toFloat))
    // empty payload: zero-sample WAV decodes to the all-zero row
    val e = Multimodal.decodeAudioFeatures(
        Multimodal.encodePcmWav(media((2L, Array.empty[Byte]))))
      .collect().head
    assert(e.n_samples === 0L && e.zero_crossings === 0L &&
      e.mean_amp === 0.0 && e.embedding.forall(_ === 0.0f))
    // a non-audio payload must fail loudly, not degrade to byte stats
    val bad = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioFeatures(media((3L, Array[Byte](1, 2, 3))))
        .collect()
    }
    assert(bad.getMessage != null)
  }

  test("spectralAudioFeatures: a pure tone lands in its own band, " +
      "short clips hit the -12 floor, partial frames drop") {
    // tone at bin 3 of a 16-point frame: byte payload b(i) so sample
    // (b−128)·256 ≈ 100·256·cos(2π·3·i/16) — two full frames of the
    // same tone (32 samples) plus 5 leftover bytes (partial frame
    // dropped: n_frames = 2)
    val (ct, st) = graft.multimodal.Fft.twiddles(16)
    def cosAt(j: Int): Double = {
      val m = (3 * j) % 16
      if (m < 8) ct(m) else -ct(m - 8)
    }
    val payload = Array.tabulate[Byte](37) { i =>
      (128 + math.round(100 * cosAt(i % 16)).toInt).toByte
    }
    val f = Multimodal.spectralAudioFeatures(
        Multimodal.encodePcmWav(media((1L, payload))), frameSize = 16)
      .collect().head
    assert(f.n_samples === 37L)
    assert(f.n_frames === 2L)
    assert(f.bands.length === 9)
    // bin 3 carries the tone; every other one-sided bin is orders of
    // magnitude quieter (log10 energies: the floor is -12)
    val top = f.bands.zipWithIndex.maxBy(_._1)._2
    assert(top === 3, s"tone peaked at band $top: ${f.bands.mkString(",")}")
    assert(f.bands(3) > f.bands.patch(3, Nil, 1).max + 1.0,
      s"band 3 not dominant: ${f.bands.mkString(",")}")
    // a clip shorter than one frame: zero frames, every band at the
    // exact -12 floor
    val short = Multimodal.spectralAudioFeatures(
        Multimodal.encodePcmWav(media((2L, Array.fill[Byte](7)(200.toByte)))),
        frameSize = 16)
      .collect().head
    assert(short.n_frames === 0L)
    assert(short.bands.forall(_ === -12.0))
  }

  test("audioFingerprints + matches: byte-identical clips align at " +
      "offset 0 with every landmark voting; an unrelated clip stays " +
      "unmatched") {
    // 256 bytes = 4 frames of 64 -> anchors in frames 0..2
    val payload = Array.tabulate[Byte](256)(i =>
      ((i * 37 + 11) % 101 + 60).toByte)
    val other = Array.tabulate[Byte](256)(i =>
      ((i * 53 + 29) % 97 + 60).toByte)
    val m = Multimodal.asMedia(
      Seq((1L, payload), (2L, payload), (3L, other))
        .toDF("id", "payload"),
      "id", "payload", "text/plain")
    val fps = Multimodal.audioFingerprints(
      Multimodal.encodePcmWav(m), frameSize = 64)
    val perDoc = fps.collect().groupBy(_.id).view.mapValues(_.length).toMap
    assert(perDoc(1L) === perDoc(2L) && perDoc(1L) > 0)
    assert(perDoc(1L) === perDoc(3L)) // fp COUNT is length-determined
    // identical landmark sets: every one votes at offset 0, so the
    // pair clears even the maximal threshold; the unrelated doc's
    // incidental matches cannot reach it
    val got = Multimodal.audioFingerprintMatches(fps,
        minVotes = perDoc(1L).toLong)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 0L)), s"got $got")
  }

  test("utteranceSegments: two bursts split at the silent gap, " +
      "all-silence emits nothing, boundaries exact") {
    // samples via byte payload: 0x80 -> amplitude 0 (silence); 0xFF ->
    // 32512 (loud). Layout: 64 silent | 128 loud | 64 silent | 64 loud
    // -> windows: 0 silent, 1-2 loud, 3 silent, 4 loud
    val p = Array.fill[Byte](64)(0x80.toByte) ++
      Array.fill[Byte](128)(0xFF.toByte) ++
      Array.fill[Byte](64)(0x80.toByte) ++
      Array.fill[Byte](64)(0xFF.toByte)
    val silent = Array.fill[Byte](200)(0x80.toByte)
    val m = Multimodal.asMedia(
      Seq((1L, p), (2L, silent)).toDF("id", "payload"),
      "id", "payload", "text/plain")
    val got = Multimodal.utteranceSegments(
        Multimodal.encodePcmWav(m, sampleRate = 8000))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((1L, 0, 1L, 2L, 2L), (1L, 1, 4L, 4L, 1L)),
      s"got $got")
  }

  test("sceneChanges: hand case — first frame always keyframe, an " +
      "identical repeat never, a content cut at L1 >= threshold is; " +
      "the compare plan is a partitioned window, no join") {
    import org.apache.spark.sql.Dataset
    // three 64-px frames as real PNGs: A, A again (L1=0), then B with
    // 64 pixels moved to a different bin (L1 = 128)
    val a = Array.fill[Byte](64)(10)   // bin 0
    val b = Array.fill[Byte](64)(100)  // bin 6
    val frames: Dataset[Multimodal.Frame] = Seq(
      Multimodal.Frame(1L, 0, 0L, Multimodal.grayPngBytes(a, 16), "t"),
      Multimodal.Frame(1L, 1, 64L, Multimodal.grayPngBytes(a, 16), "t"),
      Multimodal.Frame(1L, 2, 128L, Multimodal.grayPngBytes(b, 16), "t"))
      .toDS()
    val out = Multimodal.sceneChanges(frames, threshold = 40L)
    val got = out.collect()
      .map(r => r.getInt(1) -> (Option(r.get(2)), r.getBoolean(3))).toMap
    assert(got(0) === ((None, true)), "first frame is always a keyframe")
    assert(got(1) === ((Some(0L), false)), "identical repeat: L1 = 0")
    assert(got(2) === ((Some(128L), true)), "full-frame cut: L1 = 2*64")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("binary payloads round-trip through parquet with metadata pruning") {
    val tmp = Files.createTempDirectory("graft_media").toFile
    tmp.deleteOnExit()
    val ds = media((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4, 5)))
    ds.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val back = spark.read.parquet(tmp.getAbsolutePath)
    assert(back.schema("payload").dataType.typeName === "binary")
    // metadata-only projection must not read payload bytes
    val plan = back.select("id", "media_type").queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), plan)
    assert(back.count() === 2)
  }
}
