package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Sources.table

/** Multimodal pipeline queries: documents' text bytes become media
  * payloads (no media tables in the test data). q_multimodal_features
  * runs a REAL codec round trip — text bytes packed into an 8-bit gray
  * image, compressed to PNG by `javax.imageio`, decoded back, features
  * from the decoded raster. Pixels are a deterministic function of the
  * text, so dimensions and mean luminance are oracle-checked even
  * though the intermediate PNG byte stream is codec-internal; the
  * pooled-band embedding is exercised via its dimension here and
  * value-checked in MultimodalSpec.
  */
/** binaryFile staging dirs, reclaimed by ONE JVM-exit tree walk: the
  * scan over them is LAZY (the harness executes the returned plan
  * later), so the files must outlive the query builder — in-run
  * deletion would force an eager materialization costing a full extra
  * job per run, and `File.deleteOnExit` silently skips non-empty
  * directories (the round-14 ADVICE leak: one orphan tree per run). */
private[queries] object BinfileStaging {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { base =>
        import scala.jdk.CollectionConverters._
        // depth-first (files before their dir); tolerate already-gone
        try java.nio.file.Files.walk(base).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p): Unit)
        catch { case _: Throwable => () }
      }))
  def register(base: java.nio.file.Path): Unit = {
    hookInstalled
    dirs.add(base): Unit
  }
}

object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents").withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.decodeImageFeatures(Multimodal.encodeGrayPng(media, width = 16))
        .toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_pixel"), size(col("embedding")).as("embedding_dim"))
    },
    // END-TO-END image dedup: real codec round trip (text bytes ->
    // gray PNG -> ImageIO decode) -> pooled-pixel embeddings -> the
    // SemDeDup cluster-then-pair operator. This is the multimodal and
    // similarity stacks COMPOSED: decoded raster features flow into
    // Dedup.semanticPairs unchanged. Pixels are deterministic functions
    // of the input bytes, so the whole chain is oracle-checkable even
    // though the intermediate PNG byte stream is codec-internal. The
    // threshold sits at the far tail of the cosine distribution:
    // mean-byte band vectors of ASCII text are all-positive and tightly
    // concentrated (median pair cosine ~0.996 at sf0.01), so only
    // near-identical byte layouts — i.e. near-dup documents — clear
    // 0.99995.
    "q_image_neardup" -> { (s, dir) =>
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      val features = Multimodal.decodeImageFeatures(
        Multimodal.encodeGrayPng(media, width = 16)).toDF()
      graft.operators.Dedup.semanticPairs(
        features.select(col("id").as("vec_id"), col("embedding")),
        threshold = 0.99995, nClusters = 4, trainIters = 2)
    },
    // REAL files-on-disk ingest: every doc's gray PNG is written as an
    // individual .png file (executor-side, one file per record — the
    // layout a crawled media corpus actually has), read back through
    // Spark's native `binaryFile` source (per-file splits, metadata
    // columns, pathGlobFilter — THE scan path for 100 TB of media on
    // object storage), id recovered from the file name, and decoded
    // through the registry. The oracle never sees the files: PNG is
    // lossless, so width/height/mean replay from the text bytes —
    // equality proves the disk round trip byte-preserving. On a
    // cluster the staging dir is shared storage; local[*] shares /tmp.
    "q_binaryfile_ingest" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.encodeGrayPng(Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain"), width = 16)
      // per-RUN unique staging dir (createTempDirectory): a fixed
      // dir-derived path would race a concurrent run over the same
      // data dir (one deletes/rewrites while the other's binaryFile
      // scan reads), and a failed delete would leave stale .png files
      // the glob ingests as extra rows — nondeterministic oracle noise.
      // Cleanup is the JVM-exit tree walk in [[BinfileStaging]]:
      // deleteOnExit is a no-op on a non-empty dir (one leaked tree
      // per run), and in-run deletion would need the result pinned
      // EAGERLY before the files go away — a full extra job per run
      // (measured 0.9s → 1.9s at sf0.1). The exit hook keeps the
      // one-pass lazy plan; per-session accumulation is bounded (one
      // tree per run of this one query).
      val base = java.nio.file.Files
        .createTempDirectory("graft_binfile_")
      BinfileStaging.register(base)
      val stage = base.toFile.getAbsolutePath
      media.foreachPartition { it: Iterator[Multimodal.MediaRecord] =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(stage, s"${r.id}.png"), r.payload): Unit
        }
      }
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.png").load("file:" + stage)
      val ingested = files.select(
          regexp_extract(col("path"), "([0-9]+)\\.png$", 1)
            .cast("long").as("id"),
          lit("image/png").as("media_type"),
          col("content").as("payload"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodeImageFeatures(ingested).toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_pixel"))
    },
    // Perceptual difference hash (dHash) over REAL decoded images:
    // text bytes -> gray PNG -> registry decode -> exact block-sum
    // downscale to a 9x8 grid -> 64 adjacent-pair bits. The comparison
    // is cross-multiplied integer sums (no division), so the oracle
    // replays every bit; output is the signature as four 16-bit bands
    // (the full 64-bit value would overflow DuckDB's BIGINT power sum
    // at bit 63 — and the bands are exactly what the LSH join keys on).
    "q_image_phash" -> { (s, dir) =>
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.encodeGrayPng(Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain"), width = 16)
      val hashed = Multimodal.dHash(media)
      hashed.select(col("id").as("doc_id") +:
        (0 until 4).map(b => shiftrightunsigned(col("phash"), b * 16)
          .bitwiseAND(0xffffL).as(s"b$b")): _*)
    },
    // dHash near-dup: the Hamming-space twin of q_image_neardup's
    // cosine SemDeDup. Pigeonhole banding makes the candidate join a
    // lossless equi-join on (block, block_val) for hamming <= 3 —
    // the same bucket-keyed candidate shape as SimHash/MinHash, on a
    // signature computed from REAL decoded pixels.
    "q_phash_neardup" -> { (s, dir) =>
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.encodeGrayPng(Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain"), width = 16)
      Multimodal.dHashPairs(Multimodal.dHash(media), maxHamming = 3)
    },
    // incremental dHash against a PERSISTED block index: the corpus
    // pays decode+hash+banding once into a bucketed block table; each
    // ingest batch hashes itself and probes the store on
    // (block, block_val) — near-dup IMAGES against a standing index,
    // the perceptual twin of q_simhash_incremental_persisted
    "q_phash_incremental_persisted" -> { (s, dir) =>
      val docs = graft.operators.Sampling.split(
        table(s, dir, "documents")
          .filter(length(encode(col("text"), "UTF-8")) > 0),
        col("doc_id"), 12, 2)
      def hashes(df: org.apache.spark.sql.DataFrame) =
        Multimodal.dHash(Multimodal.encodeGrayPng(Multimodal.asMedia(
          df.withColumn("payload", encode(col("text"), "UTF-8")),
          "doc_id", "payload", "text/plain"), width = 16))
      graft.sources.Sinks.writeBucketed(
        Multimodal.dHashBlocks(hashes(docs.filter(col("split") =!= "test")),
          maxHamming = 3),
        "graft_corpus_phash_blocks", bucketCols = Seq("block_val"),
        numBuckets = 8)
      Multimodal.dHashCrossPairs(hashes(docs.filter(col("split") === "test")),
        s.table("graft_corpus_phash_blocks"), maxHamming = 3)
    },
    // REAL audio codec round trip: text bytes -> 16-bit PCM samples ->
    // genuine RIFF/WAVE via javax.sound.sampled -> decode -> features
    // from the decoded samples. PCM WAV is lossless, so every decoded
    // sample is (byte - 128) * 256 — the oracle recomputes the exact
    // integer sums (zero crossings, |amplitude| means) from the text
    // without touching the container bytes, same argument as the image
    // path. Empty docs are kept: a zero-sample WAV decodes to the
    // all-zero feature row.
    "q_audio_features" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.decodeAudioFeatures(
          Multimodal.encodePcmWav(media, sampleRate = 8000))
        .toDF()
        .select(col("id").as("doc_id"), col("sample_rate"), col("n_samples"),
          col("zero_crossings"), col("mean_amp"),
          size(col("embedding")).as("embedding_dim"),
          // band 0 value-checks the embedding path end-to-end in the
          // oracle (full-vector parity pinned in MultimodalSpec)
          round(element_at(col("embedding"), 1).cast("double"), 6).as("band0"))
    },
    // SPECTRAL audio features (round 15): real WAV round trip, then
    // per 16-sample frame a radix-2 FFT with sqrt-only twiddles
    // (bit-portable across JVMs AND engines — no libm trig), bins
    // 0..8 pooled over frames as integer-micro-unit energies into
    // anchored log10 band values; the oracle's SQL is GENERATED from
    // the same butterfly schedule, so it replays every double exactly
    "q_audio_spectral" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents")
          .withColumn("payload",
            encode(coalesce(col("text"), lit("")), "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.spectralAudioFeatures(
          Multimodal.encodePcmWav(media, sampleRate = 8000), frameSize = 16)
        .toDF()
        .select(col("id").as("doc_id") +: col("n_samples") +:
          col("n_frames") +:
          (0 to 8).map(k =>
            element_at(col("bands"), k + 1).as(s"band$k")): _*)
    },
    // REAL audio downsample (round 12): encode to 8 kHz WAV, box-filter
    // decimate by 4 (each output sample = floor-mean of 4 inputs — a
    // true decode → resample → re-encode cycle through two genuine WAV
    // containers), decode the 2 kHz result and extract features. The
    // oracle replays the decimated integer stream exactly:
    // floorDiv == floor(sum / n) by construction.
    "q_audio_resample" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents")
          .withColumn("payload",
            encode(coalesce(col("text"), lit("")), "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.decodeAudioFeatures(
          Multimodal.decimatePcmWav(
            Multimodal.encodePcmWav(media, sampleRate = 8000), factor = 4))
        .toDF()
        .select(col("id").as("doc_id"), col("sample_rate"),
          col("n_samples"), col("zero_crossings"), col("mean_amp"),
          round(element_at(col("embedding"), 1).cast("double"), 6)
            .as("band0"))
    },
    // the speech-curation quality gate over REAL decoded WAV: the
    // payload is built with a known-silent 80-byte preamble (0x80 =
    // PCM zero), the doc's text bytes, and a 10-byte full-scale rail
    // (0xFF) on every 4th doc — so silence windows, clipping counts,
    // peak and RMS all exercise NONZERO paths (plain ASCII text alone
    // can neither clip nor fall silent: 32 <= byte <= 126 puts every
    // sample's |amplitude| in [512, 24576]). PCM WAV is lossless, so
    // the oracle replays the exact integer sums from the constructed
    // byte stream without touching the container.
    // utterance segmentation (round 13): 80 silent samples, the text,
    // 80 more silent samples, the text again — every non-empty doc
    // yields (usually two) utterances split at the mid-payload silence,
    // through the REAL WAV round trip; empty docs are all-silence and
    // emit nothing. PCM is lossless, so the oracle replays the exact
    // integer window sums + the gaps-and-islands run grouping.
    "q_audio_utterances" -> { (s, dir) =>
      val pad = Array.fill(80)(0x80.toByte)
      val media = Multimodal.asMedia(
        table(s, dir, "documents")
          .withColumn("payload",
            concat(lit(pad),
              encode(coalesce(col("text"), lit("")), "UTF-8"),
              lit(pad),
              encode(coalesce(col("text"), lit("")), "UTF-8"))),
        "doc_id", "payload", "text/plain")
      Multimodal.utteranceSegments(
          Multimodal.encodePcmWav(media, sampleRate = 8000))
        .select(col("id").as("doc_id"), col("utt_idx"), col("start_win"),
          col("end_win"), col("n_windows"))
    },
    "q_audio_quality" -> { (s, dir) =>
      val pad = Array.fill(80)(0x80.toByte)
      val rail = Array.fill(10)(0xFF.toByte)
      val media = Multimodal.asMedia(
        table(s, dir, "documents")
          .withColumn("payload",
            // coalesce: a null text must yield the preamble-only
            // payload, not a null payload NPE'ing encodePcmWav (the
            // adjacent round-11 queries' guard, mirrored in the oracle)
            concat(lit(pad), encode(coalesce(col("text"), lit("")), "UTF-8"),
              when(col("doc_id") % 4 === 0, lit(rail))
                .otherwise(lit(Array.empty[Byte])))),
        "doc_id", "payload", "text/plain")
      Multimodal.audioQualityFeatures(
          Multimodal.encodePcmWav(media, sampleRate = 8000))
        .toDF()
        .select(col("id").as("doc_id"), col("sample_rate"),
          col("n_samples"), col("peak"), col("clipped_samples"),
          col("clip_ratio"), col("n_windows"), col("silent_windows"),
          col("silence_ratio"), col("rms"))
    },
    // the AUDIO twin of q_image_neardup: real WAV round trip (text
    // bytes -> PCM -> javax.sound decode) -> time-stripe amplitude
    // embeddings -> the same SemDeDup cluster-then-pair operator. The
    // multimodal and similarity stacks composed on a second modality;
    // the threshold sits at the same far tail (amplitude-band vectors
    // of ASCII text are all-positive and tightly concentrated)
    "q_audio_neardup" -> { (s, dir) =>
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      val features = Multimodal.decodeAudioFeatures(
        Multimodal.encodePcmWav(media, sampleRate = 8000)).toDF()
      graft.operators.Dedup.semanticPairs(
        features.select(col("id").as("vec_id"), col("embedding")),
        threshold = 0.99995, nClusters = 4, trainIters = 2)
    },
    // constellation-hash audio fingerprint matching (round 15, Wang
    // 2003): per 64-sample frame the FFT's top-2 integer-energy bins
    // anchor landmark pairs hashed as (b1, b2, dt); matching is ONE
    // hash equi-join + the aligned-offset vote (>= 10 landmarks at one
    // offset — byte-duplicate docs align at 22-40 on this corpus,
    // incidental pairs tail off below)
    "q_audio_fingerprint_matches" -> { (s, dir) =>
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      val fps = Multimodal.audioFingerprints(
        Multimodal.encodePcmWav(media, sampleRate = 8000),
        frameSize = 64, peaksPerFrame = 2, fanout = 3, maxDt = 8)
      Multimodal.audioFingerprintMatches(fps, minVotes = 10L)
    },
    // ...and the fingerprint INDEX lifecycle — the Shazam deployment
    // shape: the corpus split's landmarks persist BUCKETED ON THE HASH
    // (the join key, so lookups co-locate), and the ingest batch's
    // landmarks join the STORED index; maxHashFreq is an index-side
    // stat, exactly where a deployment computes it
    "q_audio_fp_incremental_persisted" -> { (s, dir) =>
      val docs = graft.operators.Sampling.split(
        table(s, dir, "documents")
          .filter(length(encode(col("text"), "UTF-8")) > 0),
        col("doc_id"), 12, 2)
      def fps(df: org.apache.spark.sql.DataFrame) =
        Multimodal.audioFingerprints(
          Multimodal.encodePcmWav(
            Multimodal.asMedia(
              df.withColumn("payload", encode(col("text"), "UTF-8")),
              "doc_id", "payload", "text/plain"),
            sampleRate = 8000),
          frameSize = 64, peaksPerFrame = 2, fanout = 3, maxDt = 8)
      graft.sources.Sinks.writeBucketed(
        fps(docs.filter(col("split") =!= "test")).toDF(),
        "graft_afp_idx", bucketCols = Seq("hash"), numBuckets = 8)
      import s.implicits._
      val stored = s.table("graft_afp_idx").as[Multimodal.AudioFingerprint]
      Multimodal.audioFingerprintLookup(
        fps(docs.filter(col("split") === "test")), stored, minVotes = 10L)
    },
    // ...and the SPECTRAL upgrade of the same composition (round 15):
    // the FFT log-band embedding — the representation published
    // audio-dedup pipelines actually use — feeds the identical
    // SemDeDup leg (Lloyd cells, within-cell cosine); threshold sits
    // at the corpus's p99.9 cosine so the pair set is real but sparse
    "q_audio_spectral_neardup" -> { (s, dir) =>
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      val features = Multimodal.spectralAudioFeatures(
        Multimodal.encodePcmWav(media, sampleRate = 8000),
        frameSize = 16).toDF()
      graft.operators.Dedup.semanticPairs(
        features.select(col("id").as("vec_id"), col("embedding")),
        threshold = 0.999, nClusters = 4, trainIters = 2)
    },
    // REAL compressed audio: encode each doc's PCM stream to IMA ADPCM
    // (4 bits/sample in the standard WAVE fmt-0x0011 container — a
    // published pure-integer codec, not a stand-in), decode it back,
    // and audit the compression: size, exact max/mean reconstruction
    // error, and a decoded-sample checksum. Samples are capped at 129
    // (one 68-byte block) so the oracle's recursive-CTE replay of the
    // (predictor, stepIndex) state machine stays bounded.
    "q_adpcm_roundtrip" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents")
          .withColumn("payload",
            encode(substring(coalesce(col("text"), lit("")), 1, 129),
              "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.adpcmRoundTripStats(media, sampleRate = 8000,
          blockAlign = 68)
        .toDF()
        .select(col("id").as("doc_id"), col("n_samples"),
          col("compressed_bytes"), col("max_abs_err"),
          col("mean_abs_err"), col("decoded_sum"))
    },
    // the COMPRESSED-path quality gate: the same silence/clip/peak/RMS
    // battery as q_audio_quality, but over IMA-ADPCM-decoded samples —
    // audioQualityFeatures resolves the ADPCM codec from the registry
    // by media_type alone (audio/adpcm), so this is the registry
    // routing proven in an ORACLED query, and the oracle replays the
    // decoded trajectory through the shared recursive CTE before
    // running the window battery on it
    "q_adpcm_quality" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents")
          .withColumn("payload",
            encode(substring(coalesce(col("text"), lit("")), 1, 129),
              "UTF-8")),
        "doc_id", "payload", "text/plain")
      Multimodal.audioQualityFeatures(
          Multimodal.encodeImaAdpcmWav(media, sampleRate = 8000,
            blockAlign = 68))
        .toDF()
        .select(col("id").as("doc_id"), col("sample_rate"),
          col("n_samples"), col("peak"), col("clipped_samples"),
          col("clip_ratio"), col("n_windows"), col("silent_windows"),
          col("silence_ratio"), col("rms"))
    },
    // the VIDEO-shaped pipeline, as real as a container-less
    // environment allows: sample fixed-size frames from each payload
    // (the stand-in for container demux — the one genuinely stubbed
    // step), push EVERY FRAME through the real PNG codec round trip,
    // and pool the per-frame pooled-pixel embeddings into one
    // per-video vector (frame-order deterministic fold, so the result
    // is invariant to shuffle order). This is the standard
    // video-dedup/feature shape: demux -> per-frame image model ->
    // temporal pooling.
    "q_video_pooled_embedding" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "video/fake")
      val frames = Multimodal.sampleFrames(media, frameSize = 64, maxFrames = 5)
      // pack (doc, frame) into the media id; recovered after decode
      val frameMedia = frames.map(f => Multimodal.MediaRecord(
        f.id * 8L + f.frame_idx, "image/gray", f.frame_bytes))
      val feats = Multimodal.decodeImageFeatures(
        Multimodal.encodeGrayPng(frameMedia, width = 16)).toDF()
      val perFrame = feats.select(
        floor(col("id") / 8).cast("long").as("doc_id"),
        (col("id") % 8).cast("int").as("frame_idx"),
        col("embedding"))
      val pooled = perFrame.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_frames"),
        sort_array(collect_list(struct(col("frame_idx"), col("embedding"))))
          .as("__fr"))
      val bands = (1 to 8).map { j =>
        round(aggregate(col("__fr"), lit(0.0), (acc, f) =>
            acc + element_at(f.getField("embedding"), j).cast("double"))
          / col("n_frames"), 6).as(s"band$j")
      }
      pooled.select(col("doc_id") +: col("n_frames") +: bands: _*)
    },
    // the SAME pipeline through a REAL video container (round 11): the
    // 64-byte frames are PNG-encoded (real ImageIO codec) and muxed
    // into a genuine RIFF/AVI file per doc; sampleFrames then demuxes
    // it through the registry's DEFAULT AVI codec (AviMjpegDemux — a
    // structural RIFF chunk walk, no byte-slice stand-in anywhere),
    // each demuxed frame decodes through the real PNG codec, and the
    // pooled embedding must equal q_video_pooled_embedding exactly —
    // container mux/demux is byte-identity on frame payloads and PNG
    // is lossless on pixels, so the two queries share one oracle.
    "q_video_avi_pipeline" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "raw")
      val avi = media.mapPartitions { it =>
        it.map { r =>
          val frames = graft.multimodal.MediaCodecs.ByteSliceDemux
            .demux(r.payload, 64, 5)
            .map(f => Multimodal.grayPngBytes(f._3, width = 16)).toSeq
          Multimodal.MediaRecord(r.id, "video/x-msvideo",
            graft.multimodal.AviMjpeg.mux(frames, width = 16,
              height = 4, fps = 5))
        }
      }
      // frameSize is ignored by the container demux — the AVI's own
      // chunk boundaries define the frames
      val frames = Multimodal.sampleFrames(avi, frameSize = 0, maxFrames = 5)
      val frameMedia = frames.map(f => Multimodal.MediaRecord(
        f.id * 8L + f.frame_idx, "image/png", f.frame_bytes))
      val feats = Multimodal.decodeImageFeatures(frameMedia).toDF()
      val perFrame = feats.select(
        floor(col("id") / 8).cast("long").as("doc_id"),
        (col("id") % 8).cast("int").as("frame_idx"),
        col("embedding"))
      val pooled = perFrame.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_frames"),
        sort_array(collect_list(struct(col("frame_idx"), col("embedding"))))
          .as("__fr"))
      val bands = (1 to 8).map { j =>
        round(aggregate(col("__fr"), lit(0.0), (acc, f) =>
            acc + element_at(f.getField("embedding"), j).cast("double"))
          / col("n_frames"), 6).as(s"band$j")
      }
      pooled.select(col("doc_id") +: col("n_frames") +: bands: _*)
    },
    // the SAME pipeline through the SECOND real container (round 12):
    // the 64-byte frames pack directly into an animated GIF (the JDK's
    // actual LZW codec under an identity gray palette — quantizes
    // nothing), sampleFrames demuxes through the registry's default
    // GIF codec (real LZW decode, lossless PNG re-encode per frame),
    // and the pooled embedding must equal q_video_pooled_embedding
    // exactly — so GIF, AVI, and the container-less path all share ONE
    // oracle, which is the strongest statement a container integration
    // can make: it changes nothing but the bytes on the wire.
    "q_video_gif_pipeline" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "raw")
      val gif = media.mapPartitions { it =>
        it.map { r =>
          val frames = graft.multimodal.MediaCodecs.ByteSliceDemux
            .demux(r.payload, 64, 5).map(_._3).toSeq
          Multimodal.MediaRecord(r.id, "image/gif",
            graft.multimodal.GifAnim.muxGray(frames, width = 16))
        }
      }
      val frames = Multimodal.sampleFrames(gif, frameSize = 0, maxFrames = 5)
      val frameMedia = frames.map(f => Multimodal.MediaRecord(
        f.id * 8L + f.frame_idx, "image/png", f.frame_bytes))
      val feats = Multimodal.decodeImageFeatures(frameMedia).toDF()
      val perFrame = feats.select(
        floor(col("id") / 8).cast("long").as("doc_id"),
        (col("id") % 8).cast("int").as("frame_idx"),
        col("embedding"))
      val pooled = perFrame.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_frames"),
        sort_array(collect_list(struct(col("frame_idx"), col("embedding"))))
          .as("__fr"))
      val bands = (1 to 8).map { j =>
        round(aggregate(col("__fr"), lit(0.0), (acc, f) =>
            acc + element_at(f.getField("embedding"), j).cast("double"))
          / col("n_frames"), 6).as(s"band$j")
      }
      pooled.select(col("doc_id") +: col("n_frames") +: bands: _*)
    },
    // ONE real container carrying BOTH modalities (round 12): per doc,
    // the text bytes become PNG frames (real ImageIO codec) AND a
    // 16-bit PCM track, muxed into a single two-stream AVI
    // (AviMjpeg.muxAv — stream 0 'vids', stream 1 'auds'); the video
    // leg then demuxes frames through the registry's default AVI codec
    // and pools per-frame PNG-decoded embeddings (byte-identical to
    // q_video_avi_pipeline's output), while the audio leg demuxes the
    // '01wb' track, re-wraps it as a genuine WAV (wrapPcmWav), and
    // decodes through the real javax.sound codec (byte-identical to
    // q_audio_features' output). The oracle is the video replay JOINed
    // to the audio replay — each leg already independently green, so
    // what THIS query pins is that one container round-trips both
    // streams without bleed. The mux is EAGERLY checkpointed: it has
    // two consumers (frame demux + audio demux) and must run exactly
    // once — lazily, both plan legs of the single downstream job race
    // to compute the same partitions before their blocks register,
    // so the codec subtree could pay up to twice depending on task
    // scheduling (the r12 session-variance suspect; eager pins one
    // deterministic materialization ahead of the job).
    "q_av_container_features" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "raw")
      val av = media.mapPartitions { it =>
        it.map { r =>
          val frames = graft.multimodal.MediaCodecs.ByteSliceDemux
            .demux(r.payload, 64, 5)
            .map(f => Multimodal.grayPngBytes(f._3, width = 16)).toSeq
          val pcm = new Array[Byte](r.payload.length * 2)
          var i = 0
          while (i < r.payload.length) {
            val sv = ((r.payload(i) & 0xff) - 128) * 256
            pcm(2 * i) = (sv & 0xff).toByte
            pcm(2 * i + 1) = ((sv >> 8) & 0xff).toByte
            i += 1
          }
          Multimodal.MediaRecord(r.id, "video/x-msvideo",
            graft.multimodal.AviMjpeg.muxAv(frames, pcm, width = 16,
              height = 4, fps = 5, sampleRate = 8000))
        }
      }.localCheckpoint(true)
      // video leg — q_video_avi_pipeline's downstream, unchanged
      val frames = Multimodal.sampleFrames(av, frameSize = 0, maxFrames = 5)
      val frameMedia = frames.map(f => Multimodal.MediaRecord(
        f.id * 8L + f.frame_idx, "image/png", f.frame_bytes))
      val feats = Multimodal.decodeImageFeatures(frameMedia).toDF()
      val perFrame = feats.select(
        floor(col("id") / 8).cast("long").as("doc_id"),
        (col("id") % 8).cast("int").as("frame_idx"),
        col("embedding"))
      val pooled = perFrame.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_frames"),
        sort_array(collect_list(struct(col("frame_idx"), col("embedding"))))
          .as("__fr"))
      val bands = (1 to 8).map { j =>
        round(aggregate(col("__fr"), lit(0.0), (acc, f) =>
            acc + element_at(f.getField("embedding"), j).cast("double"))
          / col("n_frames"), 6).as(s"band$j")
      }
      val video = pooled.select(col("doc_id") +: col("n_frames") +: bands: _*)
      // audio leg: demux the PCM track, re-container as WAV, real decode
      val wav = av.mapPartitions { it =>
        it.map { r =>
          Multimodal.MediaRecord(r.id, "audio/wav",
            Multimodal.wrapPcmWav(
              graft.multimodal.AviMjpeg.demuxAudioPcm(r.payload),
              sampleRate = 8000))
        }
      }
      val audio = Multimodal.decodeAudioFeatures(wav).toDF()
        .select(col("id").as("doc_id"), col("sample_rate"),
          col("n_samples"), col("zero_crossings"), col("mean_amp"),
          round(element_at(col("embedding"), 1).cast("double"), 6)
            .as("band0"))
      video.join(audio, Seq("doc_id"))
    },
    // JOINT multimodal near-dup (round 12): both modality embeddings
    // of ONE muxAv container fuse into a 16-dim joint vector (8 pooled
    // video bands ++ 8 audio amplitude bands) that flows into the same
    // SemDeDup cluster-then-pair operator the single-modality near-dup
    // queries use — "near-dup iff visuals AND audio both match", the
    // fusion shape a video-corpus dedup actually needs (audio-swapped
    // or re-rendered copies separate on one leg). Video bands stay
    // UNROUNDED doubles until the float32 cast that builds the joint
    // vector, so the oracle replays the exact frame-ordered fold.
    "q_av_joint_neardup" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "raw")
      val av = media.mapPartitions { it =>
        it.map { r =>
          val frames = graft.multimodal.MediaCodecs.ByteSliceDemux
            .demux(r.payload, 64, 5)
            .map(f => Multimodal.grayPngBytes(f._3, width = 16)).toSeq
          val pcm = new Array[Byte](r.payload.length * 2)
          var i = 0
          while (i < r.payload.length) {
            val sv = ((r.payload(i) & 0xff) - 128) * 256
            pcm(2 * i) = (sv & 0xff).toByte
            pcm(2 * i + 1) = ((sv >> 8) & 0xff).toByte
            i += 1
          }
          Multimodal.MediaRecord(r.id, "video/x-msvideo",
            graft.multimodal.AviMjpeg.muxAv(frames, pcm, width = 16,
              height = 4, fps = 5, sampleRate = 8000))
        }
      }.localCheckpoint(true)
      val frames = Multimodal.sampleFrames(av, frameSize = 0, maxFrames = 5)
      val frameMedia = frames.map(f => Multimodal.MediaRecord(
        f.id * 8L + f.frame_idx, "image/png", f.frame_bytes))
      val feats = Multimodal.decodeImageFeatures(frameMedia).toDF()
      val perFrame = feats.select(
        floor(col("id") / 8).cast("long").as("doc_id"),
        (col("id") % 8).cast("int").as("frame_idx"),
        col("embedding"))
      val pooled = perFrame.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_frames"),
        sort_array(collect_list(struct(col("frame_idx"), col("embedding"))))
          .as("__fr"))
      val vbands = (1 to 8).map { j =>
        (aggregate(col("__fr"), lit(0.0), (acc, f) =>
            acc + element_at(f.getField("embedding"), j).cast("double"))
          / col("n_frames")).cast("float").as(s"v$j")
      }
      val video = pooled.select(col("doc_id") +: vbands: _*)
      val wav = av.mapPartitions { it =>
        it.map { r =>
          Multimodal.MediaRecord(r.id, "audio/wav",
            Multimodal.wrapPcmWav(
              graft.multimodal.AviMjpeg.demuxAudioPcm(r.payload),
              sampleRate = 8000))
        }
      }
      val audio = Multimodal.decodeAudioFeatures(wav).toDF()
        .select(col("id").as("doc_id"), col("embedding").as("__aemb"))
      val joint = video.join(audio, Seq("doc_id"))
        .select(col("doc_id").as("vec_id"),
          array((1 to 8).map(j => col(s"v$j")) ++
            (1 to 8).map(j => element_at(col("__aemb"), j)): _*)
            .as("embedding"))
      graft.operators.Dedup.semanticPairs(joint, threshold = 0.99995,
        nClusters = 4, trainIters = 2)
    },
    // scene-change keyframe selection (round 13) over a REAL container
    // round trip: docs -> PNG frames -> AVI mux -> registry demux ->
    // real PNG decode -> 16-bin luminance histograms -> per-video lag
    // L1 distance; keyframe = first frame or distance >= threshold.
    // The container is byte-identity on frames and PNG lossless on
    // pixels, so the oracle replays histograms straight from the text
    // bytes (padding zeros included) with no container access.
    "q_video_keyframes" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "raw")
      val avi = media.mapPartitions { it =>
        it.map { r =>
          val frames = graft.multimodal.MediaCodecs.ByteSliceDemux
            .demux(r.payload, 64, 5)
            .map(f => Multimodal.grayPngBytes(f._3, width = 16)).toSeq
          Multimodal.MediaRecord(r.id, "video/x-msvideo",
            graft.multimodal.AviMjpeg.mux(frames, width = 16,
              height = 4, fps = 5))
        }
      }
      val frames = Multimodal.sampleFrames(avi, frameSize = 0,
        maxFrames = 5, requireReal = true)
      Multimodal.sceneChanges(frames, threshold = 40L, bins = 16)
        .select(col("id").as("doc_id"), col("frame_idx"),
          col("l1_dist"), col("is_keyframe"))
    },
    // the COMPOSED multimodal curation pipeline (round 14) — the A/V
    // twin of q_pipeline_e2e: media ingest -> ONE two-stream AVI per
    // doc (muxAv, the only eager materialization boundary in the
    // plan: the container has five downstream consumers — frame demux
    // x2, audio demux x3 — and must encode exactly once; every
    // consumer then re-slices CHEAP demux bytes from the checkpointed
    // container and decodes only what its own leg needs) ->
    //   video: scene-change keyframes (sceneChanges, the q_video_
    //          keyframes leg) + pooled frame embeddings,
    //   audio: quality battery (rms gate) + VAD-lite utterance count
    //          + amplitude-band embeddings,
    //   fusion: 16-dim joint vector -> SemDeDup near-dup pairs ->
    //           greedy survivor rule (a doc is a duplicate iff it is
    //           the LARGER id of any pair — one distinct + one
    //           left-anti-shaped join, no iteration),
    //   selection: kept = not-dup AND rms >= 0.34 AND >= 1 keyframe
    //              AND >= 1 utterance.
    // Every leg is doc-keyed, so the assembly is plain equi-joins —
    // zero handoff shuffles beyond each leg's own aggregation
    // (Round14Spec pins the exchange budget); output keeps ALL docs
    // with their gate stats + kept flag, the auditable curation shape
    "q_curation_av" -> { (s, dir) =>
      import s.implicits._
      val nz = table(s, dir, "documents")
        .filter(length(encode(col("text"), "UTF-8")) > 0)
      val media = Multimodal.asMedia(
        nz.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "raw")
      val av = media.mapPartitions { it =>
        it.map { r =>
          val frames = graft.multimodal.MediaCodecs.ByteSliceDemux
            .demux(r.payload, 64, 5)
            .map(f => Multimodal.grayPngBytes(f._3, width = 16)).toSeq
          val pcm = new Array[Byte](r.payload.length * 2)
          var i = 0
          while (i < r.payload.length) {
            val sv = ((r.payload(i) & 0xff) - 128) * 256
            pcm(2 * i) = (sv & 0xff).toByte
            pcm(2 * i + 1) = ((sv >> 8) & 0xff).toByte
            i += 1
          }
          Multimodal.MediaRecord(r.id, "video/x-msvideo",
            graft.multimodal.AviMjpeg.muxAv(frames, pcm, width = 16,
              height = 4, fps = 5, sampleRate = 8000))
        }
      }.localCheckpoint(true)
      // video leg 1: scene-change keyframe count (real demux + decode)
      val frames = Multimodal.sampleFrames(av, frameSize = 0,
        maxFrames = 5, requireReal = true)
      val kf = Multimodal.sceneChanges(frames, threshold = 40L, bins = 16)
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("is_keyframe").cast("long")).as("n_keyframes"))
      // video leg 2: pooled per-frame embeddings (UNROUNDED until the
      // float32 cast — the q_av_joint_neardup fusion convention)
      val frameMedia = frames.map(f => Multimodal.MediaRecord(
        f.id * 8L + f.frame_idx, "image/png", f.frame_bytes))
      val feats = Multimodal.decodeImageFeatures(frameMedia).toDF()
      val pooled = feats.select(
          floor(col("id") / 8).cast("long").as("doc_id"),
          (col("id") % 8).cast("int").as("frame_idx"),
          col("embedding"))
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_fr"),
          sort_array(collect_list(struct(col("frame_idx"), col("embedding"))))
            .as("__fr"))
      val vbands = (1 to 8).map { j =>
        (aggregate(col("__fr"), lit(0.0), (acc, f) =>
            acc + element_at(f.getField("embedding"), j).cast("double"))
          / col("n_fr")).cast("float").as(s"v$j")
      }
      val video = pooled.select(col("doc_id") +: vbands: _*)
      // audio legs: demux the PCM track once per consumer (byte
      // slicing off the checkpointed container), real WAV decode each
      val wav = av.mapPartitions { it =>
        it.map { r =>
          Multimodal.MediaRecord(r.id, "audio/wav",
            Multimodal.wrapPcmWav(
              graft.multimodal.AviMjpeg.demuxAudioPcm(r.payload),
              sampleRate = 8000))
        }
      }
      val quality = Multimodal.audioQualityFeatures(wav).toDF()
        .select(col("id").as("doc_id"), col("rms"))
      val utts = Multimodal.utteranceSegments(wav)
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_utterances"))
      val audio = Multimodal.decodeAudioFeatures(wav).toDF()
        .select(col("id").as("doc_id"), col("embedding").as("__aemb"))
      // fusion + near-dup: the q_av_joint_neardup operator, verbatim
      val joint = video.join(audio, Seq("doc_id"))
        .select(col("doc_id").as("vec_id"),
          array((1 to 8).map(j => col(s"v$j")) ++
            (1 to 8).map(j => element_at(col("__aemb"), j)): _*)
            .as("embedding"))
      val pairs = graft.operators.Dedup.semanticPairs(joint,
        threshold = 0.99995, nClusters = 4, trainIters = 2)
      val dups = pairs.select(col("b").as("doc_id")).distinct()
        .withColumn("__dup", lit(true))
      // assembly anchors on the quality leg — the one leg with exactly
      // one row per doc by construction — and LEFT-joins the kf/utts
      // legs with zero-coalesce, so a doc with zero frames or zero
      // utterances (all-silent audio) still emits its audit row with
      // kept = false instead of vanishing (on THIS corpus ASCII
      // samples are never silent and every non-empty payload demuxes
      // ≥ 1 frame, so the left joins match inner rows exactly — the
      // oracle mirrors the same anchor + left joins)
      quality.join(kf, Seq("doc_id"), "left")
        .join(utts, Seq("doc_id"), "left")
        .join(dups, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_frames"), lit(0L)).as("n_frames"),
          coalesce(col("n_keyframes"), lit(0L)).as("n_keyframes"),
          coalesce(col("n_utterances"), lit(0L)).as("n_utterances"),
          col("rms"),
          coalesce(col("__dup"), lit(false)).as("is_dup"),
          (coalesce(col("__dup"), lit(false)) === false &&
            col("rms") >= 0.34 &&
            coalesce(col("n_keyframes"), lit(0L)) >= 1 &&
            coalesce(col("n_utterances"), lit(0L)) >= 1).as("kept"))
    },
    // frame sampling + resize, verified arithmetically: frame sizes and
    // the resized byte count are functions of payload length alone
    "q_multimodal_frames" -> { (s, dir) =>
      val media = Multimodal.asMedia(
        table(s, dir, "documents").withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", "text/plain")
      val frames = Multimodal.sampleFrames(media, frameSize = 64, maxFrames = 5)
        .toDF()
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).as("sum_frame_bytes"))
      val resized = Multimodal.resize(media, factor = 4).toDF()
        .select(col("id").as("doc_id"),
          length(col("payload")).cast("long").as("n_resized_bytes"))
      frames.join(resized, Seq("doc_id"))
    },
  )

  /** DuckDB replay of the decoded-pixel embedding: byte i of the text
    * lands at pixel (i mod 16, i div 16) of a 16-wide gray image
    * zero-padded to full rows (8-bit gray PNG is lossless, so the
    * decoded raster IS this byte grid); band j of the 8-dim embedding
    * is the mean of its horizontal stripe's pixels / 255, rounded
    * through float32 exactly as the engine's Array[Float]. The
    * k-means-then-cosine stage reuses the SimilarityQueries Lloyd CTEs
    * at dim = 8. */
  /** DuckDB replay of the audio near-dup composition: sample i of a
    * doc is `(byte − 128)·256` (PCM WAV is lossless; ASCII ⇒ byte ==
    * codepoint), the 8 bands are the `least(7, i·8 // len)` time
    * stripes of mean |amplitude| scaled by 32768 with the engine's
    * float cast, and clustering + pairing replay through the same
    * Lloyd CTEs as the image twin. */
  private def audioNeardupOracle(threshold: Double): String =
    s"""WITH nz AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS len
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |sv AS (
       |  SELECT doc_id, text, len, unnest(range(0, len)) AS i FROM nz),
       |pv AS (
       |  SELECT doc_id, least(7, (i * 8) // len) AS band,
       |    abs((unicode(text[CAST(i + 1 AS INTEGER)]) - 128) * 256) AS v
       |  FROM sv),
       |bs AS (SELECT doc_id, band, sum(v) AS s, count(1) AS n
       |       FROM pv GROUP BY 1, 2),
       |bj AS (
       |  SELECT nz.doc_id, r.j,
       |    coalesce(CAST(CAST(b.s AS DOUBLE) / b.n / 32768.0 AS FLOAT)::DOUBLE,
       |      0.0) AS ev
       |  FROM nz CROSS JOIN (SELECT unnest(range(0, 8)) AS j) r
       |  LEFT JOIN bs b ON b.doc_id = nz.doc_id AND b.band = r.j),
       |emb0 AS (SELECT doc_id AS vec_id, list(ev ORDER BY j) AS e
       |         FROM bj GROUP BY 1),
       |emb AS (SELECT vec_id, e,
       |          list_sum(list_transform(e, x -> x * x)) AS xx
       |        FROM emb0),
       |${SimilarityQueries.lloyd2Ctes("emb", 4, dim = 8)},
       |s2 AS (
       |  SELECT m.vec_id, c.cid, ${SimilarityQueries.d2Sql("m", "c", dim = 8)} AS d
       |  FROM emb m CROSS JOIN c1cc c),
       |assigned AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM s2) WHERE rn = 1),
       |scored AS (
       |  SELECT aa.vec_id AS a, ab.vec_id AS b,
       |    list_sum(list_transform(range(1, 9), i -> ea.e[i] * eb.e[i]))
       |      / (sqrt(list_sum(list_transform(ea.e, x -> x * x)))
       |         * sqrt(list_sum(list_transform(eb.e, x -> x * x)))) AS cos
       |  FROM assigned aa
       |  JOIN assigned ab ON aa.cluster = ab.cluster AND aa.vec_id < ab.vec_id
       |  JOIN emb0 ea ON aa.vec_id = ea.vec_id
       |  JOIN emb0 eb ON ab.vec_id = eb.vec_id)
       |SELECT a, b, round(cos, 6) AS cos FROM scored
       |WHERE cos >= $threshold""".stripMargin

  private def imageNeardupOracle(threshold: Double): String =
    s"""WITH nz AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS len,
       |    CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS h
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |px AS (
       |  SELECT doc_id, text, len, h, unnest(range(0, 16 * h)) AS i
       |  FROM nz),
       |pv AS (
       |  SELECT doc_id,
       |    least(7, ((i // 16) * 8) // h) AS band,
       |    CASE WHEN i < len THEN unicode(text[CAST(i + 1 AS INTEGER)])
       |         ELSE 0 END AS v
       |  FROM px),
       |bs AS (SELECT doc_id, band, sum(v) AS s, count(1) AS n
       |       FROM pv GROUP BY 1, 2),
       |bj AS (
       |  SELECT nz.doc_id, r.j,
       |    coalesce(CAST(CAST(b.s AS DOUBLE) / b.n / 255.0 AS FLOAT)::DOUBLE,
       |      0.0) AS ev
       |  FROM nz CROSS JOIN (SELECT unnest(range(0, 8)) AS j) r
       |  LEFT JOIN bs b ON b.doc_id = nz.doc_id AND b.band = r.j),
       |emb0 AS (SELECT doc_id AS vec_id, list(ev ORDER BY j) AS e
       |         FROM bj GROUP BY 1),
       |emb AS (SELECT vec_id, e,
       |          list_sum(list_transform(e, x -> x * x)) AS xx
       |        FROM emb0),
       |${SimilarityQueries.lloyd2Ctes("emb", 4, dim = 8)},
       |s2 AS (
       |  SELECT m.vec_id, c.cid, ${SimilarityQueries.d2Sql("m", "c", dim = 8)} AS d
       |  FROM emb m CROSS JOIN c1cc c),
       |assigned AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM s2) WHERE rn = 1),
       |scored AS (
       |  SELECT aa.vec_id AS a, ab.vec_id AS b,
       |    list_sum(list_transform(range(1, 9), i -> ea.e[i] * eb.e[i]))
       |      / (sqrt(list_sum(list_transform(ea.e, x -> x * x)))
       |         * sqrt(list_sum(list_transform(eb.e, x -> x * x)))) AS cos
       |  FROM assigned aa
       |  JOIN assigned ab ON aa.cluster = ab.cluster AND aa.vec_id < ab.vec_id
       |  JOIN emb0 ea ON aa.vec_id = ea.vec_id
       |  JOIN emb0 eb ON ab.vec_id = eb.vec_id)
       |SELECT a, b, round(cos, 6) AS cos FROM scored
       |WHERE cos >= $threshold""".stripMargin

  /** DuckDB replay of the decoded-sample audio features: PCM WAV is
    * lossless, so sample i IS `(byte_i − 128) · 256` — zero crossings
    * and |amplitude| sums are exact integer arithmetic over the text's
    * bytes (ASCII ⇒ byte == codepoint), and only the final band mean
    * rounds through float32 exactly as the engine's Array[Float]. */
  private def audioFeaturesOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS len
       |  FROM documents),
       |sv AS (
       |  SELECT doc_id, i,
       |    (unicode(text[CAST(i + 1 AS INTEGER)]) - 128) * 256 AS s
       |  FROM (SELECT doc_id, text, unnest(range(0, len)) AS i FROM d)),
       |cr AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN (s < 0) <> (prev < 0) THEN 1 ELSE 0 END) AS zc
       |  FROM (SELECT doc_id, s,
       |          lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
       |        FROM sv)
       |  WHERE prev IS NOT NULL GROUP BY 1),
       |ma AS (SELECT doc_id, sum(abs(s)) AS sa, count(1) AS n
       |       FROM sv GROUP BY 1),
       |b0 AS (
       |  SELECT sv.doc_id, sum(abs(s)) AS bs, count(1) AS bn
       |  FROM sv JOIN ma ON ma.doc_id = sv.doc_id
       |  WHERE least(7, (i * 8) // ma.n) = 0 GROUP BY 1)
       |SELECT d.doc_id,
       |  8000 AS sample_rate,
       |  CAST(d.len AS BIGINT) AS n_samples,
       |  CAST(coalesce(cr.zc, 0) AS BIGINT) AS zero_crossings,
       |  coalesce(round((CAST(ma.sa AS DOUBLE) / ma.n) / 32768.0, 4), 0.0)
       |    AS mean_amp,
       |  8 AS embedding_dim,
       |  coalesce(round(CAST(CAST((CAST(b0.bs AS DOUBLE) / b0.bn) / 32768.0
       |    AS FLOAT) AS DOUBLE), 6), 0.0) AS band0
       |FROM d
       |LEFT JOIN cr ON cr.doc_id = d.doc_id
       |LEFT JOIN ma ON ma.doc_id = d.doc_id
       |LEFT JOIN b0 ON b0.doc_id = d.doc_id""".stripMargin

  /** Run [[graft.multimodal.Fft.fft]]'s exact butterfly schedule
    * SYMBOLICALLY over SQL expression strings: the same loops, the
    * same twiddle values (inlined as round-trip `Double.toString`
    * literals — shortest-repr decimal parses back to the identical
    * bits), the same operation order inside each butterfly — so the
    * generated SQL computes bit-for-bit the doubles the engine's loop
    * computes. Returns the (re, im) expressions of bins 0..bins−1 over
    * a 1-based `xs` list column of normalized samples. */
  private def fftButterflySql(n: Int, bins: Int): (Seq[String], Seq[String]) = {
    import graft.multimodal.Fft
    def dlit(d: Double): String = s"(${java.lang.Double.toString(d)})"
    // post-bit-reversal leaves: slot q starts as sample bitrev(q)
    val re = Array.tabulate(n)(q => s"xs[${Fft.bitrev(q, n) + 1}]")
    val im = Array.fill[String](n)("(0.0)")
    val (ct, st) = Fft.twiddles(n)
    var len = 2
    while (len <= n) {
      val step = n / len
      var base = 0
      while (base < n) {
        var k = 0
        while (k < len / 2) {
          val m = k * step
          val wr = dlit(ct(m))
          val wi = dlit(-st(m))
          val j1 = base + k
          val j2 = base + k + len / 2
          val tre = s"($wr * ${re(j2)} - $wi * ${im(j2)})"
          val tim = s"($wr * ${im(j2)} + $wi * ${re(j2)})"
          val r1 = re(j1)
          val i1 = im(j1)
          re(j2) = s"($r1 - $tre)"
          im(j2) = s"($i1 - $tim)"
          re(j1) = s"($r1 + $tre)"
          im(j1) = s"($i1 + $tim)"
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    (re.take(bins).toSeq, im.take(bins).toSeq)
  }

  /** DuckDB replay of the spectral features: PCM WAV is lossless so
    * sample i IS (byte−128)·256, the /32768 normalization is a
    * power-of-two divide (exact), and the whole 16-point FFT replays
    * through [[fftButterflySql]]'s generated expressions — every
    * stored double bit-identical, per-frame energies anchored to
    * integer micro-units, the cross-frame pool an order-free BIGINT
    * sum, zero-frame docs at the −12 floor. */
  /** The d → sv → fr → ff → fe → fa chain shared by the spectral
    * feature oracle and its SemDeDup composition: per-doc bin sums
    * `fa(doc_id, nf, sm0..sm8)` over the generated butterfly
    * expressions. */
  private def spectralCtes: String = {
    val (res, ims) = fftButterflySql(n = 16, bins = 9)
    val ffCols = (0 until 9).map(k =>
      s"${res(k)} AS r$k, ${ims(k)} AS i$k").mkString(",\n       |    ")
    val feCols = (0 until 9).map(k =>
      s"CAST(floor((r$k * r$k + i$k * i$k) * 1e6 + 0.5) AS BIGINT) AS em$k")
      .mkString(",\n       |    ")
    val faCols = (0 until 9).map(k =>
      s"CAST(sum(em$k) AS BIGINT) AS sm$k").mkString(",\n       |    ")
    s"""d AS (
       |  SELECT doc_id, coalesce(text, '') AS text,
       |    octet_length(encode(coalesce(text, ''))) AS len
       |  FROM documents),
       |sv AS (
       |  SELECT doc_id, len, i,
       |    ((unicode(text[CAST(i + 1 AS INTEGER)]) - 128) * 256) / 32768.0
       |      AS x
       |  FROM (SELECT doc_id, text, len, unnest(range(0, len)) AS i FROM d)),
       |fr AS (
       |  SELECT doc_id, i // 16 AS f, list(x ORDER BY i) AS xs
       |  FROM sv WHERE i < 16 * (len // 16)
       |  GROUP BY 1, 2),
       |ff AS (
       |  SELECT doc_id, f,
       |    $ffCols
       |  FROM fr),
       |fe AS (
       |  SELECT doc_id, f,
       |    $feCols
       |  FROM ff),
       |fa AS (
       |  SELECT doc_id, count(*) AS nf,
       |    $faCols
       |  FROM fe GROUP BY 1)""".stripMargin
  }

  /** Anchored log10 band value of bin `k` off the `fa` rollup (the
    * engine's exact operation order; zero-frame docs coalesce to the
    * −12 floor). */
  private def spectralBandSql(k: Int): String =
    s"floor(log10(coalesce(CAST(fa.sm$k AS DOUBLE) / 1e6 / fa.nf, 0.0)" +
      s" + 1e-12) * 1e6 + 0.5) / 1e6"

  private def audioSpectralOracle: String = {
    val bandCols = (0 until 9).map(k =>
      s"${spectralBandSql(k)} AS band$k").mkString(",\n       |  ")
    s"""WITH $spectralCtes
       |SELECT d.doc_id,
       |  CAST(d.len AS BIGINT) AS n_samples,
       |  CAST(coalesce(fa.nf, 0) AS BIGINT) AS n_frames,
       |  $bandCols
       |FROM d LEFT JOIN fa ON fa.doc_id = d.doc_id""".stripMargin
  }

  /** The spectral embedding fed to the SemDeDup leg: the same band
    * values float32-cast exactly as the engine's Array[Float], then
    * the standard Lloyd-cells + within-cell cosine replay at dim 9. */
  private def audioSpectralNeardupOracle(threshold: Double): String = {
    val evCols = (0 until 9)
      .map(k => s"CAST(CAST(${spectralBandSql(k)} AS FLOAT) AS DOUBLE)")
      .mkString(",\n       |    ")
    s"""WITH $spectralCtes,
       |emb0 AS (
       |  SELECT d.doc_id AS vec_id, [
       |    $evCols] AS e
       |  FROM d LEFT JOIN fa ON fa.doc_id = d.doc_id
       |  WHERE d.len > 0),
       |emb AS (SELECT vec_id, e,
       |          list_sum(list_transform(e, x -> x * x)) AS xx
       |        FROM emb0),
       |${SimilarityQueries.lloyd2Ctes("emb", 4, dim = 9)},
       |s2 AS (
       |  SELECT m.vec_id, c.cid, ${SimilarityQueries.d2Sql("m", "c", dim = 9)} AS d
       |  FROM emb m CROSS JOIN c1cc c),
       |assigned AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM s2) WHERE rn = 1),
       |scored AS (
       |  SELECT aa.vec_id AS a, ab.vec_id AS b,
       |    list_sum(list_transform(range(1, 10), i -> ea.e[i] * eb.e[i]))
       |      / (sqrt(list_sum(list_transform(ea.e, x -> x * x)))
       |         * sqrt(list_sum(list_transform(eb.e, x -> x * x)))) AS cos
       |  FROM assigned aa
       |  JOIN assigned ab ON aa.cluster = ab.cluster AND aa.vec_id < ab.vec_id
       |  JOIN emb0 ea ON aa.vec_id = ea.vec_id
       |  JOIN emb0 eb ON ab.vec_id = eb.vec_id)
       |SELECT a, b, round(cos, 6) AS cos FROM scored
       |WHERE cos >= $threshold""".stripMargin
  }

  /** The butterfly schedule as MATERIALIZED stage CTEs (`fs1..fsP`,
    * then `fe(doc_id, f, em<bins>)`): the same symbolic run as
    * [[fftButterflySql]], but each stage's 2n columns land in a
    * physical intermediate instead of one nested expression tree —
    * at n = 64 the single-expression form is ~25x the node count, and
    * DuckDB's optimizer re-expands multiply-referenced CTEs, so the
    * MATERIALIZED barrier is what keeps the fingerprint replay's
    * planning and memory bounded. Arithmetic is IDENTICAL: stage
    * columns are the engine loop's array state after that stage. */
  private def fftStagedCtes(n: Int, emBins: Seq[Int], src: String,
      prefix: String = "f"): String = {
    import graft.multimodal.Fft
    def dlit(d: Double): String = s"(${java.lang.Double.toString(d)})"
    val (ct, st) = Fft.twiddles(n)
    var re = Array.tabulate(n)(q => s"xs[${Fft.bitrev(q, n) + 1}]")
    var im = Array.fill[String](n)("(0.0)")
    val sb = new StringBuilder
    var len = 2
    var stage = 0
    var prev = src
    while (len <= n) {
      val newRe = re.clone()
      val newIm = im.clone()
      val step = n / len
      var base = 0
      while (base < n) {
        var k = 0
        while (k < len / 2) {
          val m = k * step
          val wr = dlit(ct(m))
          val wi = dlit(-st(m))
          val j1 = base + k
          val j2 = base + k + len / 2
          val tre = s"($wr * ${re(j2)} - $wi * ${im(j2)})"
          val tim = s"($wr * ${im(j2)} + $wi * ${re(j2)})"
          newRe(j2) = s"(${re(j1)} - $tre)"
          newIm(j2) = s"(${im(j1)} - $tim)"
          newRe(j1) = s"(${re(j1)} + $tre)"
          newIm(j1) = s"(${im(j1)} + $tim)"
          k += 1
        }
        base += len
      }
      stage += 1
      val cols = (0 until n).map(q =>
        s"${newRe(q)} AS r$q, ${newIm(q)} AS i$q").mkString(",\n    ")
      sb.append(s"${prefix}s$stage AS MATERIALIZED (\n  SELECT doc_id, f,\n    " +
        cols + s"\n  FROM $prev),\n")
      prev = s"${prefix}s$stage"
      re = Array.tabulate(n)(q => s"r$q")
      im = Array.tabulate(n)(q => s"i$q")
      len <<= 1
    }
    val feCols = emBins.map(k =>
      s"CAST(floor((r$k * r$k + i$k * i$k) * 1e6 + 0.5) AS BIGINT) AS em$k")
      .mkString(",\n    ")
    sb.append(s"${prefix}e AS MATERIALIZED (\n  SELECT doc_id, f,\n    " +
      feCols + s"\n  FROM $prev)")
    sb.toString
  }

  /** DuckDB replay of the constellation fingerprints: the 64-point
    * staged butterfly CTEs give bit-exact integer micro-unit energies
    * per (frame, bin); peak picking, landmark pairing (dt asc, pick
    * asc, first `fanout`), the (b1·64+b2)·64+dt hash, the hash
    * self-join, and the aligned-offset vote all replay as plain
    * SQL — every comparison over exact integers. */
  /** One side's full landmark chain (samples → frames → staged
    * butterflies → integer energies → top-2 peaks → (b1,b2,dt)
    * landmarks) off a `(doc_id, text, len)` source CTE, every CTE name
    * `prefix`ed so two sides coexist in one query. Ends in
    * `<prefix>lm(doc_id, f, hash)`. */
  private def landmarkCtes(src: String, prefix: String): String = {
    val unpivot = (1 to 32).map(k =>
      s"SELECT doc_id, f, $k AS bin, em$k AS em FROM ${prefix}e")
      .mkString("\n       |  UNION ALL ")
    s"""${prefix}sv AS (
       |  SELECT doc_id, len, i,
       |    ((unicode(text[CAST(i + 1 AS INTEGER)]) - 128) * 256) / 32768.0
       |      AS x
       |  FROM (SELECT doc_id, text, len, unnest(range(0, len)) AS i
       |        FROM $src)),
       |${prefix}fr AS (
       |  SELECT doc_id, i // 64 AS f, list(x ORDER BY i) AS xs
       |  FROM ${prefix}sv WHERE i < 64 * (len // 64)
       |  GROUP BY 1, 2),
       |${fftStagedCtes(n = 64, emBins = 1 to 32, src = s"${prefix}fr",
          prefix = prefix)},
       |${prefix}ue AS (
       |  $unpivot),
       |${prefix}pk AS MATERIALIZED (
       |  SELECT doc_id, f, bin, rn FROM (
       |    SELECT doc_id, f, bin,
       |      row_number() OVER (PARTITION BY doc_id, f
       |                         ORDER BY em DESC, bin) AS rn
       |    FROM ${prefix}ue) WHERE rn <= 2),
       |${prefix}lm AS MATERIALIZED (
       |  SELECT doc_id, f, (b1 * 64 + b2) * 64 + dt AS hash FROM (
       |    SELECT a.doc_id, a.f, a.bin AS b1, t.bin AS b2, t.f - a.f AS dt,
       |      row_number() OVER (PARTITION BY a.doc_id, a.f, a.rn
       |                         ORDER BY t.f - a.f, t.rn) AS pick
       |    FROM ${prefix}pk a JOIN ${prefix}pk t ON t.doc_id = a.doc_id
       |      AND t.f > a.f AND t.f <= a.f + 8)
       |  WHERE pick <= 3)""".stripMargin
  }

  private def audioFingerprintOracle(minVotes: Long): String = {
    s"""WITH d AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS len
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |${landmarkCtes(src = "d", prefix = "f")},
       |lm AS (SELECT doc_id, f, hash FROM flm),
       |rh AS (
       |  SELECT hash FROM lm GROUP BY hash
       |  HAVING count(DISTINCT doc_id) <= 1000),
       |lmf AS MATERIALIZED (
       |  SELECT lm.doc_id, lm.f, lm.hash FROM lm JOIN rh USING (hash)),
       |vt AS (
       |  SELECT la.doc_id AS a, lb.doc_id AS b, la.f - lb.f AS "offset",
       |    count(*) AS votes
       |  FROM lmf la JOIN lmf lb
       |    ON la.hash = lb.hash AND la.doc_id < lb.doc_id
       |  GROUP BY 1, 2, 3)
       |SELECT a, b, CAST("offset" AS BIGINT) AS "offset",
       |  CAST(votes AS BIGINT) AS votes
       |FROM (
       |  SELECT a, b, "offset", votes,
       |    row_number() OVER (PARTITION BY a, b
       |                       ORDER BY votes DESC, "offset") AS rn
       |  FROM vt) WHERE rn = 1 AND votes >= $minVotes""".stripMargin
  }

  /** DuckDB replay of the persisted fingerprint-index lookup: the
    * corpus (bkt < 14) and batch (bkt >= 14) sides each build their
    * landmark chain, the `maxHashFreq` cap computes on the INDEX side,
    * and the batch joins the surviving index landmarks — parquet
    * round-trips the integer fingerprints exactly, so persistence
    * cannot change votes. */
  private def audioFingerprintLookupOracle(minVotes: Long): String =
    s"""WITH s0 AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS len,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))
       |      AS INTEGER) AS bkt
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |dc AS (SELECT doc_id, text, len FROM s0 WHERE bkt < 14),
       |db AS (SELECT doc_id, text, len FROM s0 WHERE bkt >= 14),
       |${landmarkCtes(src = "dc", prefix = "c")},
       |${landmarkCtes(src = "db", prefix = "b")},
       |rh AS (
       |  SELECT hash FROM clm GROUP BY hash
       |  HAVING count(DISTINCT doc_id) <= 1000),
       |cf AS MATERIALIZED (
       |  SELECT clm.doc_id, clm.f, clm.hash FROM clm JOIN rh USING (hash)),
       |vt AS (
       |  SELECT blm.doc_id AS q, cf.doc_id AS m, blm.f - cf.f AS "offset",
       |    count(*) AS votes
       |  FROM blm JOIN cf ON blm.hash = cf.hash
       |  GROUP BY 1, 2, 3)
       |SELECT q, m, CAST("offset" AS BIGINT) AS "offset",
       |  CAST(votes AS BIGINT) AS votes
       |FROM (
       |  SELECT q, m, "offset", votes,
       |    row_number() OVER (PARTITION BY q, m
       |                       ORDER BY votes DESC, "offset") AS rn
       |  FROM vt) WHERE rn = 1 AND votes >= $minVotes""".stripMargin

  /** DuckDB replay of the audio quality battery over the CONSTRUCTED
    * payload (80 PCM-zero bytes ++ text bytes ++ 10 full-scale bytes
    * on every 4th doc): sample i's |amplitude| is 0 for the preamble,
    * |byte − 128|·256 for text (ASCII ⇒ byte == codepoint), 32512 for
    * the rail; windows are the aligned i÷64 groups (last one
    * partial), a window is silent iff Σ|s|·100 < 32768·wn (exact
    * integers), clipping is |s| ≥ 32512, and only clip/silence ratios
    * and RMS round — through the same round(x, 6) as the engine's
    * math.round. */
  private def audioQualityOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, coalesce(text, '') AS text,
       |    octet_length(encode(coalesce(text, ''))) AS len,
       |    CASE WHEN doc_id % 4 = 0 THEN 10 ELSE 0 END AS extra
       |  FROM documents),
       |sv AS (
       |  SELECT doc_id, i,
       |    CASE WHEN i < 80 THEN 0
       |         WHEN i < 80 + len THEN
       |           abs((unicode(text[CAST(i - 80 + 1 AS INTEGER)]) - 128) * 256)
       |         ELSE 32512 END AS a
       |  FROM (SELECT doc_id, text, len,
       |          unnest(range(0, 80 + len + extra)) AS i FROM d)),
       |w AS (
       |  SELECT doc_id, i // 64 AS win, sum(a) AS ws, count(*) AS wn
       |  FROM sv GROUP BY 1, 2),
       |wa AS (
       |  SELECT doc_id, count(*) AS n_windows,
       |    sum(CASE WHEN ws * 100 < 32768 * wn THEN 1 ELSE 0 END)
       |      AS silent_windows
       |  FROM w GROUP BY 1),
       |sa AS (
       |  SELECT doc_id, count(*) AS n, max(a) AS peak,
       |    sum(CASE WHEN a >= 32512 THEN 1 ELSE 0 END) AS clipped,
       |    sum(CAST(a AS BIGINT) * a) AS sumsq
       |  FROM sv GROUP BY 1)
       |SELECT d.doc_id,
       |  8000 AS sample_rate,
       |  CAST(80 + len + extra AS BIGINT) AS n_samples,
       |  CAST(sa.peak AS INTEGER) AS peak,
       |  CAST(sa.clipped AS BIGINT) AS clipped_samples,
       |  round(CAST(sa.clipped AS DOUBLE) / sa.n, 6) AS clip_ratio,
       |  CAST(wa.n_windows AS BIGINT) AS n_windows,
       |  CAST(wa.silent_windows AS BIGINT) AS silent_windows,
       |  round(CAST(wa.silent_windows AS DOUBLE) / wa.n_windows, 6)
       |    AS silence_ratio,
       |  round(sqrt(CAST(sa.sumsq AS DOUBLE) / sa.n) / 32768.0, 6) AS rms
       |FROM d
       |JOIN sa ON sa.doc_id = d.doc_id
       |JOIN wa ON wa.doc_id = d.doc_id""".stripMargin

  /** DuckDB replay of the IMA ADPCM encode→decode trajectory: the
    * codec is pure integer arithmetic over (predictor, stepIndex), so
    * the state machine folds per doc with `list_reduce` — per step, the
    * encoder's successive-approximation code bits (b4/b2/b1 against
    * step, step//2, step//4), the decoder's quantized difference
    * step//8 + Σ bits, the clamped new predictor (== the decoded
    * sample == the encoder's reconstruction), and the table-driven
    * index adaptation. Sample 0 is stored verbatim in the block header
    * (zero error); `compressed_bytes` is the 60-byte container plus
    * one 68-byte block when any samples exist.
    *
    * Round 13: the per-doc fold replaced a 129-iteration recursive CTE
    * (one global iteration per sample, ~4.2s each oracle — the suite's
    * worst tail) at 4.7× — hash-identical output. Two fold gotchas pin
    * the shape: (1) DuckDB 1.0 STRUCT accumulators are unreliable
    * across `list_reduce` iterations (a later field reads a sibling
    * field's UPDATED value from iteration 2 on), so the state rides in
    * a flat BIGINT list `[idx, stp, dec_0 … dec_t]`; (2) the current
    * step value `stp` is CARRIED in the accumulator (`acc[2]`) instead
    * of indexed from the 89-entry table literal at each of its ~15
    * textual uses — lambdas have no let-bindings and no CSE, so each
    * literal occurrence would rebuild the list per step (measured 19s
    * that way; the table is indexed exactly twice per step, both on
    * the new index). */
  /** The shared fold: d (truncated docs), sl (per-doc PCM sample
    * list), fold (the walked decoded trajectory as a list), st — one
    * row per (doc_id, i) with the original sample `a`, decoded `dec`,
    * and `aerr` = |a − dec|, the exact shape the old recursive CTE
    * exposed to the two consumers. */
  private def adpcmCtes: String = {
    val steps = graft.multimodal.ImaAdpcm.stepTable.mkString(", ")
    // lambda fragments: acc = [idx, stp, dec...], element x = [0, 7, a]
    val stp = "acc[2]"
    val pred = "acc[-1]"
    val xv = "x[3]"
    val ad = s"abs($xv - $pred)"
    val b4 = s"CAST($ad >= $stp AS BIGINT)"
    val d2 = s"($ad - $b4 * $stp)"
    val b2 = s"CAST($d2 >= $stp // 2 AS BIGINT)"
    val d3 = s"($d2 - $b2 * ($stp // 2))"
    val b1 = s"CAST($d3 >= $stp // 4 AS BIGINT)"
    val diffq = s"($stp // 8 + $b4 * $stp + $b2 * ($stp // 2) + " +
      s"$b1 * ($stp // 4))"
    val delta = s"(CASE WHEN $b4 = 1 THEN 2 * (1 + 2 * $b2 + $b1) " +
      "ELSE -1 END)"
    val np = s"greatest(-32768, least(32767, CASE WHEN $xv < $pred " +
      s"THEN $pred - $diffq ELSE $pred + $diffq END))"
    val ni = s"greatest(0, least(88, acc[1] + $delta))"
    s"""d AS (
       |  SELECT doc_id, substring(coalesce(text, ''), 1, 129) AS t,
       |    length(substring(coalesce(text, ''), 1, 129)) AS n
       |  FROM documents),
       |sl AS (
       |  SELECT doc_id, n,
       |    list_transform(range(1, CAST(n + 1 AS INTEGER)),
       |      i -> CAST((unicode(t[i]) - 128) * 256 AS BIGINT)) AS a
       |  FROM d),
       |fold AS (
       |  SELECT doc_id, n, a,
       |    CASE WHEN n = 0 THEN [] ELSE
       |      (list_reduce(
       |        list_transform(a, v -> [CAST(0 AS BIGINT),
       |                                CAST(7 AS BIGINT), v]),
       |        (acc, x) -> list_append(
       |          list_concat([$ni, ([$steps])[$ni + 1]], acc[3:]),
       |          $np)))[3:]
       |    END AS dec
       |  FROM sl),
       |st AS (
       |  SELECT doc_id, i, dec, abs(a - dec) AS aerr
       |  FROM (
       |    SELECT doc_id, i, a[CAST(i + 1 AS INTEGER)] AS a,
       |      dec[CAST(i + 1 AS INTEGER)] AS dec
       |    FROM (SELECT doc_id, a, dec, unnest(range(0, n)) AS i
       |          FROM fold)))""".stripMargin
  }

  private def adpcmOracle: String =
    s"""WITH ${adpcmCtes},
       |agg AS (
       |  SELECT doc_id, count(*) AS n_samples, max(aerr) AS max_abs_err,
       |    round(CAST(sum(aerr) AS DOUBLE) / count(*), 6) AS mean_abs_err,
       |    sum(dec) AS decoded_sum
       |  FROM st GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(agg.n_samples, 0) AS BIGINT) AS n_samples,
       |  CAST(60 + CASE WHEN d.n > 0 THEN 68 ELSE 0 END AS BIGINT)
       |    AS compressed_bytes,
       |  CAST(coalesce(agg.max_abs_err, 0) AS INTEGER) AS max_abs_err,
       |  coalesce(agg.mean_abs_err, CAST(0.0 AS DOUBLE)) AS mean_abs_err,
       |  CAST(coalesce(agg.decoded_sum, 0) AS BIGINT) AS decoded_sum
       |FROM d LEFT JOIN agg ON agg.doc_id = d.doc_id""".stripMargin

  /** The quality battery over ADPCM-DECODED samples: the shared
    * fold CTE yields the exact decoded trajectory, then the same
    * aligned-window silence test, clip count (|s| ≥ 32512), peak and
    * RMS as the PCM oracle — all integer until the final 6-dp
    * roundings. Empty docs score the all-zero row (rate comes from the
    * fmt chunk, which exists even with no samples). */
  private def adpcmQualityOracle: String =
    s"""WITH ${adpcmCtes},
       |w AS (
       |  SELECT doc_id, i // 64 AS win, sum(abs(dec)) AS ws,
       |    count(*) AS wn
       |  FROM st GROUP BY 1, 2),
       |wa AS (
       |  SELECT doc_id, count(*) AS n_windows,
       |    sum(CASE WHEN ws * 100 < 32768 * wn THEN 1 ELSE 0 END)
       |      AS silent_windows
       |  FROM w GROUP BY 1),
       |sa AS (
       |  SELECT doc_id, count(*) AS n, max(abs(dec)) AS peak,
       |    sum(CASE WHEN abs(dec) >= 32512 THEN 1 ELSE 0 END) AS clipped,
       |    sum(CAST(abs(dec) AS BIGINT) * abs(dec)) AS sumsq
       |  FROM st GROUP BY 1)
       |SELECT d.doc_id,
       |  8000 AS sample_rate,
       |  CAST(coalesce(sa.n, 0) AS BIGINT) AS n_samples,
       |  CAST(coalesce(sa.peak, 0) AS INTEGER) AS peak,
       |  CAST(coalesce(sa.clipped, 0) AS BIGINT) AS clipped_samples,
       |  CASE WHEN coalesce(sa.n, 0) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE round(CAST(sa.clipped AS DOUBLE) / sa.n, 6)
       |  END AS clip_ratio,
       |  CAST(coalesce(wa.n_windows, 0) AS BIGINT) AS n_windows,
       |  CAST(coalesce(wa.silent_windows, 0) AS BIGINT) AS silent_windows,
       |  CASE WHEN coalesce(wa.n_windows, 0) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE round(CAST(wa.silent_windows AS DOUBLE) / wa.n_windows, 6)
       |  END AS silence_ratio,
       |  CASE WHEN coalesce(sa.n, 0) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE round(sqrt(CAST(sa.sumsq AS DOUBLE) / sa.n) / 32768.0, 6)
       |  END AS rms
       |FROM d
       |LEFT JOIN sa ON sa.doc_id = d.doc_id
       |LEFT JOIN wa ON wa.doc_id = d.doc_id""".stripMargin

  /** DuckDB replay of the pooled video embedding: frame f of a doc is
    * bytes [64f, 64f + flen) (flen = min(64, len − 64f), ≤5 frames);
    * each frame's pixel grid and 8-band float32 means replay exactly as
    * [[imageNeardupOracle]]; the per-video band is the frame-ORDERED
    * left-to-right sum (the engine's sorted-prefix fold) / n_frames. */
  /** The shared replay of the video pipeline up to the UNROUNDED
    * per-(doc, band) frame-ordered sums (`agg`: doc_id, j, sj, nf) —
    * consumed rounded by [[videoPooledOracle]] and float32-cast by the
    * joint A/V near-dup oracle. */
  private def videoBandCtes: String =
    s"""nz AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS len
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |fr AS (
       |  SELECT doc_id, text, len,
       |    unnest(range(0, CAST(least(5, ceil(len / 64.0)) AS BIGINT))) AS f
       |  FROM nz),
       |fb AS (
       |  SELECT doc_id, text, f, f * 64 AS off,
       |    least(64, len - f * 64) AS flen
       |  FROM fr),
       |fpx AS (
       |  SELECT doc_id, text, f, off, flen,
       |    CAST(ceil(flen / 16.0) AS BIGINT) AS h,
       |    unnest(range(0, 16 * CAST(ceil(flen / 16.0) AS BIGINT))) AS i
       |  FROM fb),
       |fpv AS (
       |  SELECT doc_id, f, least(7, ((i // 16) * 8) // h) AS band,
       |    CASE WHEN i < flen THEN unicode(text[CAST(off + i + 1 AS INTEGER)])
       |         ELSE 0 END AS v
       |  FROM fpx),
       |fbs AS (SELECT doc_id, f, band, sum(v) AS s, count(1) AS n
       |        FROM fpv GROUP BY 1, 2, 3),
       |fbe AS (
       |  SELECT fb.doc_id, fb.f, r.j,
       |    coalesce(CAST(CAST(b.s AS DOUBLE) / b.n / 255.0 AS FLOAT)::DOUBLE,
       |      0.0) AS ev
       |  FROM fb CROSS JOIN (SELECT unnest(range(0, 8)) AS j) r
       |  LEFT JOIN fbs b ON b.doc_id = fb.doc_id AND b.f = fb.f
       |    AND b.band = r.j),
       |agg AS (
       |  SELECT doc_id, j, list_sum(list(ev ORDER BY f)) AS sj,
       |    count(1) AS nf
       |  FROM fbe GROUP BY 1, 2)""".stripMargin

  private def videoPooledOracle: String =
    s"""WITH $videoBandCtes
       |SELECT doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
       |${(0 until 8).map(j =>
          s"  round(max(CASE WHEN j = $j THEN sj END) / max(nf), 6) AS band${j + 1}")
          .mkString(",\n")}
       |FROM agg GROUP BY 1""".stripMargin

  /** DuckDB replay of the joint A/V near-dup: 8 video bands (the
    * UNROUNDED frame-ordered sums / n, float32-cast exactly like the
    * engine's joint-vector build) ++ 8 audio amplitude bands (the
    * audioNeardup replay), then the SAME SemDeDup trajectory
    * (lloyd2Ctes k=4, dim=16) and within-cell cosine the other
    * near-dup oracles replay. */
  private def avJointNeardupOracle(threshold: Double): String =
    s"""WITH $videoBandCtes,
       |vb AS (SELECT doc_id, j AS jj,
       |         CAST(CAST(sj / nf AS FLOAT) AS DOUBLE) AS ev
       |       FROM agg),
       |sv AS (
       |  SELECT doc_id, text, len, unnest(range(0, len)) AS i FROM nz),
       |pv AS (
       |  SELECT doc_id, least(7, (i * 8) // len) AS band,
       |    abs((unicode(text[CAST(i + 1 AS INTEGER)]) - 128) * 256) AS v
       |  FROM sv),
       |absum AS (SELECT doc_id, band, sum(v) AS s, count(1) AS n
       |          FROM pv GROUP BY 1, 2),
       |ab AS (
       |  SELECT nz.doc_id, 8 + r.j AS jj,
       |    coalesce(CAST(CAST(b.s AS DOUBLE) / b.n / 32768.0 AS FLOAT)::DOUBLE,
       |      0.0) AS ev
       |  FROM nz CROSS JOIN (SELECT unnest(range(0, 8)) AS j) r
       |  LEFT JOIN absum b ON b.doc_id = nz.doc_id AND b.band = r.j),
       |emb0 AS (
       |  SELECT doc_id AS vec_id, list(ev ORDER BY jj) AS e
       |  FROM (SELECT doc_id, jj, ev FROM vb
       |        UNION ALL SELECT doc_id, jj, ev FROM ab) u
       |  GROUP BY 1),
       |emb AS (SELECT vec_id, e,
       |          list_sum(list_transform(e, x -> x * x)) AS xx
       |        FROM emb0),
       |${SimilarityQueries.lloyd2Ctes("emb", 4, dim = 16)},
       |s2 AS (
       |  SELECT m.vec_id, c.cid, ${SimilarityQueries.d2Sql("m", "c", dim = 16)} AS d
       |  FROM emb m CROSS JOIN c1cc c),
       |assigned AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM s2) WHERE rn = 1),
       |scored AS (
       |  SELECT aa.vec_id AS a, bb.vec_id AS b,
       |    list_sum(list_transform(range(1, 17), i -> ea.e[i] * eb.e[i]))
       |      / (sqrt(list_sum(list_transform(ea.e, x -> x * x)))
       |         * sqrt(list_sum(list_transform(eb.e, x -> x * x)))) AS cos
       |  FROM assigned aa
       |  JOIN assigned bb ON aa.cluster = bb.cluster AND aa.vec_id < bb.vec_id
       |  JOIN emb0 ea ON aa.vec_id = ea.vec_id
       |  JOIN emb0 eb ON bb.vec_id = eb.vec_id)
       |SELECT a, b, round(cos, 6) AS cos FROM scored
       |WHERE cos >= $threshold""".stripMargin

  /** DuckDB replay of the composed A/V curation pipeline: the
    * [[avJointNeardupOracle]] chain (video bands + audio bands +
    * Lloyd k=4 dim=16 + within-cell cosine pairs) extended with the
    * keyframe-count replay (the q_video_keyframes histogram/lag CTEs
    * over the shared `fb` frame table), the rms replay (the
    * audioQuality integer sum-of-squares over the raw-text samples),
    * the utterance replay (aligned-window silence + gaps-and-islands
    * over the same samples), and the greedy survivor rule (duplicate
    * iff the larger id of any pair). `pv` is MATERIALIZED — three
    * consumers (bands, rms, windows) over per-byte rows. */
  private def curationAvOracle(threshold: Double): String =
    s"""WITH $videoBandCtes,
       |vb AS (SELECT doc_id, j AS jj,
       |         CAST(CAST(sj / nf AS FLOAT) AS DOUBLE) AS ev
       |       FROM agg),
       |sv AS (
       |  SELECT doc_id, text, len, unnest(range(0, len)) AS i FROM nz),
       |pv AS MATERIALIZED (
       |  SELECT doc_id, i, least(7, (i * 8) // len) AS band,
       |    abs((unicode(text[CAST(i + 1 AS INTEGER)]) - 128) * 256) AS v
       |  FROM sv),
       |absum AS (SELECT doc_id, band, sum(v) AS s, count(1) AS n
       |          FROM pv GROUP BY 1, 2),
       |ab AS (
       |  SELECT nz.doc_id, 8 + r.j AS jj,
       |    coalesce(CAST(CAST(b.s AS DOUBLE) / b.n / 32768.0 AS FLOAT)::DOUBLE,
       |      0.0) AS ev
       |  FROM nz CROSS JOIN (SELECT unnest(range(0, 8)) AS j) r
       |  LEFT JOIN absum b ON b.doc_id = nz.doc_id AND b.band = r.j),
       |emb0 AS (
       |  SELECT doc_id AS vec_id, list(ev ORDER BY jj) AS e
       |  FROM (SELECT doc_id, jj, ev FROM vb
       |        UNION ALL SELECT doc_id, jj, ev FROM ab) u
       |  GROUP BY 1),
       |emb AS (SELECT vec_id, e,
       |          list_sum(list_transform(e, x -> x * x)) AS xx
       |        FROM emb0),
       |${SimilarityQueries.lloyd2Ctes("emb", 4, dim = 16)},
       |s2 AS (
       |  SELECT m.vec_id, c.cid, ${SimilarityQueries.d2Sql("m", "c", dim = 16)} AS d
       |  FROM emb m CROSS JOIN c1cc c),
       |assigned AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM s2) WHERE rn = 1),
       |scored AS (
       |  SELECT aa.vec_id AS a, bb.vec_id AS b,
       |    list_sum(list_transform(range(1, 17), i -> ea.e[i] * eb.e[i]))
       |      / (sqrt(list_sum(list_transform(ea.e, x -> x * x)))
       |         * sqrt(list_sum(list_transform(eb.e, x -> x * x)))) AS cos
       |  FROM assigned aa
       |  JOIN assigned bb ON aa.cluster = bb.cluster AND aa.vec_id < bb.vec_id
       |  JOIN emb0 ea ON aa.vec_id = ea.vec_id
       |  JOIN emb0 eb ON bb.vec_id = eb.vec_id),
       |dups AS (
       |  SELECT DISTINCT b AS doc_id FROM scored WHERE cos >= $threshold),
       |kpv AS (
       |  SELECT doc_id, f,
       |    (CASE WHEN i < flen
       |          THEN unicode(text[CAST(off + i + 1 AS INTEGER)])
       |          ELSE 0 END) // 16 AS b
       |  FROM (SELECT doc_id, text, f, off, flen,
       |          unnest(range(0, 16 * CAST(ceil(flen / 16.0) AS BIGINT)))
       |            AS i
       |        FROM fb)),
       |khb AS (SELECT doc_id, f, b, count(*) AS c FROM kpv GROUP BY 1, 2, 3),
       |khd AS (
       |  SELECT fb.doc_id, fb.f, gb.b, coalesce(khb.c, 0) AS c
       |  FROM fb CROSS JOIN (SELECT unnest(range(0, 16)) AS b) gb
       |  LEFT JOIN khb ON khb.doc_id = fb.doc_id AND khb.f = fb.f
       |    AND khb.b = gb.b),
       |khl AS (SELECT doc_id, f, list(c ORDER BY b) AS hist
       |        FROM khd GROUP BY 1, 2),
       |klg AS (SELECT doc_id, f, hist,
       |          lag(hist) OVER (PARTITION BY doc_id ORDER BY f) AS ph
       |        FROM khl),
       |kfc AS (
       |  SELECT doc_id, count(*) AS n_frames,
       |    sum(CASE WHEN ph IS NULL OR list_sum(list_transform(range(1, 17),
       |          i -> abs(hist[i] - ph[i]))) >= 40 THEN 1 ELSE 0 END)
       |      AS n_keyframes
       |  FROM klg GROUP BY 1),
       |sq AS (
       |  SELECT doc_id, count(*) AS n,
       |    sum(CAST(v AS BIGINT) * v) AS sumsq
       |  FROM pv GROUP BY 1),
       |uw AS (
       |  SELECT doc_id, i // 64 AS win, sum(v) AS ws, count(*) AS wn
       |  FROM pv GROUP BY 1, 2),
       |nsw AS (SELECT doc_id, win FROM uw WHERE ws * 100 >= 32768 * wn),
       |isl AS (
       |  SELECT doc_id, win,
       |    win - row_number() OVER (PARTITION BY doc_id ORDER BY win) AS grp
       |  FROM nsw),
       |nu AS (
       |  SELECT doc_id, count(*) AS n_utt
       |  FROM (SELECT doc_id, grp FROM isl GROUP BY doc_id, grp)
       |  GROUP BY 1)
       |SELECT sq.doc_id,
       |  CAST(coalesce(k.n_frames, 0) AS BIGINT) AS n_frames,
       |  CAST(coalesce(k.n_keyframes, 0) AS BIGINT) AS n_keyframes,
       |  CAST(coalesce(nu.n_utt, 0) AS BIGINT) AS n_utterances,
       |  round(sqrt(CAST(sq.sumsq AS DOUBLE) / sq.n) / 32768.0, 6) AS rms,
       |  (d.doc_id IS NOT NULL) AS is_dup,
       |  (d.doc_id IS NULL
       |    AND round(sqrt(CAST(sq.sumsq AS DOUBLE) / sq.n) / 32768.0, 6) >= 0.34
       |    AND coalesce(k.n_keyframes, 0) >= 1
       |    AND coalesce(nu.n_utt, 0) >= 1) AS kept
       |FROM sq
       |LEFT JOIN kfc k ON k.doc_id = sq.doc_id
       |LEFT JOIN nu ON nu.doc_id = sq.doc_id
       |LEFT JOIN dups d ON d.doc_id = sq.doc_id""".stripMargin

  /** Shared DuckDB replay of the dHash bit matrix: bytes → the 9×8
    * block-sum grid (densified so empty cells carry s = n = 0, exactly
    * the engine's zero-initialized arrays) → 64 adjacent-pair bits via
    * the same cross-multiplied integer comparison → four 16-bit bands
    * (`dbands`: doc_id, blk, bval). Relies on the ASCII-CORPUS
    * INVARIANT (engine hashes UTF-8 bytes, replay indexes characters —
    * see `DedupQueries.cdcCtes` scaladoc; asserted per scale factor by
    * Round13Spec). */
  private def dHashCtes: String =
    s"""nz AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS len,
       |    CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS h
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |dpx AS (
       |  SELECT doc_id, text, len, h, unnest(range(0, 16 * h)) AS i
       |  FROM nz),
       |dpv AS (
       |  SELECT doc_id, least(7, ((i // 16) * 8) // h) AS gy,
       |    least(8, ((i % 16) * 9) // 16) AS gx,
       |    CASE WHEN i < len THEN unicode(text[CAST(i + 1 AS INTEGER)])
       |         ELSE 0 END AS v
       |  FROM dpx),
       |dgs AS (SELECT doc_id, gy, gx, sum(v) AS s, count(1) AS n
       |        FROM dpv GROUP BY 1, 2, 3),
       |dgrid AS (
       |  SELECT nz.doc_id, g.gy, g.gx,
       |    coalesce(dgs.s, 0) AS s, coalesce(dgs.n, 0) AS n
       |  FROM nz CROSS JOIN (
       |    SELECT a.gy, b.gx
       |    FROM (SELECT unnest(range(0, 8)) AS gy) a,
       |         (SELECT unnest(range(0, 9)) AS gx) b) g
       |  LEFT JOIN dgs ON dgs.doc_id = nz.doc_id AND dgs.gy = g.gy
       |    AND dgs.gx = g.gx),
       |dbits AS (
       |  SELECT l.doc_id, l.gy * 8 + l.gx AS bit,
       |    CASE WHEN l.s * r.n < r.s * l.n THEN 1 ELSE 0 END AS b
       |  FROM dgrid l JOIN dgrid r ON r.doc_id = l.doc_id AND r.gy = l.gy
       |    AND r.gx = l.gx + 1
       |  WHERE l.gx < 8),
       |dbands AS (
       |  SELECT doc_id, bit // 16 AS blk,
       |    CAST(sum(b * (1 << (bit % 16))) AS BIGINT) AS bval
       |  FROM dbits GROUP BY 1, 2)""".stripMargin

  private def imagePhashOracle: String =
    s"""WITH $dHashCtes
       |SELECT doc_id,
       |  max(CASE WHEN blk = 0 THEN bval END) AS b0,
       |  max(CASE WHEN blk = 1 THEN bval END) AS b1,
       |  max(CASE WHEN blk = 2 THEN bval END) AS b2,
       |  max(CASE WHEN blk = 3 THEN bval END) AS b3
       |FROM dbands GROUP BY 1""".stripMargin

  /** Cross variant of [[phashNeardupOracle]]: batch docs (split bucket
    * ≥ 14) probe corpus docs (< 14) — splits are disjoint, so the
    * id-inequality guard is structural. */
  private def phashCrossOracle(maxHamming: Int): String =
    s"""WITH $dHashCtes,
       |psb AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))
       |      AS INTEGER) AS bkt
       |  FROM nz),
       |pcorp AS (
       |  SELECT d.doc_id, d.blk, d.bval FROM dbands d
       |  JOIN psb ON psb.doc_id = d.doc_id AND psb.bkt < 14),
       |pbat AS (
       |  SELECT d.doc_id, d.blk, d.bval FROM dbands d
       |  JOIN psb ON psb.doc_id = d.doc_id AND psb.bkt >= 14),
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
       |  FROM pbat b JOIN pcorp c ON b.blk = c.blk AND b.bval = c.bval),
       |ham AS (
       |  SELECT cd.batch_id, cd.corpus_id,
       |    sum(bit_count(xor(bb.bval, cb.bval))) AS hamming
       |  FROM cand cd
       |  JOIN dbands bb ON bb.doc_id = cd.batch_id
       |  JOIN dbands cb ON cb.doc_id = cd.corpus_id AND cb.blk = bb.blk
       |  GROUP BY 1, 2)
       |SELECT batch_id, corpus_id, CAST(hamming AS INT) AS hamming
       |FROM ham WHERE hamming <= $maxHamming""".stripMargin

  private def phashNeardupOracle(maxHamming: Int): String =
    s"""WITH $dHashCtes,
       |cand AS (
       |  SELECT DISTINCT la.doc_id AS a, lb.doc_id AS b
       |  FROM dbands la JOIN dbands lb
       |    ON la.blk = lb.blk AND la.bval = lb.bval
       |    AND la.doc_id < lb.doc_id),
       |ham AS (
       |  SELECT c.a, c.b, sum(bit_count(xor(ba.bval, bb.bval))) AS hamming
       |  FROM cand c
       |  JOIN dbands ba ON ba.doc_id = c.a
       |  JOIN dbands bb ON bb.doc_id = c.b AND bb.blk = ba.blk
       |  GROUP BY 1, 2)
       |SELECT a, b, CAST(hamming AS INT) AS hamming FROM ham
       |WHERE hamming <= $maxHamming""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_binaryfile_ingest" ->
      """SELECT doc_id,
        |  16 AS width,
        |  ceil(octet_length(encode(text)) / 16.0)::INTEGER AS height,
        |  round(coalesce(list_sum(list_transform(string_split(text, ''),
        |          x -> unicode(x))), 0)
        |        / (16 * ceil(octet_length(encode(text)) / 16.0)),
        |        4) AS mean_pixel
        |FROM documents
        |WHERE octet_length(encode(text)) > 0""".stripMargin,
    "q_image_phash" -> imagePhashOracle,
    "q_phash_neardup" -> phashNeardupOracle(maxHamming = 3),
    "q_phash_incremental_persisted" -> phashCrossOracle(maxHamming = 3),
    "q_image_neardup" -> imageNeardupOracle(threshold = 0.99995),
    "q_audio_neardup" -> audioNeardupOracle(threshold = 0.99995),
    "q_audio_features" -> audioFeaturesOracle,
    "q_audio_spectral" -> audioSpectralOracle,
    "q_audio_spectral_neardup" ->
      audioSpectralNeardupOracle(threshold = 0.999),
    "q_audio_fingerprint_matches" -> audioFingerprintOracle(minVotes = 10L),
    "q_audio_fp_incremental_persisted" ->
      audioFingerprintLookupOracle(minVotes = 10L),
    "q_audio_quality" -> audioQualityOracle,
    // utterance replay: the audioQuality sv/window chain over the
    // pad+text+pad+text payload, non-silent windows grouped into
    // maximal runs by the win − row_number islands idiom
    "q_audio_utterances" ->
      s"""WITH d AS (
         |  SELECT doc_id, coalesce(text, '') AS text,
         |    octet_length(encode(coalesce(text, ''))) AS len
         |  FROM documents),
         |sv AS (
         |  SELECT doc_id, i,
         |    CASE WHEN i < 80 THEN 0
         |         WHEN i < 80 + len THEN
         |           abs((unicode(text[CAST(i - 80 + 1 AS INTEGER)]) - 128) * 256)
         |         WHEN i < 160 + len THEN 0
         |         ELSE
         |           abs((unicode(text[CAST(i - 160 - len + 1 AS INTEGER)]) - 128) * 256)
         |    END AS a
         |  FROM (SELECT doc_id, text, len,
         |          unnest(range(0, 160 + 2 * len)) AS i FROM d)),
         |w AS (
         |  SELECT doc_id, i // 64 AS win, sum(a) AS ws, count(*) AS wn
         |  FROM sv GROUP BY 1, 2),
         |nsw AS (SELECT doc_id, win FROM w WHERE ws * 100 >= 32768 * wn),
         |isl AS (
         |  SELECT doc_id, win,
         |    win - row_number() OVER (PARTITION BY doc_id ORDER BY win)
         |      AS grp
         |  FROM nsw),
         |seg AS (
         |  SELECT doc_id, grp, min(win) AS start_win, max(win) AS end_win,
         |    count(*) AS n_windows
         |  FROM isl GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_win)
         |    - 1 AS INTEGER) AS utt_idx,
         |  CAST(start_win AS BIGINT) AS start_win,
         |  CAST(end_win AS BIGINT) AS end_win,
         |  n_windows::BIGINT AS n_windows
         |FROM seg""".stripMargin,
    // decimated integer stream replayed exactly: block mean =
    // floor(sum / n) == the engine's Math.floorDiv; features then
    // follow the audioFeaturesOracle shape over the decimated samples
    "q_audio_resample" ->
      s"""WITH d AS (
         |  SELECT doc_id, coalesce(text, '') AS text,
         |    octet_length(encode(coalesce(text, ''))) AS len
         |  FROM documents),
         |sv AS (
         |  SELECT doc_id, i,
         |    (unicode(text[CAST(i + 1 AS INTEGER)]) - 128) * 256 AS s
         |  FROM (SELECT doc_id, text, unnest(range(0, len)) AS i FROM d)),
         |dv AS (
         |  SELECT doc_id, i // 4 AS k,
         |    CAST(floor(CAST(sum(s) AS DOUBLE) / count(1)) AS INTEGER) AS s
         |  FROM sv GROUP BY 1, 2),
         |cr AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN (s < 0) <> (prev < 0) THEN 1 ELSE 0 END) AS zc
         |  FROM (SELECT doc_id, s,
         |          lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS prev
         |        FROM dv)
         |  WHERE prev IS NOT NULL GROUP BY 1),
         |ma AS (SELECT doc_id, sum(abs(s)) AS sa, count(1) AS n
         |       FROM dv GROUP BY 1),
         |b0 AS (
         |  SELECT dv.doc_id, sum(abs(s)) AS bs, count(1) AS bn
         |  FROM dv JOIN ma ON ma.doc_id = dv.doc_id
         |  WHERE least(7, (k * 8) // ma.n) = 0 GROUP BY 1)
         |SELECT d.doc_id,
         |  2000 AS sample_rate,
         |  CAST(coalesce(ma.n, 0) AS BIGINT) AS n_samples,
         |  CAST(coalesce(cr.zc, 0) AS BIGINT) AS zero_crossings,
         |  coalesce(round((CAST(ma.sa AS DOUBLE) / ma.n) / 32768.0, 4), 0.0)
         |    AS mean_amp,
         |  coalesce(round(CAST(CAST((CAST(b0.bs AS DOUBLE) / b0.bn) / 32768.0
         |    AS FLOAT) AS DOUBLE), 6), 0.0) AS band0
         |FROM d
         |LEFT JOIN cr ON cr.doc_id = d.doc_id
         |LEFT JOIN ma ON ma.doc_id = d.doc_id
         |LEFT JOIN b0 ON b0.doc_id = d.doc_id""".stripMargin,
    "q_adpcm_roundtrip" -> adpcmOracle,
    "q_adpcm_quality" -> adpcmQualityOracle,
    "q_video_pooled_embedding" -> videoPooledOracle,
    // the AVI pipeline shares the oracle: RIFF mux/demux is
    // byte-identity on frame payloads and PNG is lossless on pixels,
    // so the container round trip must be a feature no-op
    "q_video_avi_pipeline" -> videoPooledOracle,
    // keyframe replay: frame f of a doc is bytes [64f, 64f+flen)
    // zero-padded to the 16-wide row grid (exactly what the PNG
    // decoder yields), histogram bin = px // 16 over the padded
    // pixels, consecutive-frame L1 via lag per doc — pure integers
    "q_video_keyframes" ->
      """WITH nz AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |fr AS (
        |  SELECT doc_id, len,
        |    unnest(range(0, least(5, CAST(ceil(len / 64.0) AS BIGINT)))) AS f
        |  FROM nz),
        |fp AS (SELECT doc_id, f, least(64, len - 64 * f) AS flen FROM fr),
        |px AS (
        |  SELECT doc_id, f,
        |    CASE WHEN i < flen
        |         THEN unicode(text[CAST(64 * f + i + 1 AS INTEGER)])
        |         ELSE 0 END AS v
        |  FROM (SELECT nz.doc_id, fp.f, fp.flen, nz.text,
        |          unnest(range(0, 16 * CAST(ceil(fp.flen / 16.0) AS BIGINT)))
        |            AS i
        |        FROM fp JOIN nz ON nz.doc_id = fp.doc_id)),
        |hb AS (SELECT doc_id, f, v // 16 AS b, count(*) AS c
        |       FROM px GROUP BY 1, 2, 3),
        |hd AS (
        |  SELECT fp.doc_id, fp.f, gb.b, coalesce(hb.c, 0) AS c
        |  FROM fp CROSS JOIN (SELECT unnest(range(0, 16)) AS b) gb
        |  LEFT JOIN hb ON hb.doc_id = fp.doc_id AND hb.f = fp.f
        |    AND hb.b = gb.b),
        |hl AS (SELECT doc_id, f, list(c ORDER BY b) AS hist
        |       FROM hd GROUP BY 1, 2),
        |lg AS (SELECT doc_id, f, hist,
        |         lag(hist) OVER (PARTITION BY doc_id ORDER BY f) AS ph
        |       FROM hl)
        |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        |  CASE WHEN ph IS NULL THEN NULL
        |       ELSE CAST(list_sum(list_transform(range(1, 17),
        |              i -> abs(hist[i] - ph[i]))) AS BIGINT) END AS l1_dist,
        |  (ph IS NULL OR list_sum(list_transform(range(1, 17),
        |     i -> abs(hist[i] - ph[i]))) >= 40) AS is_keyframe
        |FROM lg""".stripMargin,
    // the GIF pipeline shares it too: identity-palette GIF is lossless
    // on 8-bit gray, so the second container round trip must also be a
    // feature no-op — three queries, one oracle
    "q_video_gif_pipeline" -> videoPooledOracle,
    "q_av_joint_neardup" -> avJointNeardupOracle(threshold = 0.99995),
    "q_curation_av" -> curationAvOracle(threshold = 0.99995),
    // the two-stream container: video replay JOIN audio replay — each
    // leg is the SAME SQL already pinned green standalone, so the new
    // claim is exactly that one muxAv container round-trips both
    // modalities without stream bleed (the join keys the legs to the
    // same doc); the audio oracle covers all docs, the video one only
    // non-empty, and the engine filters non-empty — the inner join
    // restricts both legs identically
    "q_av_container_features" ->
      s"""WITH v AS ($videoPooledOracle),
         |a AS ($audioFeaturesOracle)
         |SELECT v.doc_id, v.n_frames,
         |${(1 to 8).map(j => s"  v.band$j").mkString(",\n")},
         |  a.sample_rate, a.n_samples, a.zero_crossings, a.mean_amp,
         |  a.band0
         |FROM v JOIN a ON a.doc_id = v.doc_id""".stripMargin,
    // text is ASCII, so utf-8 byte values == codepoints; the image is
    // 16 pixels wide, zero-padded to full rows, so mean luminance =
    // byte sum / (16 * rows)
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  16 AS width,
        |  greatest(ceil(octet_length(encode(text)) / 16.0), 1)::INTEGER AS height,
        |  round(coalesce(list_sum(list_transform(string_split(text, ''),
        |          x -> unicode(x))), 0)
        |        / (16 * greatest(ceil(octet_length(encode(text)) / 16.0), 1)),
        |        4) AS mean_pixel,
        |  8 AS embedding_dim
        |FROM documents""".stripMargin,
    // frame count = min(maxFrames, ceil(len/frameSize)); the sampled
    // frames cover the first min(len, maxFrames*frameSize) bytes;
    // resize(4) keeps every 4th byte -> ceil(len/4)
    "q_multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(least(5, ceil(octet_length(encode(text)) / 64.0)) AS BIGINT) AS n_frames,
        |  CAST(least(octet_length(encode(text)), 320) AS BIGINT) AS sum_frame_bytes,
        |  CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS n_resized_bytes
        |FROM documents
        |WHERE octet_length(encode(text)) > 0""".stripMargin,
  )
}
