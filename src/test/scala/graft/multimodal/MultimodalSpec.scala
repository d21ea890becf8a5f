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
