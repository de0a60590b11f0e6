package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  test("binary blob metadata pipeline: schema, determinism, batching") {
    import spark.implicits._
    val blobs = Seq(
      MediaBlob(1L, "image", "fake-image-bytes".getBytes),
      MediaBlob(2L, "video", Array.fill(4096)(7.toByte)),
      MediaBlob(3L, "audio", Array[Byte]())).toDS()
    val meta = extractMeta(blobs).collect().sortBy(_.doc_id)
    assert(meta.map(_.n_bytes).toSeq == Seq(16L, 4096L, 0L))
    assert(meta.forall(m => m.width >= 320 && m.width < 1600))
    assert(meta.forall(m => m.height >= 240 && m.height < 960))
    // deterministic: same bytes → same decode
    val again = extractMeta(blobs).collect().sortBy(_.doc_id)
    assert(meta.toSeq == again.toSeq)
  }

  test("ImageIoCodec decodes a real PNG; non-images fall back to the stub") {
    import spark.implicits._
    // generate a genuine 37x21 PNG with the JDK — no fixture file
    val img = new java.awt.image.BufferedImage(
      37, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 5, 0xff8800)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray

    val blobs = Seq(
      MediaBlob(1L, "image", png),
      MediaBlob(2L, "image", "not-actually-an-image".getBytes), // undecodable
      MediaBlob(3L, "audio", Array.fill(2048)(3.toByte))).toDS()
    val meta = extractMeta(blobs, ImageIoCodec).collect().sortBy(_.doc_id)

    // real pixel dimensions from the actual decode
    assert((meta(0).width, meta(0).height, meta(0).n_frames) == (37, 21, 1))
    // declined rows fall back to the deterministic stub, bit-identical
    // to what the default path would produce
    val stub = extractMeta(blobs, StubCodec).collect().sortBy(_.doc_id)
    assert(meta(1) == stub(1) && meta(2) == stub(2))
  }

  test("JdkCodec decodes a real WAV's rate/channels/frames; images still via imageio") {
    import spark.implicits._
    // 8000 Hz mono 16-bit WAV, 1234 frames of silence, generated in-test
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](1234 * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 1234L)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray

    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val ibuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", ibuf)

    val blobs = Seq(
      MediaBlob(1L, "audio", wav),
      MediaBlob(2L, "image", ibuf.toByteArray),
      MediaBlob(3L, "video", Array.fill(100)(1.toByte))).toDS()
    val meta = extractMeta(blobs, JdkCodec).collect().sortBy(_.doc_id)

    // audio mapping: width=sample rate Hz, height=channels, n_frames=PCM frames
    assert((meta(0).width, meta(0).height, meta(0).n_frames) == (8000, 1, 1234))
    assert((meta(1).width, meta(1).height) == (8, 4))
    // video: no JDK decoder -> deterministic stub fallback
    val stub = extractMeta(blobs, StubCodec).collect().sortBy(_.doc_id)
    assert(meta(2) == stub(2))
  }

  test("resize plan clamps the long side and preserves aspect") {
    import spark.implicits._
    val meta = Seq(
      MediaMeta(1L, "image", 100L, 1600, 800, 1),  // downscale 2x
      MediaMeta(2L, "image", 100L, 320, 240, 1),   // untouched
      MediaMeta(3L, "image", 100L, 600, 900, 1)).toDS() // portrait
    val out = resizePlan(meta, 800).collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getInt(5))).toSet
    assert(out === Set((1L, 800, 400), (2L, 320, 240), (3L, 533, 800)))
  }

  test("frame sampling explodes only video rows") {
    import spark.implicits._
    val meta = Seq(
      MediaMeta(1L, "video", 4096L, 640, 480, 5),
      MediaMeta(2L, "image", 100L, 640, 480, 1)).toDS()
    val frames = sampleFrames(meta, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.toSet == Set((1L, 0), (1L, 2), (1L, 4)))
  }
}
