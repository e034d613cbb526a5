package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.multimodal.Multimodal
import graft.schemas.Tables

class MultimodalSpec extends SparkSpec with Matchers {

  private lazy val media =
    Multimodal.fromDocuments(Tables.load(spark, "/root/testdata/sf0.001", "documents"))
      .cache()

  test("media table: binary payload + typed metadata struct, total partition") {
    media.schema("payload").dataType.typeName shouldBe "binary"
    media.schema("meta").dataType.typeName shouldBe "struct"
    media.select("kind").distinct().count() shouldBe 3
    media.count() shouldBe 500
  }

  test("feature extraction: fixed-dim normalized features, deterministic") {
    val f1 = Multimodal.extractFeatures(media).cache()
    f1.count() shouldBe 500
    val row = f1.filter(col("media_id") === 0).collect()(0)
    row.getAs[Seq[Double]]("features").length shouldBe 16
    row.getAs[Seq[Double]]("features").sum shouldBe 1.0 +- 1e-9 // L1-normalized histogram
    val f2 = Multimodal.extractFeatures(media)
    f1.select("media_id", "features").collect().toSet shouldBe
      f2.select("media_id", "features").collect().toSet
  }

  test("frame sampling: one payload row → N frame rows with partitioned bytes") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 2), 4)
    frames.count() shouldBe 4
    frames.select(min(col("frame_idx")), max(col("frame_idx"))).collect()(0)
      .toSeq shouldBe Seq(0, 3)
  }

  test("resize bounds payload size") {
    val resized = Multimodal.resizePayload(media, 10)
    resized.select(max(org.apache.spark.sql.functions.length(col("payload"))))
      .collect()(0).getInt(0) should be <= 10
  }

  test("real image codec: ImageIO decodes a generated PNG and features reflect pixels") {
    import graft.multimodal.{ImageIoCodec, Multimodal}
    // 8x8 PNG: top half black, bottom half white
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (y < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val s2 = spark
    import s2.implicits._
    val mediaDf = Seq((1L, "image", png), (2L, "audio", png))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 8, 'height', 8, 'duration_ms', 0L, 'codec', 'png')"))
    val out = Multimodal.extractFeatures(mediaDf, featureDim = 16,
      codecs = Map("image" -> ImageIoCodec))
      .collect().map(r => r.getAs[String]("kind") ->
        r.getAs[Seq[Double]]("features")).toMap

    // image row went through the REAL decode: half the pixels land in the
    // darkest luminance bin, half in the brightest
    out("image")(0) shouldBe 0.5 +- 1e-9
    out("image")(15) shouldBe 0.5 +- 1e-9
    out("image").sum shouldBe 1.0 +- 1e-9
    // audio kind has no codec mapped -> byte-histogram stub over the SAME
    // bytes gives a different (encoded-byte) distribution
    out("audio") should not equal out("image")

    // undecodable payload degrades to the stub, not a failure
    val bad = Seq((3L, "image", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 0, 'height', 0, 'duration_ms', 0L, 'codec', 'none')"))
    val badOut = Multimodal.extractFeatures(bad, featureDim = 16,
      codecs = Map("image" -> ImageIoCodec)).collect()(0)
    badOut.getAs[Seq[Double]]("features").sum shouldBe 1.0 +- 1e-9
  }

  test("real audio codec: WAV decode recovers the PCM samples exactly") {
    import graft.multimodal.WavCodec
    // 256 16-bit samples sweeping the full range: sample k = k*256 - 32768
    // → exactly 16 samples per 16-bin histogram bin
    val pcm = new Array[Byte](512)
    for (k <- 0 until 256) {
      val s = k * 256 - 32768
      pcm(2 * k) = (s & 0xff).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 256),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    // r12: the hand-rolled fixture container (q61's encode path, which
    // skips the synchronized AudioSystem SPI registry) must be
    // BYTE-FOR-BYTE the JDK writer's output — downstream hashes unchanged
    graft.multimodal.WavEncode.wavBytes(pcm, 8000) shouldBe wav

    val feats = WavCodec.features(wav, 16).get
    feats.foreach(_ shouldBe (1.0 / 16) +- 1e-9) // uniform sweep → uniform bins
    feats.sum shouldBe 1.0 +- 1e-9

    // the same WAV through the Spark plumbing takes the real codec path
    val s2 = spark
    import s2.implicits._
    val mediaDf = Seq((1L, "audio", wav)).toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 0, 'height', 0, 'duration_ms', 32L, 'codec', 'wav')"))
    val out = Multimodal.extractFeatures(mediaDf, featureDim = 16,
      codecs = Map("audio" -> WavCodec)).collect()(0)
    out.getAs[Seq[Double]]("features").toArray shouldBe feats

    // undecodable payload degrades to the byte-histogram stub, not a failure
    WavCodec.features("not audio".getBytes("UTF-8"), 16) shouldBe None
  }

  test("real video codec: GIF frames decode 1→N with exact palette round-trip") {
    import graft.multimodal.GifFramesCodec
    // 2-frame 8x8 GIF over an explicit 256-gray palette: frame 0 all
    // black, frame 1 half black half white
    val cmap = Array.tabulate(256)(g => (0xff << 24) | (g << 16) | (g << 8) | g)
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 2) {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 8; x <- 0 until 8)
        img.getRaster.setSample(x, y, 0, if (f == 1 && y >= 4) 255 else 0)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray

    val frames = GifFramesCodec.frameFeatures(gif, 16).get
    frames.length shouldBe 2
    frames(0)(0) shouldBe 1.0 +- 1e-9 // all pixels in the darkest bin
    frames(1)(0) shouldBe 0.5 +- 1e-9
    frames(1)(15) shouldBe 0.5 +- 1e-9

    // through the Spark plumbing: one row per frame, real codec path
    val s2 = spark
    import s2.implicits._
    val mediaDf = Seq((7L, "video", gif)).toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 8, 'height', 8, 'duration_ms', 200L, 'codec', 'gif')"))
    val out = Multimodal.extractFrameFeatures(mediaDf, featureDim = 16,
      codecs = Map("video" -> GifFramesCodec)).collect()
    out.length shouldBe 2
    out.map(_.getAs[Int]("frame_idx")).sorted shouldBe Array(0, 1)

    // undecodable payload: fallback slices into `fallbackFrames` stub rows
    val bad = Seq((8L, "video", "not a gif at all".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 0, 'height', 0, 'duration_ms', 0L, 'codec', 'none')"))
    val badOut = Multimodal.extractFrameFeatures(bad, featureDim = 16,
      codecs = Map("video" -> GifFramesCodec), fallbackFrames = 3).collect()
    badOut.length shouldBe 3
    badOut.foreach(_.getAs[Seq[Double]]("features").sum shouldBe 1.0 +- 1e-9)
  }
}
