package graft

import java.awt.image.BufferedImage

import org.scalatest.matchers.should.Matchers

import graft.dedup.ImagePhash

class ImagePhashSpec extends SparkSpec with Matchers {

  private def gray(w: Int, h: Int)(pix: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash64: strictly increasing rows → all 64 bits set; flat image → 0") {
    ImagePhash.dHash64(gray(9, 8)((x, _) => x * 20)) shouldBe -1L // 64 ones
    ImagePhash.dHash64(gray(9, 8)((_, _) => 100)) shouldBe 0L
  }

  test("dHash64 is brightness-shift invariant away from saturation") {
    val base = ImagePhash.dHash64(gray(9, 8)((x, y) => 60 + ((x * 13 + y * 7) % 100)))
    val brighter = ImagePhash.dHash64(gray(9, 8)((x, y) => 90 + ((x * 13 + y * 7) % 100)))
    brighter shouldBe base
  }

  test("dHash64 box-pooling: a 2x-upscaled image hashes identically to its source") {
    def pix(x: Int, y: Int): Int = (x * 31 + y * y * 7) % 256
    val small = gray(9, 8)(pix)
    // 18×16: each source pixel becomes a 2×2 block; the integer box
    // filter's floor-mean over a constant block is the pixel itself
    val big = gray(18, 16)((x, y) => pix(x / 2, y / 2))
    ImagePhash.dHash64(big) shouldBe ImagePhash.dHash64(small)
  }

  test("aHash64: half-bright image sets exactly the bright cells") {
    // left 4 columns 0, right 4 columns 200 → mean 100, bright bits set
    val img = gray(8, 8)((x, _) => if (x < 4) 0 else 200)
    val fp = ImagePhash.aHash64(img)
    java.lang.Long.bitCount(fp) shouldBe 32
    // bit r*8+c set ⟺ c >= 4
    for (r <- 0 until 8; c <- 0 until 8)
      (((fp >>> (r * 8 + c)) & 1L) == 1L) shouldBe (c >= 4)
  }

  test("dHashNearDups: planted dup/near-dup found, far image absent, undecodable dropped") {
    val s = spark
    import s.implicits._
    def pix(x: Int, y: Int): Int = ((x * 37 + y * y * 13) % 200) + 20
    val a = png(gray(9, 8)(pix))                    // base
    val b = png(gray(9, 8)(pix))                    // exact dup of a
    val c = png(gray(9, 8)((x, y) =>                // one perturbed pixel
      if (x == 3 && y == 2) (pix(x, y) + 128) % 256 else pix(x, y)))
    val far = png(gray(9, 8)((x, y) =>              // unrelated content
      ((x * 151 + y * 83 + (x * y) % 7 * 91) % 256)))
    val junk = Array[Byte](1, 2, 3)                 // not an image
    val media = Seq(
      (1L, "image", a), (2L, "image", b), (3L, "image", c),
      (4L, "image", far), (5L, "image", junk))
      .toDF("media_id", "kind", "payload")
    val pairs = ImagePhash.dHashNearDups(media, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact dup at distance 0
    pairs.map(p => (p._1, p._2)) should contain((1L, 2L))
    pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 shouldBe 0L
    // single-pixel perturbation flips ≤ 2 dHash bits → found
    pairs.map(p => (p._1, p._2)) should contain((1L, 3L))
    pairs.find(p => p._1 == 1L && p._2 == 3L).get._3 should be <= 2L
    // far image and the undecodable payload never pair
    pairs.exists(p => p._1 == 4L || p._2 == 4L) shouldBe false
    pairs.exists(p => p._1 == 5L || p._2 == 5L) shouldBe false
  }

  test("pigeonhole completeness: banded pairs ≡ brute pairs on 60 seeded images") {
    val s = spark
    import s.implicits._
    // 20 groups × 3 variants (base, 1-pixel, 2-pixel perturbations)
    val md = java.security.MessageDigest.getInstance("MD5")
    def basePix(g: Int)(x: Int, y: Int): Int = {
      val d = md.digest(s"spec:$g:${y * 9 + x}".getBytes("UTF-8"))
      d(0) & 0xff
    }
    val rows = (0 until 60).map { i =>
      val g = i / 3
      val r = i % 3
      val img = gray(9, 8) { (x, y) =>
        val v = basePix(g)(x, y)
        if (r > 0 && x == r && y == r) (v + 128) % 256 else v
      }
      (i.toLong, "image", png(img))
    }
    val media = rows.toDF("media_id", "kind", "payload")
    val banded = ImagePhash.dHashNearDups(media, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute ground truth from the same hashes
    val fps = ImagePhash.dHashFrame(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      i <- fps.keys; j <- fps.keys if i < j
      d = java.lang.Long.bitCount(fps(i) ^ fps(j)) if d <= 3
    } yield (i, j, d.toLong)).toSet
    banded shouldBe brute
    brute should not be empty

    // non-dividing maxDist (r9 ADVICE: uneven floor/ceil chunks) — same
    // pigeonhole completeness at maxDist = 4 (five chunks: 13,13,13,13,12
    // bits) and at maxDist = 2 (three chunks: 22,21,21)
    for (md4 <- Seq(2, 4)) {
      val b2 = ImagePhash.dHashNearDups(media, maxDist = md4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val t2 = (for {
        i <- fps.keys; j <- fps.keys if i < j
        d = java.lang.Long.bitCount(fps(i) ^ fps(j)) if d <= md4
      } yield (i, j, d.toLong)).toSet
      b2 shouldBe t2
    }
  }
}
