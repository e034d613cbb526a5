package graft.dedup

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Checkpointer.CheckpointSyntax

/** Perceptual-hash image near-duplication — the multimodal corpus dedup
  * operator every large-scale media pipeline needs (reference-free: the
  * reference at /root/reference has no image tier; this extends the
  * pipeline family the way q65–q77 extend the text tier).
  *
  * Two classic 64-bit perceptual hashes over a decoded image:
  *
  *  - '''dHash''' — box-downsample luminance to a 9×8 grid (integer box
  *    filter: per-cell pixel sum, floor mean — deterministic on every
  *    JVM, unlike `getScaledInstance`'s unspecified interpolation), then
  *    bit (r,c) = [cell(r,c+1) > cell(r,c)] — 8 comparisons × 8 rows.
  *    Robust to global brightness/contrast shifts (gradients survive
  *    monotone remaps).
  *  - '''aHash''' — 8×8 grid, bit = [cell > floor-mean of all 64 cells].
  *
  * Near-dup pairs use the q35 pigeonhole machinery
  * ([[Dedup.simhashNearDups]]): split the 64-bit hash into maxDist+1
  * chunks — any pair within Hamming distance maxDist agrees EXACTLY on
  * ≥1 chunk (pigeonhole), so an equality join on (chunk_idx, value)
  * finds every qualifying pair with zero false negatives; candidates are
  * verified with exact `bit_count(xor)`. Candidate volume ∝ data +
  * hash-collisions, never all-pairs — the same 100 TB-safe shape as the
  * text tier, and the decode+hash stage is pure map-side.
  */
object ImagePhash {

  private val GridW = 9
  private val GridH = 8

  /** Integer box-filter downsample of decoded luminance to a gw×gh grid
    * (floor mean per cell). Luminance = (299r + 587g + 114b)/1000 in
    * integer arithmetic — for gray pixels this is the gray value exactly,
    * which is what lets a lossless gray fixture put the whole
    * decode→pool→hash path under a SQL oracle (the q60 precedent). */
  private def luminanceGrid(img: java.awt.image.BufferedImage,
      gw: Int, gh: Int): Array[Array[Long]] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = Array.ofDim[Long](gh, gw)
    val counts = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < h) {
      val gy = y.toLong * gh / h
      var x = 0
      while (x < w) {
        val gx = x.toLong * gw / w
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        sums(gy.toInt)(gx.toInt) += lum
        counts(gy.toInt)(gx.toInt) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gh, gw)((r, c) =>
      if (counts(r)(c) == 0) 0L else sums(r)(c) / counts(r)(c))
  }

  /** 64-bit difference hash: bit r·8+c = [cell(r,c+1) > cell(r,c)]. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val cells = luminanceGrid(img, GridW, GridH)
    var bits = 0L
    var r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        if (cells(r)(c + 1) > cells(r)(c)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** 64-bit average hash: bit r·8+c = [cell(r,c) > floor-mean of cells].
    * All-integer (floor mean of 64 longs) — deterministic everywhere. */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val cells = luminanceGrid(img, 8, 8)
    var total = 0L
    var r = 0
    while (r < 8) { var c = 0; while (c < 8) { total += cells(r)(c); c += 1 }; r += 1 }
    val mean = total / 64
    var bits = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r)(c) > mean) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Decode every payload (real `javax.imageio` decode — PNG/BMP/GIF/
    * JPEG) and attach the 64-bit perceptual hash; rows ImageIO cannot
    * decode are DROPPED (an undecodable payload has no perceptual
    * content to compare — the caller still owns the full id set for
    * totality accounting). Map-side only: at 100 TB this stage is a
    * streaming decode with no shuffle. */
  def dHashFrame(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        graft.multimodal.ImageIoSettings.ensure() // no disk-backed cache
        it.flatMap { case (id, payload) =>
          if (payload == null) None
          else
            try {
              val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
              if (img == null) None else Some((id, dHash64(img)))
            } catch { case _: Exception => None }
        }
      }
      .toDF("media_id", "fp")
  }

  /** Image near-dup pairs with Hamming(dHash) ≤ maxDist: real decode →
    * dHash → pigeonhole chunk join → exact bit_count verify. Output
    * (id_a, id_b, dist), canonical id_a < id_b orientation.
    *
    * Any maxDist ∈ [0, 63] is legal (r9, ADVICE fix: the original
    * equal-width split required (maxDist+1) | 64). Pigeonhole needs
    * maxDist+1 chunks, not EQUAL ones: the 64 bits split floor/ceil —
    * the first (64 mod chunks) chunks carry ⌈64/chunks⌉ bits, the rest
    * ⌊64/chunks⌋ — and any pair within Hamming maxDist still agrees
    * exactly on ≥1 chunk. */
  def dHashNearDups(media: DataFrame, maxDist: Int = 3,
      idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    val chunks = maxDist + 1
    require(maxDist >= 0 && maxDist < 64,
      s"maxDist must be in [0, 63], got $maxDist")
    val base = 64 / chunks
    val rem = 64 % chunks
    // checkpoint: the banding self-join reads the hash frame on BOTH
    // sides, and without the cut each side re-runs the full image decode
    // (verified in the r8 plan audit: two complete decode pipelines under
    // the SortMergeJoin). Blocks are owned by the result per the
    // BlockRelease caller-side contract.
    val fp = dHashFrame(media, idCol, payloadCol).cp()
    // chunk c covers bits [c·base + min(c, rem), +width) where width =
    // base + (1 if c < rem). maxDist = 0 (one 64-bit chunk) short-circuits
    // to fp itself — a 64-bit mask can't be built via shiftleft (Java
    // shifts are mod 64).
    val chunkCol =
      if (chunks == 1) col("fp")
      else
        expr(s"shiftrightunsigned(fp, c * $base + least(c, $rem)) & " +
          s"(shiftleft(1L, $base + if(c < $rem, 1, 0)) - 1)")
    val banded = fp.select(col("media_id"), col("fp"),
        explode(sequence(lit(0), lit(chunks - 1))).as("c"))
      .withColumn("chunk", chunkCol)
    banded.as("a").hint("merge").join(banded.as("b").hint("merge"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.fp").as("fa"), col("b.fp").as("fb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
