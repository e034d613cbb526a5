package graft.multimodal

import java.io.ByteArrayInputStream

/** Decodes one media payload into a fixed-width feature vector — the seam
  * between the Spark plumbing (schema, batching, partition shape, which
  * never changes) and the modality codec (which does). A real
  * JPEG/audio/video pipeline drops its decoder in here; nothing else in
  * [[Multimodal]] moves.
  */
trait Codec extends Serializable {

  /** Decode + featurize, or None when the payload isn't decodable by this
    * codec (caller falls back to the byte-level stub). */
  def features(payload: Array[Byte], featureDim: Int): Option[Array[Double]]
}

/** Byte-value histogram (L1-normalized) — the deterministic stand-in used
  * when no modality codec applies. Decodes nothing; shaped exactly like a
  * real feature extraction (bytes in, fixed-width doubles out). */
object ByteHistogramCodec extends Codec {
  def features(payload: Array[Byte], featureDim: Int): Option[Array[Double]] = {
    val hist = new Array[Double](featureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) * featureDim / 256) += 1.0
      i += 1
    }
    val total = math.max(1.0, payload.length.toDouble)
    var j = 0
    while (j < featureDim) { hist(j) /= total; j += 1 }
    Some(hist)
  }
}

/** REAL audio decode — pure-JVM `javax.sound.sampled` (WAV/AIFF/AU PCM
  * ship with the JDK, no native libs): features = `featureDim`-bin
  * histogram of the decoded PCM sample values (8/16-bit, any channel
  * count/endianness — every channel's sample counts), L1-normalized over
  * the full sample range. Returns None for payloads the JDK cannot
  * decode, so undecodable rows degrade to the byte-histogram stub instead
  * of failing the batch — the same per-row error containment as
  * [[ImageIoCodec]]. */
object WavCodec extends Codec {

  /** The JDK's AudioFileReader providers, resolved ONCE per JVM: every
    * `AudioSystem.getAudioInputStream` call re-walks the synchronized
    * SPI registry, which serializes concurrent decode tasks — the same
    * contention the r12 RIFF writer removed from the ENCODE half
    * (measured there: 8× threads bought 1.7×). ServiceLoader returns
    * the identical reader set AudioSystem consults (WAVE/AIFF/AU ship in
    * the JDK), so trying them in order reproduces its semantics — each
    * attempt gets a FRESH zero-copy ByteArrayInputStream, which is the
    * position-reset contract providers otherwise mark/reset for. */
  // lazy: one registry walk per executor JVM (objects resolve to the
  // singleton on deserialization, so this never ships in a closure)
  private lazy val readers: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  private def openStream(payload: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
    var i = 0
    while (i < readers.length) {
      try return Some(
        readers(i).getAudioInputStream(new ByteArrayInputStream(payload)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => // next
        case _: java.io.IOException => // malformed for this reader: next
      }
      i += 1
    }
    None
  }

  def features(payload: Array[Byte], featureDim: Int): Option[Array[Double]] =
    try {
      val aisOpt = openStream(payload)
      if (aisOpt.isEmpty) return None
      val ais = aisOpt.get
      try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          (bits != 8 && bits != 16)) None
      else {
        val raw = {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = ais.read(buf) }
          bos.toByteArray
        }
        val hist = new Array[Double](featureDim)
        var count = 0L
        if (bits == 8) {
          var i = 0
          while (i < raw.length) {
            // signed 8-bit sample → [0, 256) → bin
            hist(((raw(i) + 128) * featureDim) / 256) += 1.0
            count += 1; i += 1
          }
        } else {
          val be = fmt.isBigEndian
          var i = 0
          while (i + 1 < raw.length) {
            val s = // signed 16-bit sample, either endianness
              if (be) (raw(i) << 8) | (raw(i + 1) & 0xff)
              else (raw(i + 1) << 8) | (raw(i) & 0xff)
            hist(((s + 32768) * featureDim) / 65536) += 1.0
            count += 1; i += 2
          }
        }
        val total = math.max(1.0, count.toDouble)
        var j = 0
        while (j < featureDim) { hist(j) /= total; j += 1 }
        Some(hist)
      }
      } finally ais.close() // memory-backed today, but a conversion chain
      //       can hold buffers — release per payload, not per GC
    } catch { case _: Exception => None }
}

/** Canonical WAV container for 16-bit mono PCM — the 44-byte RIFF
  * header javax.sound's WAVE writer emits for this format, hand-rolled
  * (r12): `AudioSystem.write` routes every call through the JDK's
  * synchronized SPI provider registry, which serializes concurrent
  * encode tasks (measured on the 10× sweep's q61: 12.5 s at 32 CPUs vs
  * 21.6 s at 4 — 8× threads bought 1.7×). Fixture GENERATION is not the
  * operator under test, so it skips the registry; the DECODE side
  * ([[WavCodec]]) stays on javax.sound — that is the real-codec claim.
  * Byte-for-byte equality with the JDK writer's output is spec-pinned
  * (MultimodalSpec), so every downstream hash is unchanged. */
private[graft] object WavEncode {
  def wavBytes(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44 + pcm.length)
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag("RIFF"); le32(36 + pcm.length); tag("WAVE")
    tag("fmt "); le32(16); le16(1) /* PCM */ ; le16(1) /* mono */
    le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
    tag("data"); le32(pcm.length); out.write(pcm)
    out.toByteArray
  }
}

/** Per-JVM ImageIO configuration: the default stream cache is
  * DISK-backed — every encode/decode call creates and deletes a temp
  * file, which at corpus scale is thousands of filesystem round-trips
  * per task (and measured multi-second jitter on the media queries).
  * In-memory payloads never need it. Initialized once per executor JVM
  * on first codec use. */
private[graft] object ImageIoSettings {
  javax.imageio.ImageIO.setUseCache(false)
  def ensure(): Unit = ()
}

/** Decodes one VIDEO-shaped payload into per-frame feature vectors (one
  * row per frame downstream) — the multi-frame sibling of [[Codec]]. */
trait FrameCodec extends Serializable {
  def frameFeatures(payload: Array[Byte], featureDim: Int): Option[Seq[Array[Double]]]
}

/** REAL multi-frame decode — animated GIF via pure-JVM `javax.imageio`
  * (the GIF reader ships with the JDK and exposes every frame through
  * `getNumImages`/`read(i)`): features = one `featureDim`-bin luminance
  * histogram per frame, L1-normalized. GIF stores indexed color
  * losslessly, so a grayscale synthesis round-trips bit-exactly — the
  * same oracle-ability as [[ImageIoCodec]]'s PNG path, but 1→N. Returns
  * None when the payload isn't a decodable GIF, so undecodable rows
  * degrade instead of failing the batch. */
object GifFramesCodec extends FrameCodec {
  def frameFeatures(payload: Array[Byte], featureDim: Int): Option[Seq[Array[Double]]] =
    try {
      ImageIoSettings.ensure()
      val in = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(payload))
      try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(in)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map { f =>
            val img = reader.read(f)
            val hist = new Array[Double](featureDim)
            val w = img.getWidth
            val h = img.getHeight
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
                  + 114 * (rgb & 0xff)) / 1000
                hist(lum * featureDim / 256) += 1.0
                x += 1
              }
              y += 1
            }
            val total = math.max(1.0, (w.toLong * h).toDouble)
            var j = 0
            while (j < featureDim) { hist(j) /= total; j += 1 }
            hist
          })
        } finally reader.dispose()
      }
      } finally in.close() // with setUseCache(false) this is memory-backed,
      //       but close anyway so a cache/file-backed stream never leaks
    } catch { case _: Exception => None }
}

/** REAL image decode — pure-JVM `javax.imageio` (PNG/BMP/GIF/JPEG ship
  * with the JDK, no native libs): features = `featureDim`-bin luminance
  * histogram over the decoded pixels, L1-normalized. Returns None for
  * payloads ImageIO cannot decode, so undecodable rows degrade to the
  * byte-histogram stub instead of failing the batch — the per-row error
  * containment a 100 TB media scrape needs. */
object ImageIoCodec extends Codec {
  def features(payload: Array[Byte], featureDim: Int): Option[Array[Double]] =
    try {
      ImageIoSettings.ensure()
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val hist = new Array[Double](featureDim)
        val w = img.getWidth
        val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
              + 114 * (rgb & 0xff)) / 1000
            hist(lum * featureDim / 256) += 1.0
            x += 1
          }
          y += 1
        }
        val total = math.max(1.0, (w.toLong * h).toDouble)
        var j = 0
        while (j < featureDim) { hist(j) /= total; j += 1 }
        Some(hist)
      }
    } catch { case _: Exception => None }
}
