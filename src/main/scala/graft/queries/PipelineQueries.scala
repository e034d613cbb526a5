package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schemas.Tables
import graft.similarity.Ann
import graft.multimodal.Multimodal
import graft.functions.VectorFunctions
import graft.util.Checkpointer.CheckpointSyntax

/** LLM-pipeline extension queries: ANN tiers and multimodal plumbing.
  * The multimodal queries carry full hash oracles; the ANN tiers carry
  * the [[PipelineQueries.annSurface]] invariant oracle (ids stay
  * spec-checked in AnnSpec — approximate search is id-nondeterministic
  * across candidate configs by nature). */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def unitEmb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("id"),
        VectorFunctions.l2normalize(col("embedding")).as("v"))

  /** One persisted IVF index per (session, sf-dir), built lazily and
    * reused — the index build is the amortized cost, queries only pay the
    * pruned scan (the reference's Qdrant collection is exactly this shape:
    * built once by the consumer, queried many times). LRU-bounded: an
    * evicted entry unpersists its centroids (the parquet index on disk is
    * simply overwritten by any rebuild). */
  private val ivfIndexes =
    new graft.util.BoundedSessionCache[(SparkSession, String), (String, DataFrame, Int)](
      maxEntries = 8, { case (_, c, _) => c.unpersist(blocking = false) })

  private def ivfIndex(spark: SparkSession, dir: String): (String, DataFrame, Int) =
    ivfIndexes.getOrElseUpdate((spark, dir), {
      val pts = unitEmb(spark, dir)
      // production cell sizing — the q79/q86 [[graft.dedup.SemDedup
      // .nlistBits]] rule (r12): cells grow ∝ corpus so a probe reads
      // O(target) rows per cell at ANY scale. nlist was a fixed 16 —
      // a fixture constant of exactly the class the r9 q79 fix purged
      // (at 100 TB, 16 cells means every query scans 1/4 of the corpus).
      // At the oracle SFs the rule lands on 16, so the oracle sees
      // nothing new; the 10× sweep (20k vectors) lands on 64.
      val nlist = 1 << graft.dedup.SemDedup.nlistBits(pts.count())
      val centroids = Ann.kmeansCentroids(pts, "id", "v", nlist = nlist, iters = 2)
        .cache()
      centroids.count()
      val path = "/tmp/graft-ivf-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      Ann.writeIvfIndex(pts, "id", "v", centroids, path)
      (path, centroids, nlist)
    })

  /** ANN surface (the q44/q48 precedent applied to approximate search):
    * WHICH ids an ANN tier returns is approximation-dependent (ids and
    * scores stay spec-checked in AnnSpec), but four facts about the
    * result are engine-checkable and pinned as constants by the oracle:
    *   - exactly k ranked rows (`rank` 1..k — a short result is a row
    *     mismatch);
    *   - `score_is_metric`: each returned score equals the exact cosine
    *     between the query vector and the CLAIMED id's CURRENT table
    *     embedding — index↔table consistency (a stale or corrupted
    *     index score fails the pin);
    *   - `sorted_desc`: scores are non-increasing in rank order;
    *   - `recall_ge_half`: ≥ k/2 of the exact brute-force top-k ids are
    *     present — AnnSpec's recall bound, now under the driver's hash
    *     gate (the brute top-k is one cheap full scan at oracle SF).
    */
  private def annSurface(pts: DataFrame, res0: DataFrame, qcol: Column,
      k: Int, metric: (Column, Column) => Column): DataFrame = {
    // the re-derived score uses the SAME metric expression as the tier
    // under test (q26 scores raw dot on unit vectors, q27 divides by the
    // ≈1±ulp norms) — bit-equality after the shared round(…, 4)
    val exactScore = round(metric(col("v"), qcol), 4)
    // the surface embeds the ANN result in TWO branches (overlap
    // aggregate + consistency join); without a stage the whole search
    // (index read / bucket self-join) would execute twice per action —
    // k rows, released by the caller contract as a result-plan leaf
    val res = res0.cp()
    val brute = pts.filter(col("id") =!= 0)
      .select(col("id"), VectorFunctions.dot(col("v"), qcol).as("bs"))
      .orderBy(col("bs").desc, col("id").asc).limit(k).select(col("id"))
    val overlap = broadcast(res.join(brute, "id")
      .agg(count(lit(1)).as("ov")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id").asc)
    res.join(pts.select(col("id"), col("v")), "id")
      .withColumn("rank", row_number().over(w))
      .withColumn("prev", lag(col("score"), 1).over(w))
      .crossJoin(overlap)
      .select(col("rank").cast("long").as("rank"),
        (col("score") === exactScore).as("score_is_metric"),
        (col("prev").isNull || col("score") <= col("prev")).as("sorted_desc"),
        (col("ov") >= k / 2).as("recall_ge_half"))
  }

  /** q26 — IVF ANN top-10 for vec 0 THROUGH THE PERSISTED INDEX: the
    * corpus is written `partitionBy(cell)` once, and the query scan reads
    * only the nprobe probed cells' files (PartitionFilters in the scan —
    * asserted in AnnSpec). This is the 100 TB tier: bytes touched scale
    * with nprobe/nlist of the corpus, not the corpus. Surfaced through
    * [[annSurface]] (rank + pinned invariants under the hash oracle). */
  /** q26's raw (id, score) top-10 BEFORE the surface — factored out so
    * AnnSpec can assert the partition-pruned plan (the surface stage
    * checkpoints, which hides the scan from the final explain). */
  private[graft] def q26Raw(spark: SparkSession, dir: String,
      qcol: Column): DataFrame = {
    val (path, centroids, nlist) = ivfIndex(spark, dir)
    // k+1 then re-limit: the query vector itself lives in the index and is
    // excluded from its own neighbor list. nprobe tracks nlist at a
    // constant 1/4 fraction (recall-conservative; the per-workload
    // recall knob) — 4/16 at the oracle SFs, unchanged there.
    Ann.ivfTopKFromIndex(spark, path, centroids, "id", "v", qcol,
        k = 11, nprobe = math.max(4, nlist / 4))
      .filter(col("id") =!= 0)
      .orderBy(col("score").desc, col("id").asc)
      .limit(10)
      .select(col("id"), round(col("score"), 4).as("score"))
  }

  private[graft] def queryVec(spark: SparkSession, dir: String): Column = {
    val pts = unitEmb(spark, dir)
    array(pts.filter(col("id") === 0).select(col("v"))
      .first().getSeq[Double](0).map(lit): _*)
  }

  val q26AnnIvf: Q = (spark, dir) => {
    val pts = unitEmb(spark, dir)
    val qcol = queryVec(spark, dir)
    annSurface(pts, q26Raw(spark, dir, qcol), qcol, k = 10, VectorFunctions.dot)
  }

  /** q27 — LSH ANN top-10 for vec 0 (multi-table hyperplane buckets).
    * No per-call cache: the corpus is read twice (query-vector probe +
    * bucket join) but a parquet re-scan is cheaper than stacking a cached
    * copy of the embeddings per invocation in long sessions. Surfaced
    * through [[annSurface]] like q26. */
  val q27AnnLsh: Q = (spark, dir) => {
    val pts = unitEmb(spark, dir)
    val qv = pts.filter(col("id") === 0).select(col("v")).first().getSeq[Double](0)
    val qcol = array(qv.map(lit): _*)
    // bits=4 × tables=6 × 3 query-side probes ≈ the recall of the classic
    // bits=4 × tables=16 config (r6) at 2.7× fewer INDEX rows — the part
    // that is corpus-sized. The testdata embeddings are STRUCTURELESS
    // random vectors (top-10 cosines sit barely above the bulk), the worst
    // case for LSH; the surface's recall_ge_half pin holds on this hardest
    // shape at sf0.001/0.01/0.1 (measured r7), as it did for the classic
    // config it replaces.
    val res = Ann.lshTopK(pts.filter(col("id") =!= 0), "id", "v", qcol, k = 10,
        bits = 4, tables = 6, dim = qv.length, probes = 3)
      .select(col("id"), round(col("score"), 4).as("score"))
    annSurface(pts, res, qcol, k = 10, VectorFunctions.cosineUnguarded)
  }

  /** q50 — multimodal feature extraction: binary payloads → batched
    * feature vectors (stubbed decode, real plumbing) → per-kind stats. */
  val q50MultimodalFeatures: Q = (spark, dir) => {
    val media = Multimodal.fromDocuments(Tables.load(spark, dir, "documents"))
    Multimodal.extractFeatures(media)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        round(avg(VectorFunctions.l2norm(col("features"))), 4).as("avg_feat_norm"))
      .orderBy(col("kind"))
  }

  /** q51 — video frame sampling: 1 payload row → N typed frame rows. The
    * output surface decodes the sliced bytes back to text (the payloads
    * are UTF-8 stand-ins) so the byte-exact slicing is DuckDB-oracled; the
    * operator itself (binary substring + 1→N explode) runs on BinaryType. */
  val q51FrameSample: Q = (spark, dir) => {
    val media = Multimodal.fromDocuments(Tables.load(spark, dir, "documents"))
      .filter(col("kind") === "video")
    Multimodal.sampleFrames(media, frames = 4)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame_bytes")).cast("long").as("n_frame_bytes"),
        decode(col("frame_bytes"), "UTF-8").as("frame_text"))
  }

  /** q60 — REAL image decode under the oracle: deterministic 16×16 gray
    * PNGs (pixel v = (id·31 + k²) mod 256) are ENCODED with javax.imageio,
    * then DECODED back through [[graft.multimodal.ImageIoCodec]] and
    * binned into a luminance histogram. Gray pixels make luminance = v
    * exactly (integer (299+587+114)/1000), so DuckDB reproduces the
    * histogram from the pixel formula alone — the PNG encode→decode round
    * trip and the codec's pixel walk are hash-verified end-to-end. */
  val q60ImageFeatures: Q = (spark, dir) => {
    import spark.implicits._
    val ids = Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      graft.multimodal.ImageIoSettings.ensure() // no disk-backed stream cache
      it.map { d =>
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var k = 0
        while (k < 256) {
          val v = ((d * 31 + k.toLong * k) % 256).toInt
          img.setRGB(k % 16, k / 16, (v << 16) | (v << 8) | v)
          k += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (d, "image", bos.toByteArray)
      }
    }.toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 16, 'height', 16, 'duration_ms', 0L, 'codec', 'png')"))
    Multimodal.extractFeatures(media, featureDim = 16,
        codecs = Map("image" -> graft.multimodal.ImageIoCodec))
      .select(col("media_id"), posexplode(col("features")).as(Seq("bin", "share")))
      .select(col("media_id"), col("bin").cast("long").as("bin"),
        round(col("share"), 6).as("share"))
  }

  /** q61 — REAL audio decode under the oracle (the WAV twin of q60):
    * deterministic 16-bit mono PCM clips (sample s_k = ((id·31 + k²) mod
    * 65536) − 32768, 256 samples) are ENCODED to WAV with
    * javax.sound.sampled, then DECODED back through
    * [[graft.multimodal.WavCodec]] and binned into a sample-value
    * histogram. WAV stores 16-bit PCM losslessly, so DuckDB reproduces
    * the histogram from the sample formula alone — the WAV encode→decode
    * round trip and the codec's sample walk are hash-verified
    * end-to-end. */
  val q61AudioFeatures: Q = (spark, dir) => {
    import spark.implicits._
    val ids = Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      it.map { d =>
        val pcm = new Array[Byte](512)
        var k = 0
        while (k < 256) {
          val s = (((d * 31 + k.toLong * k) % 65536) - 32768).toInt
          pcm(2 * k) = (s & 0xff).toByte        // little-endian 16-bit
          pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
          k += 1
        }
        // hand-rolled canonical container (spec-pinned byte-equal to the
        // AudioSystem.write output) — the JDK writer's synchronized SPI
        // lookup serialized concurrent encode tasks (see WavEncode doc)
        (d, "audio", graft.multimodal.WavEncode.wavBytes(pcm, 8000))
      }
    }.toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 0, 'height', 0, 'duration_ms', 32L, 'codec', 'wav')"))
    Multimodal.extractFeatures(media, featureDim = 16,
        codecs = Map("audio" -> graft.multimodal.WavCodec))
      .select(col("media_id"), posexplode(col("features")).as(Seq("bin", "share")))
      .select(col("media_id"), col("bin").cast("long").as("bin"),
        round(col("share"), 6).as("share"))
  }

  /** q62 — REAL video-shaped frame sampling under the oracle (the
    * multi-frame sibling of q60/q61): deterministic 4-frame 8×8 animated
    * GIFs (frame f pixel k = (id·31 + f·97 + k²) mod 256, drawn into an
    * explicit 256-gray indexed palette so GIF's lossless indexed encoding
    * round-trips bit-exactly) are ENCODED with the JDK GIF writer, then
    * DECODED frame-by-frame through [[graft.multimodal.GifFramesCodec]]
    * into per-frame luminance histograms — the 1→N frame-sample operator
    * with a real codec, hash-verified end-to-end. */
  val q62GifFrames: Q = (spark, dir) => {
    import spark.implicits._
    val ids = Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      graft.multimodal.ImageIoSettings.ensure() // no disk-backed stream cache
      val cmap = Array.tabulate(256)(g => (0xff << 24) | (g << 16) | (g << 8) | g)
      val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
        java.awt.image.DataBuffer.TYPE_BYTE)
      // one writer per partition (the per-batch setup slot extractFeatures
      // documents): writer lookup + instantiation per payload measurably
      // dominates at corpus scale
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val rows = it.map { d =>
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < 4) {
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          var k = 0
          while (k < 64) {
            val v = ((d * 31 + f * 97 + k.toLong * k) % 256).toInt
            img.getRaster.setSample(k % 8, k / 8, 0, v)
            k += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        (d, "video", bos.toByteArray)
      }
      // dispose the per-partition writer once the iterator drains (it
      // holds native-ish ImageIO state; per-GC release is too late)
      new Iterator[(Long, String, Array[Byte])] {
        private var disposed = false
        def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h && !disposed) { disposed = true; writer.dispose() }
          h
        }
        def next(): (Long, String, Array[Byte]) = rows.next()
      }
    }.toDF("media_id", "kind", "payload")
      .withColumn("meta", expr(
        "named_struct('width', 8, 'height', 8, 'duration_ms', 400L, 'codec', 'gif')"))
    Multimodal.extractFrameFeatures(media, featureDim = 16,
        codecs = Map("video" -> graft.multimodal.GifFramesCodec))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        posexplode(col("features")).as(Seq("bin", "share")))
      .select(col("media_id"), col("frame_idx"), col("bin").cast("long").as("bin"),
        round(col("share"), 6).as("share"))
  }

  /** q78 — PERCEPTUAL-HASH IMAGE NEAR-DUP (the multimodal corpus dedup
    * operator: dHash over real decoded pixels, pigeonhole-banded Hamming
    * pairs — [[graft.dedup.ImagePhash]]). Fixture = deterministic 9×8
    * gray PNGs with PLANTED near-dup groups: group g = doc_id/4, pixel k
    * = first byte of md5("g:k") (the repo's md5-twin discipline — a
    * structured integer formula measured 38k spurious cross-group pairs
    * at sf0.1 because quadratic-mod-256 sequences give the 64-bit hash
    * far less than 64 bits of entropy; md5 pixels make cross-group
    * Hamming ~Binomial(64,½), P(≤3) ≈ 9e-15), and doc_id%4 = r > 0
    * perturbs single pixel 10r by +128 — flipping ≤2 dHash bits, so
    * same-group images are near-dups by construction. Gray PNG is
    * lossless and gray luminance = the gray value exactly, so DuckDB
    * re-derives the ENTIRE path — pixel → dHash bits → pigeonhole chunk
    * join (exact by pigeonhole, not probabilistic) → bit_count verify —
    * from the formula alone, hash-verifying the real encode→decode→pool→
    * hash pipeline end-to-end (the q60 precedent, extended from features
    * to a full dedup operator). Measured at sf0.1: 7,257 pairs, 100%
    * intra-group, 10.5k candidates from 12.5M possible pairs. */
  val q78ImagePhash: Q = (spark, dir) => {
    import spark.implicits._
    val ids = Tables.load(spark, dir, "documents").select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      graft.multimodal.ImageIoSettings.ensure() // no disk-backed stream cache
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { d =>
        val g = d / 4
        val r = (d % 4).toInt
        val img = new java.awt.image.BufferedImage(9, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var k = 0
        while (k < 72) {
          val digest = md.digest(s"$g:$k".getBytes("UTF-8"))
          var v = digest(0) & 0xff
          if (r > 0 && k == 10 * r) v = (v + 128) % 256
          img.setRGB(k % 9, k / 9, (v << 16) | (v << 8) | v)
          k += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (d, "image", bos.toByteArray)
      }
    }.toDF("media_id", "kind", "payload")
    graft.dedup.ImagePhash.dHashNearDups(media, maxDist = 3)
  }

  val defs: Map[String, Q] = Map(
    "q26_ann_ivf" -> q26AnnIvf,
    "q27_ann_lsh" -> q27AnnLsh,
    "q50_multimodal_features" -> q50MultimodalFeatures,
    "q51_frame_sample" -> q51FrameSample,
    "q60_image_features" -> q60ImageFeatures,
    "q61_audio_features" -> q61AudioFeatures,
    "q62_gif_frames" -> q62GifFrames,
    "q78_image_phash" -> q78ImagePhash)

  /** q50/q51 are deterministic byte arithmetic over ASCII stand-in
    * payloads (octet_length == length across the testdata), so the byte
    * histogram and frame slicing are expressible as DuckDB string math —
    * the stub-decode plumbing gets a full hash oracle, not a rows-only
    * check. floor() is explicit where Spark's double→int cast truncates
    * (DuckDB's rounds). */
  val oracles: Map[String, String] = Map(
    // q26/q27 — the ANN SURFACE oracle (see annSurface's scaladoc):
    // exactly k ranked rows with the index-consistency, ordering and
    // recall invariants computed BY the engine from its own result and
    // pinned true — a short result, stale index score, disorder or
    // sub-half recall all hash-mismatch. The ids themselves are
    // approximation-dependent and stay spec-checked in AnnSpec.
    "q26_ann_ivf" ->
      """SELECT (i + 1)::BIGINT AS rank, true AS score_is_metric,
        |  true AS sorted_desc, true AS recall_ge_half
        |FROM (SELECT unnest(range(0, 10)) AS i)""".stripMargin,
    "q27_ann_lsh" ->
      """SELECT (i + 1)::BIGINT AS rank, true AS score_is_metric,
        |  true AS sorted_desc, true AS recall_ge_half
        |FROM (SELECT unnest(range(0, 10)) AS i)""".stripMargin,
    "q50_multimodal_features" ->
      """WITH m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  text, length(text) AS n_bytes FROM documents),
        |u AS (SELECT doc_id, kind, n_bytes,
        |  unnest(list_transform(range(1, n_bytes + 1),
        |    i -> ord(substring(text, i::INT, 1)) // 16)) AS bin FROM m),
        |h AS (SELECT doc_id, kind, n_bytes, bin, count(*) AS c
        |  FROM u GROUP BY ALL),
        |nrm AS (SELECT doc_id, kind, n_bytes,
        |  sqrt(sum((c::DOUBLE / greatest(n_bytes, 1)) ^ 2)) AS fnorm
        |  FROM h GROUP BY doc_id, kind, n_bytes)
        |SELECT kind, count(*) AS n, round(avg(n_bytes), 2) AS avg_bytes,
        |  round(avg(fnorm), 4) AS avg_feat_norm
        |FROM nrm GROUP BY kind ORDER BY kind""".stripMargin,
    "q51_frame_sample" ->
      """WITH v AS (SELECT doc_id AS media_id, text, length(text) AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id, unnest(range(0, 4)) AS frame_idx, text, n FROM v),
        |s AS (SELECT media_id, frame_idx,
        |  substring(text, cast(floor(frame_idx * n / 4) AS INT) + 1,
        |    cast(floor(n / 4) AS INT)) AS frame_text FROM f)
        |SELECT media_id, frame_idx, length(frame_text)::BIGINT AS n_frame_bytes,
        |  frame_text FROM s""".stripMargin,
    "q60_image_features" ->
      """WITH px AS (SELECT doc_id AS media_id, unnest(range(0, 256)) AS k
        |  FROM documents),
        |v AS (SELECT media_id, ((media_id * 31 + k * k) % 256) // 16 AS bin
        |  FROM px),
        |h AS (SELECT media_id, bin, count(*) AS c FROM v GROUP BY 1, 2),
        |g AS (SELECT doc_id AS media_id, unnest(range(0, 16)) AS bin
        |  FROM documents)
        |SELECT g.media_id, g.bin,
        |  round(coalesce(h.c, 0)::DOUBLE / 256, 6) AS share
        |FROM g LEFT JOIN h ON g.media_id = h.media_id AND g.bin = h.bin""".stripMargin,
    "q61_audio_features" ->
      """WITH sm AS (SELECT doc_id AS media_id, unnest(range(0, 256)) AS k
        |  FROM documents),
        |v AS (SELECT media_id, ((media_id * 31 + k * k) % 65536) // 4096 AS bin
        |  FROM sm),
        |h AS (SELECT media_id, bin, count(*) AS c FROM v GROUP BY 1, 2),
        |g AS (SELECT doc_id AS media_id, unnest(range(0, 16)) AS bin
        |  FROM documents)
        |SELECT g.media_id, g.bin,
        |  round(coalesce(h.c, 0)::DOUBLE / 256, 6) AS share
        |FROM g LEFT JOIN h ON g.media_id = h.media_id AND g.bin = h.bin""".stripMargin,
    "q62_gif_frames" ->
      """WITH px AS (SELECT doc_id AS media_id,
        |    unnest(range(0, 4)) AS frame_idx FROM documents),
        |pk AS (SELECT media_id, frame_idx, unnest(range(0, 64)) AS k FROM px),
        |v AS (SELECT media_id, frame_idx,
        |    ((media_id * 31 + frame_idx * 97 + k * k) % 256) // 16 AS bin
        |  FROM pk),
        |h AS (SELECT media_id, frame_idx, bin, count(*) AS c
        |  FROM v GROUP BY 1, 2, 3),
        |g AS (SELECT media_id, frame_idx, unnest(range(0, 16)) AS bin FROM px)
        |SELECT g.media_id, g.frame_idx, g.bin,
        |  round(coalesce(h.c, 0)::DOUBLE / 64, 6) AS share
        |FROM g LEFT JOIN h ON g.media_id = h.media_id
        |  AND g.frame_idx = h.frame_idx AND g.bin = h.bin""".stripMargin,
    // q78 — the whole dHash near-dup path re-derived from the pixel
    // formula: md5 pixel bytes (engine-identical), dHash bits from
    // adjacent-pixel comparisons, fp in two 32-bit words (the q35-md5
    // signed-shift discipline), the SAME pigeonhole chunk join (exact,
    // not probabilistic — any pair at Hamming ≤ 3 shares ≥1 of 4 16-bit
    // chunks), bit_count(xor) verify. The engine's PNG encode→ImageIO
    // decode→box-pool→hash must land on these exact pairs to hash-match.
    "q78_image_phash" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |px AS (SELECT id, unnest(range(0, 72)) AS k FROM ids),
        |v AS (SELECT id, k,
        |    CASE WHEN id % 4 > 0 AND k = 10 * (id % 4)
        |      THEN (('0x' || substr(md5((id // 4)::VARCHAR || ':' || k::VARCHAR), 1, 2))::BIGINT + 128) % 256
        |      ELSE ('0x' || substr(md5((id // 4)::VARCHAR || ':' || k::VARCHAR), 1, 2))::BIGINT
        |    END AS val
        |  FROM px),
        |b AS (SELECT a.id, ((a.k // 9) * 8 + (a.k % 9)) AS bit
        |  FROM v a JOIN v nb ON a.id = nb.id AND nb.k = a.k + 1
        |  WHERE a.k % 9 < 8 AND nb.val > a.val),
        |fp AS (SELECT ids.id,
        |    coalesce(sum(CASE WHEN b.bit < 32 THEN (1::BIGINT << b.bit) ELSE 0 END), 0)::BIGINT AS lo,
        |    coalesce(sum(CASE WHEN b.bit >= 32 THEN (1::BIGINT << (b.bit - 32)) ELSE 0 END), 0)::BIGINT AS hi
        |  FROM ids LEFT JOIN b ON ids.id = b.id GROUP BY ids.id),
        |ch AS (SELECT id, lo, hi, unnest(range(0, 4)) AS c FROM fp),
        |ch2 AS (SELECT id, lo, hi, c,
        |    CASE WHEN c < 2 THEN (lo >> (c * 16)) & 65535
        |         ELSE (hi >> ((c - 2) * 16)) & 65535 END AS chunk FROM ch),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.lo AS la, a.hi AS ha, b.lo AS lb, b.hi AS hb
        |  FROM ch2 a JOIN ch2 b ON a.c = b.c AND a.chunk = b.chunk AND a.id < b.id)
        |SELECT id_a, id_b,
        |  (bit_count(xor(la, lb)) + bit_count(xor(ha, hb)))::BIGINT AS dist
        |FROM cand
        |WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3""".stripMargin)
}
