package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schemas.Tables
import graft.similarity.Ann
import graft.multimodal.Multimodal
import graft.functions.VectorFunctions

/** LLM-pipeline extension queries: ANN tiers and multimodal plumbing.
  * All approximate/engine-native → rows-only driver check + ScalaTest
  * invariants (AnnSpec recall bound, MultimodalSpec shape checks). */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def unitEmb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("id"),
        VectorFunctions.l2normalize(col("embedding")).as("v"))

  /** One persisted IVF index per (session, sf-dir), built lazily and
    * reused — the index build is the amortized cost, queries only pay the
    * pruned scan (the reference's Qdrant collection is exactly this shape:
    * built once by the consumer, queried many times). */
  private val ivfIndexes =
    scala.collection.mutable.Map[(SparkSession, String), (String, DataFrame)]()

  private def ivfIndex(spark: SparkSession, dir: String): (String, DataFrame) =
    ivfIndexes.synchronized {
      ivfIndexes.getOrElseUpdate((spark, dir), {
        val pts = unitEmb(spark, dir)
        val centroids = Ann.kmeansCentroids(pts, "id", "v", nlist = 16, iters = 2)
          .cache()
        centroids.count()
        val path = "/tmp/graft-ivf-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        Ann.writeIvfIndex(pts, "id", "v", centroids, path)
        (path, centroids)
      })
    }

  /** q26 — IVF ANN top-10 for vec 0 THROUGH THE PERSISTED INDEX: the
    * corpus is written `partitionBy(cell)` once, and the query scan reads
    * only the nprobe probed cells' files (PartitionFilters in the scan —
    * asserted in AnnSpec). This is the 100 TB tier: bytes touched scale
    * with nprobe/nlist of the corpus, not the corpus. */
  val q26AnnIvf: Q = (spark, dir) => {
    val pts = unitEmb(spark, dir)
    val qv = pts.filter(col("id") === 0).select(col("v")).first().getSeq[Double](0)
    val qcol = array(qv.map(lit): _*)
    val (path, centroids) = ivfIndex(spark, dir)
    // k+1 then re-limit: the query vector itself lives in the index and is
    // excluded from its own neighbor list
    Ann.ivfTopKFromIndex(spark, path, centroids, "id", "v", qcol,
        k = 11, nprobe = 4)
      .filter(col("id") =!= 0)
      .orderBy(col("score").desc, col("id").asc)
      .limit(10)
      .select(col("id"), round(col("score"), 4).as("score"))
  }

  /** q27 — LSH ANN top-10 for vec 0 (multi-table hyperplane buckets). */
  val q27AnnLsh: Q = (spark, dir) => {
    val pts = unitEmb(spark, dir).cache()
    val qv = pts.filter(col("id") === 0).select(col("v")).first().getSeq[Double](0)
    val qcol = array(qv.map(lit): _*)
    Ann.lshTopK(pts.filter(col("id") =!= 0), "id", "v", qcol, k = 10,
      bits = 6, tables = 8)
      .select(col("id"), round(col("score"), 4).as("score"))
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

  /** q51 — video frame sampling: 1 payload row → N typed frame rows. */
  val q51FrameSample: Q = (spark, dir) => {
    val media = Multimodal.fromDocuments(Tables.load(spark, dir, "documents"))
      .filter(col("kind") === "video")
    Multimodal.sampleFrames(media, frames = 4)
      .select(col("media_id"), col("frame_idx"), length(col("frame_bytes")).as("frame_len"))
  }

  val defs: Map[String, Q] = Map(
    "q26_ann_ivf" -> q26AnnIvf,
    "q27_ann_lsh" -> q27AnnLsh,
    "q50_multimodal_features" -> q50MultimodalFeatures,
    "q51_frame_sample" -> q51FrameSample)

  val oracles: Map[String, String] = Map.empty
}
