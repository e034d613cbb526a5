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

  /** q26 — IVF ANN top-10 for vec 0: kmeans cells + nprobe=4 of 16. */
  val q26AnnIvf: Q = (spark, dir) => {
    val pts = unitEmb(spark, dir).cache()
    val qv = pts.filter(col("id") === 0).select(col("v")).first().getSeq[Double](0)
    val qcol = array(qv.map(lit): _*)
    val centroids = Ann.kmeansCentroids(pts, "id", "v", nlist = 16, iters = 2)
    val assigned = Ann.ivfAssign(pts.filter(col("id") =!= 0), "id", "v", centroids)
    Ann.ivfTopK(assigned, centroids, "id", "v", qcol, k = 10, nprobe = 4)
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
