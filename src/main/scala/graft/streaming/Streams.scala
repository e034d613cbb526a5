package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import graft.schemas.Entities

/** Structured-Streaming ingest layer (SURVEY.md §2.8 ST1–ST6) — the
  * Spark-native replacement for the reference's Kafka consumer processes
  * (project/neo4j/consumer_user.py, consumer_post.py,
  * project/qdrant/consumer_post.py).
  *
  * Zero-egress build: file-backed streams stand in for Kafka topics
  * (readStream.json(dir) ≡ subscribe; checkpoint dir ≡ consumer group;
  * `Trigger.AvailableNow` ≡ drain-the-topic). The operator semantics —
  * declared-schema decode, tagged-union routing, idempotent keyed upserts —
  * are identical.
  */
object Streams {

  /** ST1/S2 — subscribe to a JSON "topic" directory with a declared schema
    * (no inference in production paths, SURVEY.md §1.4). */
  def subscribe(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(dir)

  /** F5 — tagged-union routing: one topic carries profile records and LIKED
    * events discriminated by `type` (consumer_user.py:79-82). */
  def routeUserStream(stream: DataFrame): (DataFrame, DataFrame) = {
    val likes = stream.filter(col("type") === "LIKED")
      .select(col("user_did"), col("uri"))
    val profiles = stream.filter(col("type").isNull || col("type") =!= "LIKED")
      .select(col("did"), col("handle"), col("display_name"), col("description"))
    (profiles, likes)
  }

  /** F1 — the `clean` coalesce: null/empty → "unknown"
    * (consumer_user.py:39-41). */
  def cleanProfiles(profiles: DataFrame): DataFrame =
    profiles.select(
      col("did"),
      coalesce(nullif(trim(col("handle")), lit("")), lit("unknown")).as("handle"),
      coalesce(nullif(trim(col("display_name")), lit("")), lit("unknown")).as("display_name"))

  /** S5/ST2 — idempotent keyed upsert sink: each micro-batch merges into a
    * parquet "table" keeping the latest record per key (MERGE semantics via
    * union + keep-last dedup; replays converge to the same state). */
  def upsertSink(batches: DataFrame, tablePath: String, keyCol: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    batches.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing =
          try spark.read.parquet(tablePath)
          catch { case _: Exception => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema) }
        val merged = existing.withColumn("__p", lit(0))
          .unionByName(batch.dropDuplicates(keyCol).withColumn("__p", lit(1)))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col(keyCol)).orderBy(col("__p").desc)))
          .filter(col("__rn") === 1).drop("__rn", "__p")
        val tmp = tablePath + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val out = spark.read.parquet(tmp)
        out.write.mode("overwrite").parquet(tablePath)
        ()
      }

  /** S6/F2/X4/X5 — the vector-ingest transform of the reference's Qdrant
    * consumer (project/qdrant/consumer_post.py:67-108): required-field
    * validation (blank text / missing cid dropped), deterministic content
    * id (md5 of cid ≙ uuid5), deterministic embedding. Works identically
    * on batch and streaming DataFrames; pair with [[upsertSink]] keyed on
    * `id` for the idempotent vector-store write. */
  def embedPosts(posts: DataFrame, dim: Int = 64): DataFrame =
    posts
      .filter(length(trim(col("text"))) > 0 && col("cid").isNotNull)
      .select(
        md5(col("cid")).as("id"),
        col("uri"),
        col("text"),
        graft.functions.TextExpressions.embed_text(col("text"), dim).as("embedding"))

  /** SET3/ST4 — streaming dedup with watermarked state (the reference's
    * unbounded `seen_users` set, given a TTL so state can't grow forever —
    * SURVEY.md §7 step 6). */
  def dedupStream(stream: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)
}
