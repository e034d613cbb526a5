package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
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

  /** ST1/S2 — subscribe to a topic with a declared schema (no inference in
    * production paths, SURVEY.md §1.4). File-backed JSON directory by
    * default; pass `broker` (bootstrap-servers) to consume the same topic
    * from Kafka through the spark-sql-kafka connector — the record value
    * is the same JSON payload, decoded with the same declared schema, and
    * `startingOffsets` carries S3's offset-reset semantics
    * (earliest ≙ the reference's auto_offset_reset, consumer_user.py:25-32).
    * The broker branch is CONFIG-ONLY in this build: the zero-egress
    * container ships neither a broker nor the Kafka connector jar, so the
    * path is shipped but unexercised here — a user with a cluster flips
    * one argument. */
  def subscribe(spark: SparkSession, topic: String, schema: StructType,
      broker: Option[String] = None,
      startingOffsets: String = "earliest"): DataFrame =
    broker match {
      case Some(servers) =>
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", servers)
          .option("subscribe", topic)
          .option("startingOffsets", startingOffsets)
          .load()
          .select(from_json(col("value").cast("string"), schema).as("r"))
          .select(col("r.*"))
      case None => spark.readStream.schema(schema).json(topic)
    }

  /** S1 — produce a stream to a topic as JSON records: file-backed text
    * directory by default; with `broker`, the identical payload goes to a
    * Kafka topic (`value` = the JSON). Same config-only caveat as
    * [[subscribe]]'s broker branch. */
  def publishSink(stream: DataFrame, topic: String, checkpoint: String,
      broker: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] = {
    val payload = stream
      .select(to_json(struct(stream.columns.map(col): _*)).as("value"))
    val w = broker match {
      case Some(servers) => payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
      case None => payload.writeStream.format("text").option("path", topic)
    }
    w.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
  }

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

  /** The MERGE step of [[upsertSink]], batch-callable (and composable: one
    * foreachBatch can merge several derived tables from a single topic —
    * the EP1 fan-out): union existing state with the batch, keep the
    * latest record per key, swap the new state in with a directory rename
    * (one write per merge; the earlier write-tmp → read-tmp → rewrite
    * cycle doubled every micro-batch's IO). */
  def mergeUpsert(batch: DataFrame, tablePath: String, keyCol: String): Unit = {
    val spark = batch.sparkSession
    // only a genuinely missing table reads as empty; any OTHER read
    // failure (FS hiccup, corrupt footer, concurrent writer) must
    // rethrow so the micro-batch fails and retries — silently
    // substituting empty would discard all previously upserted state
    // on the next overwrite while the checkpoint marks the batch done
    val tableDir = new org.apache.hadoop.fs.Path(tablePath)
    val oldDir = new org.apache.hadoop.fs.Path(tablePath + "__old")
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crash between the two swap renames below leaves the state staged
    // at __old with the live dir missing — restore it BEFORE the
    // missing-table test, or the replayed batch would read 'no table' and
    // silently discard all previously upserted state
    if (!fs.exists(tableDir) && fs.exists(oldDir) && !fs.rename(oldDir, tableDir))
      throw new java.io.IOException(s"cannot restore staged state $oldDir")
    val existing =
      if (fs.exists(tableDir)) spark.read.parquet(tablePath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    val merged = existing.withColumn("__p", lit(0))
      .unionByName(batch.dropDuplicates(keyCol).withColumn("__p", lit(1)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol)).orderBy(col("__p").desc)))
      .filter(col("__rn") === 1).drop("__rn", "__p")
    val tmp = new org.apache.hadoop.fs.Path(tablePath + "__tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap via rename with a staged backup: at every crash point either
    // the live dir or __old holds the pre-merge state, and a failed
    // rename OR delete throws so the micro-batch retries instead of
    // committing — renaming onto a surviving __old would nest the staged
    // state one level down, where the restore path could not find it
    if (fs.exists(oldDir) && !fs.delete(oldDir, true))
      throw new java.io.IOException(s"cannot clear stale $oldDir")
    if (fs.exists(tableDir) && !fs.rename(tableDir, oldDir))
      throw new java.io.IOException(s"cannot stage $tableDir for swap")
    if (!fs.rename(tmp, tableDir)) {
      fs.rename(oldDir, tableDir) // best-effort restore
      throw new java.io.IOException(s"state swap failed for $tableDir")
    }
    if (fs.exists(oldDir) && !fs.delete(oldDir, true))
      throw new java.io.IOException(s"cannot clear staged $oldDir after swap")
    ()
  }

  /** S5/ST2 — idempotent keyed upsert sink: each micro-batch merges into a
    * parquet "table" keeping the latest record per key (MERGE semantics via
    * union + keep-last dedup; replays converge to the same state). */
  def upsertSink(batches: DataFrame, tablePath: String, keyCol: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    batches.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeUpsert(batch, tablePath, keyCol)
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

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, end: Long, n: Int)
  case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Int)

  /** ST4 beyond dedup — custom keyed state via flatMapGroupsWithState:
    * event-time sessionization with a gap timeout. One session row is
    * emitted when a user's gap exceeds `gapMs`, OR when the event-time
    * timeout fires (watermark passed session end + gap) — so the trailing
    * session of a quiet user IS emitted and its state evicted, never held
    * forever. State is one (start, end, count) triple per active user —
    * bounded by construction, evicted by timeout. */
  def sessionizeStream(events: Dataset[SessionEvent], gapMs: Long = 1800000L,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the session can never grow again
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start * 1000, s.end * 1000, s.n))
          } else {
            val sorted = it.map(_.ts.getTime).toSeq.sorted
            var out = List.empty[SessionOut]
            var st = state.getOption
            sorted.foreach { t =>
              st match {
                case Some(s) if t - s.end <= gapMs =>
                  st = Some(s.copy(end = t, n = s.n + 1))
                case Some(s) =>
                  out ::= SessionOut(user, s.start * 1000, s.end * 1000, s.n)
                  st = Some(SessionState(t, t, 1))
                case None =>
                  st = Some(SessionState(t, t, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              // timeout ts must stay ahead of the current watermark
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.reverseIterator
          }
      }
  }

  /** SET3/ST4 — streaming dedup with watermarked state (the reference's
    * unbounded `seen_users` set, given a TTL so state can't grow forever —
    * SURVEY.md §7 step 6). KEYED dedup: duplicates of a key arriving at
    * different timestamps are still duplicates (the reference's seen-set
    * semantics); state for a key is dropped once the watermark passes it. */
  def dedupStream(stream: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
