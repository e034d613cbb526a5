package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.TextExpressions.embed_text
import graft.functions.VectorFunctions
import graft.graph.{Louvain, Projection}
import graft.metrics.CommunityMetrics
import graft.schemas.Entities
import graft.streaming.Streams
import graft.warehouse.Scd2

/** End-to-end reference-shaped run (SURVEY.md §5.6 / EP1→EP2): stream
  * ingest of users/posts/engagements → idempotent vertex/vector stores →
  * co-engagement projection → Louvain communities → SCD-2 membership
  * write → per-community metrics table. Asserts the warehouse shapes and
  * metric invariants the reference's pipeline produces
  * (project/main.py → community_detection.py → metrics_interface.py). */
class PipelineE2ESpec extends SparkSpec with Matchers {

  private def writeTopic(records: Seq[String]): String = {
    val dir = Files.createTempDirectory("e2e_topic").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "batch0.json"))
    records.foreach(w.println)
    w.close()
    dir.getAbsolutePath
  }

  test("EP1→EP2: ingest → graph → communities → SCD-2 membership → metrics") {
    val s = spark
    import s.implicits._

    // --- EP1: one users-topic (tagged union) + one posts-topic ---
    // two engagement clusters: users a,b,c co-like posts p1/p2; x,y co-like p3/p4;
    // bridge: c also likes p3
    val userTopic = writeTopic(
      Seq("a", "b", "c", "x", "y").map(u =>
        s"""{"did":"$u","handle":"$u-h","display_name":null,"description":""}""") ++
        Seq(("a", "p1"), ("b", "p1"), ("c", "p1"), ("a", "p2"), ("b", "p2"), ("c", "p2"),
          ("x", "p3"), ("y", "p3"), ("x", "p4"), ("y", "p4"), ("c", "p3"))
          .map { case (u, p) => s"""{"user_did":"$u","uri":"$p","type":"LIKED"}""" })
    val postTopic = writeTopic(Seq(
      """{"uri":"p1","cid":"c1","text":"alpha beta gamma topic one","author":"a"}""",
      """{"uri":"p2","cid":"c2","text":"alpha beta gamma topic one bis","author":"b"}""",
      """{"uri":"p3","cid":"c3","text":"delta epsilon zeta other topic","author":"x"}""",
      """{"uri":"p4","cid":"c4","text":"delta epsilon zeta other topic bis","author":"y"}"""))

    val base = Files.createTempDirectory("e2e_store").toFile.getAbsolutePath
    val (profiles, likes) = Streams.routeUserStream(
      Streams.subscribe(spark, userTopic, Entities.userStreamSchema))
    Streams.upsertSink(Streams.cleanProfiles(profiles), s"$base/users", "did",
      s"$base/cp_users").start().awaitTermination()
    val likesQ = likes.writeStream.format("parquet")
      .option("path", s"$base/likes").option("checkpointLocation", s"$base/cp_likes")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    likesQ.awaitTermination()
    Streams.upsertSink(
      Streams.embedPosts(Streams.subscribe(spark, postTopic, Entities.postStreamSchema), dim = 16),
      s"$base/vectors", "id", s"$base/cp_vectors").start().awaitTermination()

    // vertex store: cleaned, keyed, "unknown"-coalesced
    val users = spark.read.parquet(s"$base/users")
    users.count() shouldBe 5
    users.filter(col("display_name") === "unknown").count() shouldBe 5

    // vector store: one unit vector per post
    val vectors = spark.read.parquet(s"$base/vectors")
    vectors.count() shouldBe 4

    // --- EP2 step 1: co-engagement projection (J1/G8) ---
    val eng = spark.read.parquet(s"$base/likes")
      .select(xxhash64(col("user_did")).as("uid"), col("user_did"), col("uri"))
    val idMap = eng.select(col("uid").as("node"), col("user_did")).distinct()
    val edges = Projection.coEngagement(eng, "uid", "uri").cache()
    edges.count() should be >= 4L // intra-cluster pairs + the c–x/c–y bridge pairs

    // --- EP2 step 2: communities (G6) ---
    val comm = Louvain.run(edges)
    comm.count() shouldBe 5 // every engaged user labeled exactly once
    val byUser = comm.join(idMap, "node")
      .select(col("user_did"), col("label")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byUser("a") shouldBe byUser("b") // the tight trio stays together
    byUser("x") shouldBe byUser("y")

    // --- EP2 step 3: SCD-2 membership write (M1) ---
    val t0 = lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val empty = Seq.empty[(String, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .toDF("community_id", "member_id", "valid_from", "valid_to")
    val membership = Scd2.scd2Merge(empty,
      comm.join(idMap, "node")
        .select(concat(lit("comm-"), col("label")).as("community_id"),
          col("user_did").as("member_id")),
      "member_id", t0)
    membership.filter(col("valid_to").isNull).count() shouldBe 5
    // re-run (new clustering, same labels) expires and re-opens — history kept
    val membership2 = Scd2.scd2Merge(membership,
      comm.join(idMap, "node")
        .select(concat(lit("comm2-"), col("label")).as("community_id"),
          col("user_did").as("member_id")),
      "member_id", lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    membership2.count() shouldBe 10
    membership2.filter(col("valid_to").isNull).count() shouldBe 5

    // --- EP2 step 4: metrics (A7–A12) ---
    val structure = CommunityMetrics.structure(edges, comm.select(col("node"), col("label")))
    structure.columns should contain allOf
      ("label", "size", "internal_weight", "cut_weight", "conductance", "density")
    val mod = CommunityMetrics.modularity(edges, comm).collect()(0).getDouble(0)
    mod should be > 0.0 // two real clusters + one bridge → positive modularity

    // user "ideology" vectors (A4): mean of engaged posts' embeddings → ECS
    val userVecs = spark.read.parquet(s"$base/likes")
      .join(vectors.select(col("uri"), col("embedding")), "uri")
      .select(col("user_did"),
        VectorFunctions.l2normalize(col("embedding")).as("nv"))
      .groupBy(col("user_did"))
      .agg(graft.functions.VectorMean(col("nv")).as("mean_v"))
      .select(col("user_did"), VectorFunctions.l2normalize(col("mean_v")).as("v"))
    val ecs = CommunityMetrics.ecs(
      userVecs.join(idMap.select(col("user_did"), col("node")), "user_did")
        .join(comm, "node").select(col("label"), col("v")))
    val rows = ecs.collect()
    rows.length shouldBe byUser.values.toSet.size
    rows.foreach { r =>
      val e = r.getAs[Any]("ecs")
      if (e != null) {
        // ECS = cohesion × separation by construction
        e.asInstanceOf[Double] shouldBe
          (r.getAs[Double]("cohesion") * r.getAs[Double]("separation")) +- 1e-9
      }
    }
  }

  test("driver flagship entry(): projection -> Louvain -> structure metrics, rows > 0") {
    val out = graft.SparkEntry.entry(spark)
    out.count() should be > 0L
    out.columns should contain allOf ("label", "conductance", "density")
  }

  test("q73 session memo: reused across q76/q100 and immune to derived-frame release (r16)") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.TextQueries.q73DedupClusters
    val first = q(spark, dir)
    val firstRows = first.collect().map(_.toSeq).toSet
    // the memo returns the SAME frame within a session — no recompute
    q(spark, dir) should be theSameInstanceAs first
    // a caller releasing a frame DERIVED from the memo (q100's pattern)
    // must not destroy the memo's checkpoint blocks
    val derived = first.select(col("doc_id"), col("kept"))
    derived.count() should be > 0L
    graft.util.BlockRelease.release(derived)
    q(spark, dir).collect().map(_.toSeq).toSet shouldBe firstRows
    // the composed surfaces still produce rows on the memoized input
    graft.queries.TextQueries.q76SplitLeakage(spark, dir).count() shouldBe 1L
  }
}
