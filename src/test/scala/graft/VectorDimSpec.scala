package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.{VectorFunctions, VectorMean}
import graft.functions.TextExpressions.embed_text
import graft.graph.{FastRP, Projection}
import graft.schemas.Tables

/** Reference-scale dimensionality (VERDICT item 10): the reference runs
  * 384-dim post embeddings (project/qdrant/consumer_post.py:46-48) and
  * 128-dim FastRP (community_detection.py:42); the rest of the suite
  * exercises 64/32-dim. These invariants run the REAL dims at sf0.1 so
  * per-element overheads (codegen loops, VectorMean buffers, shuffle row
  * width) can't hide behind small vectors. Wall times are printed as the
  * bench note on per-dim cost.
  */
class VectorDimSpec extends SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.1"

  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  test("384-dim hashed embeddings at sf0.1: unit norms, centroids, exact top-k") {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), embed_text(col("text"), 384).as("v"))
      .localCheckpoint()
    val n = docs.count()
    n should be > 1000L

    // every embedding unit-norm at 384 dims (codegen'd normalize path)
    val badNorm = timed(s"384-dim norm check over $n docs")(
      docs.select(VectorFunctions.l2norm(col("v")).as("nrm"))
        .filter(abs(col("nrm") - 1.0) > 1e-4).count())
    badNorm shouldBe 0L

    // per-source centroids through the VectorMean partial-agg buffer at
    // 384 doubles per group state
    val cents = timed("384-dim VectorMean centroids")(
      docs.groupBy(col("source")).agg(VectorMean(col("v")).as("c")).collect())
    cents.length should be > 0
    all(cents.map(_.getSeq[Double](1).length)) shouldBe 384

    // exact cosine top-10 vs doc 0: TakeOrderedAndProject at 384 dims
    val q = docs.filter(col("doc_id") === 0).select(col("v").as("qv"))
    val top = timed("384-dim cosine top-10")(
      docs.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("doc_id"), VectorFunctions.dot(col("v"), col("qv")).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10).collect())
    top.length shouldBe 10
    val scores = top.map(_.getDouble(1))
    scores.sorted.reverse shouldBe scores
    all(scores) should (be >= -1.0001 and be <= 1.0001)
  }

  test("128-dim FastRP at sf0.1: right shape, unit norms, deterministic") {
    val g = Projection.supplierGraph(spark, dir)
    val e1 = timed("128-dim FastRP run 1")(
      FastRP.run(g, dim = 128).localCheckpoint())
    val nodes = g.select(col("src")).union(g.select(col("dst"))).distinct().count()
    e1.count() shouldBe nodes
    e1.select(org.apache.spark.sql.functions.size(col("embedding")).as("d"))
      .filter(col("d") =!= 128).count() shouldBe 0L
    e1.select(VectorFunctions.l2norm(col("embedding")).as("nrm"))
      .filter(abs(col("nrm") - 1.0) > 1e-6).count() shouldBe 0L

    // deterministic: identical output across runs (seeded hash init)
    val e2 = timed("128-dim FastRP run 2")(
      FastRP.run(g, dim = 128).localCheckpoint())
    val joined = e1.select(col("node"), col("embedding").as("ea"))
      .join(e2.select(col("node"), col("embedding").as("eb")), "node")
    joined.filter(sqrt(VectorFunctions.l2distSq(col("ea"), col("eb"))) > 1e-9)
      .count() shouldBe 0L
  }
}
