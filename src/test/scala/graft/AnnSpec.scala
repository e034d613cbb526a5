package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.VectorFunctions
import graft.schemas.Tables
import graft.similarity.Ann

class AnnSpec extends SparkSpec with Matchers {

  private lazy val pts = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id").as("id"),
      VectorFunctions.l2normalize(col("embedding")).as("v"))
    .cache()

  private lazy val qcol = {
    val qv = pts.filter(col("id") === 0).select(col("v")).first().getSeq[Double](0)
    array(qv.map(lit): _*)
  }

  private lazy val exact = Ann.bruteTopK(pts.filter(col("id") =!= 0), "id", "v", qcol, 10)
    .collect().map(_.getLong(0)).toSet

  test("IVF ANN: recall@10 ≥ 0.5 at nprobe=4/16, exact scores for returned ids") {
    val centroids = Ann.kmeansCentroids(pts, "id", "v", nlist = 16, iters = 2)
    val assigned = Ann.ivfAssign(pts.filter(col("id") =!= 0), "id", "v", centroids)
    assigned.count() shouldBe pts.count() - 1 // every vector lands in exactly one cell
    val approx = Ann.ivfTopK(assigned, centroids, "id", "v", qcol, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    approx.size shouldBe 10
    (exact.intersect(approx).size.toDouble / 10) should be >= 0.5
  }

  test("IVF with nprobe = nlist is exact") {
    val centroids = Ann.kmeansCentroids(pts, "id", "v", nlist = 8, iters = 1)
    val assigned = Ann.ivfAssign(pts.filter(col("id") =!= 0), "id", "v", centroids)
    val full = Ann.ivfTopK(assigned, centroids, "id", "v", qcol, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    full shouldBe exact
  }

  test("persisted IVF index: partition-pruned scan, same results as in-memory IVF") {
    val centroids = Ann.kmeansCentroids(pts, "id", "v", nlist = 8, iters = 1)
    val corpus = pts.filter(col("id") =!= 0)
    val path = java.nio.file.Files.createTempDirectory("ivf").toFile.getAbsolutePath + "/index"
    Ann.writeIvfIndex(corpus, "id", "v", centroids, path)
    val fromIndex = Ann.ivfTopKFromIndex(spark, path, centroids, "id", "v", qcol, 10, nprobe = 3)
    val inMemory = Ann.ivfTopK(Ann.ivfAssign(corpus, "id", "v", centroids),
      centroids, "id", "v", qcol, 10, nprobe = 3)
    fromIndex.collect().map(_.getLong(0)).toSeq shouldBe
      inMemory.collect().map(_.getLong(0)).toSeq
    // the scan must prune partitions, not filter rows post-read: the
    // PartitionFilters list must actually carry the cell predicate (an
    // empty list would also print "PartitionFilters: [...]")
    val plan = fromIndex.queryExecution.executedPlan.toString
    "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan) should not be empty
  }

  test("q26 runs through the persisted index with a partition-pruned scan") {
    val dir = "/root/testdata/sf0.001"
    val q26 = graft.queries.PipelineQueries.q26AnnIvf(spark, dir)
    q26.collect().length shouldBe 10
    // the surface stage checkpoints (so the final plan is a checkpoint
    // scan); the pruning assertion targets the raw index query q26 wraps
    val qcol = graft.queries.PipelineQueries.queryVec(spark, dir)
    val raw = graft.queries.PipelineQueries.q26Raw(spark, dir, qcol)
    val plan = raw.queryExecution.executedPlan.toString
    "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan) should not be empty
  }

  test("IVF margin probing: recall at every nprobe >= dot-order recall (r10, ROADMAP 2)") {
    val centroids = Ann.kmeansCentroids(pts, "id", "v", nlist = 16, iters = 2)
    val assigned = Ann.ivfAssign(pts.filter(col("id") =!= 0), "id", "v", centroids)
      .cache()
    def recall(nprobe: Int, byMargin: Boolean): Double = {
      val ids = Ann.ivfTopK(assigned, centroids, "id", "v", qcol, 10,
        nprobe, byMargin).collect().map(_.getLong(0)).toSet
      exact.intersect(ids).size.toDouble / 10
    }
    // deterministic corpus + seeded kmeans: these are fixed numbers, so
    // the dominance pin is a regression check, not a statistical claim.
    // The first probe cell (the query's own) is identical under both
    // rankings; margin ordering re-ranks only the FOLLOW-UP probes toward
    // nearby Voronoi boundaries.
    val pairs = (2 to 6).map(np => (np, recall(np, byMargin = true),
      recall(np, byMargin = false)))
    pairs.foreach { case (np, margin, dot) =>
      withClue(s"nprobe=$np: ") { margin should be >= dot }
    }
    // and the headline claim — fewer cells at equal-or-better recall:
    // the margin ranking must reach the dot ranking's nprobe=4 recall
    // with at most 4 probes itself
    val dotAt4 = pairs.find(_._1 == 4).get._3
    pairs.filter(_._1 <= 4).map(_._2).max should be >= dotAt4
    assigned.unpersist()
  }

  test("LSH ANN returns verified-exact scores (subset of corpus, desc order)") {
    val res = Ann.lshTopK(pts.filter(col("id") =!= 0), "id", "v", qcol, 10,
      bits = 4, tables = 8).collect()
    res.length should be <= 10
    val scores = res.map(_.getDouble(1))
    scores.sorted.reverse shouldBe scores // descending
  }

  test("hyperplane_probes: probes=0 ≡ hyperplane_sigs; flips differ in exactly one bit") {
    import graft.functions.VectorExpressions.{hyperplane_probes, hyperplane_sigs}
    val m = 3
    val rows = pts.limit(64).select(
      hyperplane_sigs(col("v"), 8, "ann", 6, 5).as("sigs"),
      hyperplane_probes(col("v"), 8, "ann", 6, 5, 0).as("p0"),
      hyperplane_probes(col("v"), 8, "ann", 6, 5, m).as("pm")).collect()
    rows.length shouldBe 64
    rows.foreach { r =>
      val sigs = r.getSeq[Long](0); val p0 = r.getSeq[Long](1); val pm = r.getSeq[Long](2)
      p0 shouldBe sigs // degenerate layout = exact signatures
      pm.length shouldBe sigs.length * (1 + m)
      sigs.indices.foreach { t =>
        val block = pm.slice(t * (1 + m), (t + 1) * (1 + m))
        block.head shouldBe sigs(t) // stride-leading exact signature
        // each probe flips exactly one DISTINCT bit of the exact signature
        val flipped = block.tail.map(_ ^ sigs(t))
        flipped.foreach(f => java.lang.Long.bitCount(f) shouldBe 1)
        flipped.distinct.length shouldBe m
      }
    }
  }

  test("query-side multi-probe LSH: recall dominates the classic config at equal tables") {
    val corpus = pts.filter(col("id") =!= 0)
    def recall(tables: Int, probes: Int): Double = {
      val ids = Ann.lshTopK(corpus, "id", "v", qcol, 10,
        bits = 4, tables = tables, probes = probes).collect().map(_.getLong(0)).toSet
      exact.intersect(ids).size.toDouble / 10
    }
    val classic6 = recall(6, 0)
    val probed6 = recall(6, 3)
    // probing only ADDS probed buckets: the candidate set is a superset,
    // so recall can only improve — and on this structureless corpus the
    // q27 config's pin must hold where the classic 6-table one falls short
    probed6 should be >= classic6
    probed6 should be >= 0.5
  }

  test("ivfAssign and probeCells break exact-sim ties identically (smallest cell wins)") {
    // two COINCIDENT centroids: every corpus vector ties exactly, and a
    // query equal to a corpus vector ties in probeCells — before r11 the
    // assignment took the LARGEST cell while the probe order's home cell
    // c0 took the SMALLEST, so the tied vector's cell was probed LAST
    val s = spark
    import s.implicits._
    val c = Array(1.0, 0.0, 0.0)
    val cents = Seq((0L, c.toSeq), (1L, c.toSeq), (2L, Seq(0.0, 1.0, 0.0)))
      .toDF("cell", "centroid")
    val corpus = Seq((7L, Seq(1.0, 0.0, 0.0))).toDF("id", "v")
    val assigned = Ann.ivfAssign(corpus, "id", "v", cents)
      .select("cell").as[Long].head()
    assigned shouldBe 0L // smallest tied cell
    val qv = typedLit(Seq(1.0, 0.0, 0.0))
    for (byMargin <- Seq(true, false)) {
      val probes = Ann.probeCells(cents, qv, nprobe = 1, byMargin = byMargin)
      withClue(s"byMargin=$byMargin: ") {
        probes.head shouldBe assigned // nprobe=1 still finds the tied vector
      }
    }
  }
}
