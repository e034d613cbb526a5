package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.dedup.SemDedup
import graft.similarity.Ann

class SemDedupSpec extends SparkSpec with Matchers {

  test("semDeDup over planted cells: exact dup dropped, distinct kept, totality holds") {
    val s = spark
    import s.implicits._
    // cell 0: ids 1,2 identical codes (τ-dup), id 3 orthogonal;
    // cell 1: id 4 alone; ids 5 (zero codes) never pairs
    val assigned = Seq(
      (1L, Seq(10L, 0L, 0L), 0L),
      (2L, Seq(10L, 0L, 0L), 0L),
      (3L, Seq(0L, 10L, 0L), 0L),
      (4L, Seq(10L, 0L, 0L), 1L), // same codes as 1 but OTHER cell → never paired
      (5L, Seq(0L, 0L, 0L), 0L))
      .toDF("doc_id", "codes", "cell")
    val out = SemDedup.semDeDup(assigned)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L) // total: one row per input doc
    out(1L)._3 shouldBe true   // smallest id of the dup pair keeps
    out(2L) shouldBe ((0L, 1L, false)) // one smaller witness → dropped
    out(3L)._3 shouldBe true   // orthogonal → kept
    out(4L)._3 shouldBe true   // cross-cell dup NEVER seen: cell isolation
    out(5L)._3 shouldBe true   // zero codes: dot = 0 fails dot > 0 → kept
  }

  test("kmeans-IVF composition (the q26 production tier): planted near-dup collapses, totality") {
    val s = spark
    import s.implicits._
    // 3 well-separated direction clusters of unit vectors + one planted
    // exact duplicate pair inside cluster A
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Double]): Seq[Double] = {
      val v = base.map(x => x + rnd.nextGaussian() * 0.01)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0)
    val c = Array(0.0, 0.0, 1.0, 0.0)
    val rows =
      (0 until 20).map(i => (i.toLong, jitter(a))) ++
      (20 until 40).map(i => (i.toLong, jitter(b))) ++
      (40 until 60).map(i => (i.toLong, jitter(c))) ++
      // the planted pair gets its OWN direction: a (1,0,0,0) plant would
      // be a true τ-dup of every jittered cluster-A member (cos ≈ 0.9999)
      // and correctly drop — which is the operator working, not the test
      Seq((60L, Seq(0.0, 0.0, 0.0, 1.0)), (61L, Seq(0.0, 0.0, 0.0, 1.0)))
    val pts = rows.toDF("doc_id", "v")
    val centroids = Ann.kmeansCentroids(pts, "doc_id", "v", nlist = 3, iters = 3)
    val assigned = Ann.ivfAssign(pts, "doc_id", "v", centroids)
      .select(col("doc_id"), SemDedup.quantizeCodes(col("v")).as("codes"), col("cell"))
    val out = SemDedup.semDeDup(assigned)
    val rows2 = out.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    rows2.size shouldBe 62                    // total surface
    rows2(60L) shouldBe true                  // planted exact pair: min id kept,
    rows2(61L) shouldBe false                 // twin dropped (same cell: identical
                                              // vectors always share the argmax cell)
    // kept ⟺ n_dups_smaller == 0 invariant
    out.collect().foreach { r =>
      r.getBoolean(3) shouldBe (r.getLong(2) == 0L)
    }
  }

  test("flagSemanticContaminated: planted leak flagged, orthogonal clean, totality over corpus") {
    val s = spark
    import s.implicits._
    // bench: two directions; corpus: an exact copy of bench 1 (leaked),
    // a near copy (still ≥ 9/10), an orthogonal doc, a zero-code doc
    val bench = Seq(
      (100L, Seq(10L, 0L, 0L, 0L)),
      (101L, Seq(0L, 10L, 0L, 0L)))
      .toDF("doc_id", "codes")
    val corpus = Seq(
      (1L, Seq(10L, 0L, 0L, 0L)),   // verbatim-equivalent embedding → flagged
      (2L, Seq(10L, 1L, 0L, 0L)),   // cos = 10/√101 ≈ 0.995 → flagged
      (3L, Seq(0L, 0L, 10L, 0L)),   // orthogonal to both → clean
      (4L, Seq(0L, 0L, 0L, 0L)))    // zero codes: dot = 0 → never flags
      .toDF("doc_id", "codes")
    val out = SemDedup.flagSemanticContaminated(corpus, bench)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)  // total over the corpus side
    out(1L) shouldBe ((1L, true))
    out(2L) shouldBe ((1L, true))
    out(3L) shouldBe ((0L, false))
    out(4L) shouldBe ((0L, false))
  }

  test("nlistBits: the integer nlist rule (cells grow with corpus, floor 4, cap 40)") {
    SemDedup.nlistBits(0L) shouldBe 4
    SemDedup.nlistBits(500L) shouldBe 4       // every shipped SF lands on 4
    SemDedup.nlistBits(5000L) shouldBe 4      // 400·16 = 6400 ≥ 5000
    SemDedup.nlistBits(6401L) shouldBe 5      // first count past the 4-bit cap
    SemDedup.nlistBits(50000L) shouldBe 7     // 400·128 = 51200
    SemDedup.nlistBits(500000L) shouldBe 11   // 400·2048 = 819200
    SemDedup.nlistBits(400L << 11) shouldBe 11 // exact power-of-two boundary
    SemDedup.nlistBits((400L << 11) + 1) shouldBe 12
    SemDedup.nlistBits(Long.MaxValue / 2) shouldBe 40 // cap, no overflow
  }

  test("dim guard: codes past the int8 double-exactness bound raise, 588-dim passes") {
    val s = spark
    import s.implicits._
    // bound at τ=9/10 is ⌊√2⁵³/(10·127²)⌋ = 588: a 588-dim max-magnitude
    // code vector is still exact; 589 dims must refuse loudly rather than
    // silently go approximate (r9 ADVICE)
    val ok = Seq((1L, Seq.fill(588)(127L), 0L), (2L, Seq.fill(588)(127L), 0L))
      .toDF("doc_id", "codes", "cell")
    SemDedup.semDeDup(ok).collect().length shouldBe 2
    val over = Seq((1L, Seq.fill(589)(127L), 0L)).toDF("doc_id", "codes", "cell")
    val e = intercept[Exception] { SemDedup.semDeDup(over).collect() }
    e.getMessage should include("exactness bound")
  }

  test("srpCellsMd5: deterministic, in range, zero vector lands in cell 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(3.0, -2.0, 5.0, 1.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)))
      .toDF("id", "v")
      .select(col("id"), SemDedup.srpCellsMd5(col("v"), dim = 4, bits = 3, seed = "t").as("cell"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m(2L) shouldBe 0L                          // strict > 0: ties → bit 0
    m(1L) should (be >= 0L and be < 8L)
    // same input twice → same cell (pure function of the md5 planes)
    val again = Seq((1L, Seq(3.0, -2.0, 5.0, 1.0))).toDF("id", "v")
      .select(SemDedup.srpCellsMd5(col("v"), dim = 4, bits = 3, seed = "t"))
      .first().getLong(0)
    again shouldBe m(1L)
  }

  test("marginProbeBits: picks the p smallest-|projection| flips, deterministic (r10)") {
    val qv = Seq(3.0, -2.0, 5.0, 1.0)
    val all = SemDedup.marginProbeBits(qv, dim = 4, bits = 6, seed = "t", p = 6)
    all.length shouldBe 6
    all.toSet shouldBe (0 until 6).toSet // p = bits → a permutation of all flips
    // prefix property: the p-probe set is always the first p of the full ranking
    SemDedup.marginProbeBits(qv, 4, 6, "t", 3) shouldBe all.take(3)
    SemDedup.marginProbeBits(qv, 4, 6, "t", 0) shouldBe Seq.empty
    // the ranking is by |q·plane_b| ascending: recompute projections from
    // the same ±1 plane rule and check monotonicity
    val md = java.security.MessageDigest.getInstance("MD5")
    def proj(b: Int): Double = (0 until 4).map { i =>
      val d = md.digest(s"t:$b:$i".getBytes("UTF-8"))
      qv(i) * (if (((d(0) >> 4) & 0xf) >= 8) 1 else -1)
    }.sum
    val ms = all.map(b => math.abs(proj(b)))
    ms.sorted shouldBe ms
  }
}
