package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.similarity.Pq

/** Product quantization (q84's operator): exactness of encode/decode/ADC
  * on codebooks that contain the data, determinism of the argmin
  * tie-break, and the production k-means tier (seed-dependent, so
  * spec-verified — the q79 discipline). */
class PqSpec extends SparkSpec with Matchers {

  // m=2 subspaces × 4 dims; codebook 0 entries chosen so test vectors
  // are EXACT codebook concatenations
  private val cbs: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = IndexedSeq(
    IndexedSeq(
      IndexedSeq(0.0, 0.0, 0.0, 0.0), IndexedSeq(1.0, 2.0, 3.0, 4.0),
      IndexedSeq(-1.0, 0.0, 1.0, 0.0)),
    IndexedSeq(
      IndexedSeq(5.0, 5.0, 5.0, 5.0), IndexedSeq(0.0, 0.0, 0.0, 0.0),
      IndexedSeq(2.0, -2.0, 2.0, -2.0)))

  test("encode+decode round-trips exactly when the vector IS a codebook concat") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0, 2.0, -2.0, 2.0, -2.0)), // codes (1, 2)
      (2L, Seq(0.0, 0.0, 0.0, 0.0, 5.0, 5.0, 5.0, 5.0))    // codes (0, 0)
    ).toDF("id", "v")
    val out = df.select($"id", Pq.encode($"v", cbs).as("codes"),
      Pq.reconstructionError2($"v", cbs).as("err")).orderBy($"id").collect()
    out(0).getSeq[Int](1) shouldBe Seq(1, 2)
    out(1).getSeq[Int](1) shouldBe Seq(0, 0)
    out.foreach(_.getDouble(2) shouldBe 0.0)
  }

  test("argmin tie-break is the smallest code index in both tie shapes") {
    val s = spark
    import s.implicits._
    // sub0 = (0,1,1.5,2): equidistant cases engineered below; simplest
    // deterministic check — a vector equidistant from entries 0 and 2
    // (midpoint) must pick code 0
    val mid = Seq(-0.5, 0.0, 0.5, 0.0) // midpoint of entries 0 and 2 in sub 0
    val df = Seq((1L, mid ++ Seq(1.0, -1.0, 1.0, -1.0))).toDF("id", "v")
    val codes = df.select(Pq.encode($"v", cbs)).first().getSeq[Int](0)
    codes.head shouldBe 0 // not 2 — first minimum wins
  }

  test("ADC against a query equals the exact sq distance when recon is exact") {
    val s = spark
    import s.implicits._
    val v = Seq(1.0, 2.0, 3.0, 4.0, 0.0, 0.0, 0.0, 0.0)
    val q = IndexedSeq(1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0)
    val df = Seq((1L, v)).toDF("id", "v")
    val adc = df.select(
      Pq.adc(Pq.encode($"v", cbs), q, cbs)).first().getDouble(0)
    val exact = v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    adc shouldBe exact
  }

  test("adcTopK on exact codebooks ranks the true nearest vector first") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0, 5.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (3L, Seq(-1.0, 0.0, 1.0, 0.0, 2.0, -2.0, 2.0, -2.0))
    ).toDF("id", "v")
    val q = IndexedSeq(1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0, 4.0)
    val top = Pq.adcTopK(df, "id", "v", q, k = 2, cbs).collect()
    top(0).getLong(0) shouldBe 1L
  }

  test("fitCodebooks: k-means tier beats the md5 twin on clustered data") {
    val s = spark
    import s.implicits._
    def mix(x0: Long): Long = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // 600 points in 3 planted cluster centers per subspace ± small jitter
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0), Seq(-10.0, 5.0))
    val pts = (0 until 600).map { i =>
      val c = centers(i % 3)
      val jit = (d: Int) => (mix(i * 7L + d).toDouble / Long.MaxValue) * 0.5
      (i.toLong, Seq(c(0) + jit(0), c(1) + jit(1), c(0) - jit(2), c(1) + jit(3)))
    }
    val df = pts.toDF("id", "v").localCheckpoint()
    val fitted = Pq.fitCodebooks(df, "id", "v", m = 2, ks = 4)
    fitted.length shouldBe 2
    fitted.foreach { sub => sub.length shouldBe 4; sub.foreach(_.length shouldBe 2) }
    val md5cb = Pq.md5Codebooks(m = 2, ks = 4, subDim = 2)
    val errFit = df.select(sum(Pq.reconstructionError2($"v", fitted)))
      .first().getDouble(0)
    val errMd5 = df.select(sum(Pq.reconstructionError2($"v", md5cb)))
      .first().getDouble(0)
    errFit should be < errMd5 / 10.0 // trained codebooks fit planted clusters
    // codes stay in range
    val mx = df.select(array_max(Pq.encode($"v", fitted)).as("m"))
      .agg(max($"m")).first().getInt(0)
    mx should be < 4
  }
}
