package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.similarity.Knn

/** Exact kNN join (q102's operator): blocked tier = in-test brute force,
  * tie determinism, small-corpus edge cases. */
class KnnSpec extends SparkSpec with Matchers {

  private def fixture(n: Int, dim: Int) = {
    val s = spark
    import s.implicits._
    def mix(x: Long): Double = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble
    }
    (0 until n).map(i =>
      (i.toLong, Seq.tabulate(dim)(d => mix(i.toLong * dim + d)))).toDF("id", "v")
  }

  private def brute(rows: Array[(Long, Array[Double])], k: Int) =
    rows.flatMap { case (id, v) =>
      rows.filter(_._1 != id)
        .map { case (nb, w) =>
          val d2 = v.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum
          (nb, d2)
        }
        .sortBy { case (nb, d2) => (d2, nb) }
        .take(k)
        .zipWithIndex
        .map { case ((nb, d2), r) => (id, (r + 1).toLong, nb, d2) }
    }.toSet

  test("blocked kNN join = brute force, many block-pair tasks (k=4, 300 pts)") {
    val s = spark
    import s.implicits._
    val df = fixture(300, 8)
    val pts = df.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val expect = brute(pts, 4)
    // taskTarget = 32 → ~10 blocks, ~55 tasks: the union/window path is
    // genuinely exercised, not a single-task degenerate
    val got = Knn.exactKnnJoin(df, "id", "v", k = 4, taskTarget = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    got shouldBe expect
  }

  test("distance ties break by neighbor id, identically in both tiers") {
    val s = spark
    import s.implicits._
    // 4 points at the corners of a square: each point's two nearest are
    // equidistant (side length) — the (d2, nbr) order must pick the
    // smaller id first, in every blocking
    val df = Seq(
      (10L, Seq(0.0, 0.0)), (20L, Seq(1.0, 0.0)),
      (30L, Seq(0.0, 1.0)), (40L, Seq(1.0, 1.0))).toDF("id", "v")
    for (tt <- Seq(2, 4)) {
      val m = Knn.exactKnnJoin(df, "id", "v", k = 2, taskTarget = tt)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      withClue(s"taskTarget=$tt: ") {
        m((10L, 1L)) shouldBe 20L // d2 = 1 tie vs 30 → smaller id
        m((10L, 2L)) shouldBe 30L
        m((40L, 1L)) shouldBe 20L
        m((40L, 2L)) shouldBe 30L
      }
    }
  }

  test("n <= k: every point returns its n-1 neighbors, no phantom rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0.0)), (2L, Seq(5.0)), (3L, Seq(9.0))).toDF("id", "v")
    val rows = Knn.exactKnnJoin(df, "id", "v", k = 10, taskTarget = 2).collect()
    rows.length shouldBe 6 // 3 points × 2 real neighbors
    rows.map(_.getLong(1)).max shouldBe 2L
  }
}
