package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.KmvQuantile

/** KMV-sample quantile sketch (q92's operator): exactness below k, the
  * DKW convergence band above it, and keep-smallest-k mergeability. */
class KmvQuantileSpec extends SparkSpec with Matchers {

  private def keyed(n: Int) = {
    val s = spark
    import s.implicits._
    s.range(n).select(
      $"id".cast("double").as("v"),
      conv(substring(md5(concat(lit("t:"), $"id")), 1, 15), 16, 10)
        .cast("long").as("h"))
  }

  test("corpus smaller than k: quantiles are the exact order statistics") {
    val q = KmvQuantile.quantiles(keyed(10), "h", "v", k = 1024,
      pcts = Seq(10, 50, 100))
      .collect().map(r => r.getAs[Long]("pct") -> r.getAs[Double]("est_value")).toMap
    // values 0..9; ceil(p*10/100)-th smallest
    q(10L) shouldBe 0.0 // rank 1
    q(50L) shouldBe 4.0 // rank 5
    q(100L) shouldBe 9.0 // rank 10
  }

  test("100k uniform values: p50 within the DKW band at k=1024") {
    val n = 100000
    val q = KmvQuantile.quantiles(keyed(n), "h", "v", k = 1024,
      pcts = Seq(25, 50, 90))
      .collect().map(r => r.getAs[Long]("pct") -> r.getAs[Double]("est_value")).toMap
    // eps = sqrt(ln(2/0.01)/(2*1024)) ~ 0.051 -> generous 0.06 band
    math.abs(q(50L) / n - 0.50) should be < 0.06
    math.abs(q(25L) / n - 0.25) should be < 0.06
    math.abs(q(90L) / n - 0.90) should be < 0.06
  }

  test("mergeable: k smallest hashes of the union == keep-smallest-k of per-split samples") {
    val s = spark
    import s.implicits._
    val all = keyed(5000)
    val a = all.filter($"v" < 2500)
    val b = all.filter($"v" >= 2500)
    val k = 256
    def topK(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"h").limit(k).collect().map(_.getAs[Long]("h")).toSet
    val union = topK(all)
    val merged = (topK(a) ++ topK(b)).toSeq.sorted.take(k).toSet
    union shouldBe merged
  }
}
