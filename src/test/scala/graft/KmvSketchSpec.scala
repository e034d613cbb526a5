package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.KmvSketch.kmv_distinct
import graft.schemas.Tables

class KmvSketchSpec extends SparkSpec with Matchers {

  test("exact below k; within ~3/√k relative error above k; merge-safe across partitions") {
    val s = spark
    import s.implicits._
    // exact regime: 50 distinct < k=256
    val small = (1 to 200).map(i => i % 50).toDF("x").repartition(4)
    small.agg(kmv_distinct($"x", 256)).collect()(0).getLong(0) shouldBe 50L

    // estimation regime: 14743 distinct orderkeys at sf0.01 with k=256
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val exact = li.select(countDistinct($"l_orderkey")).collect()(0).getLong(0)
    val est = li.agg(kmv_distinct($"l_orderkey", 256)).collect()(0).getLong(0)
    math.abs(est - exact).toDouble / exact should be < 0.20 // 3/√254 ≈ 0.19

    // grouped (exercises partial/merge paths per group)
    val grouped = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact"), kmv_distinct($"l_orderkey", 256).as("est"))
      .collect()
    grouped.foreach { r =>
      val (ex, es) = (r.getLong(1), r.getLong(2))
      math.abs(es - ex).toDouble / ex should be < 0.20
    }
  }
}
