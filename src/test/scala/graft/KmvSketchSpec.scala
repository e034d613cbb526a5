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

  test("overlapEstimates: exact in the small (nx < k) case, all pairs covered") {
    val s = spark
    import s.implicits._
    import graft.functions.KmvSketch
    // three groups with KNOWN u60 overlap structure, all < k so the
    // estimator's small case must return EXACT union/intersection:
    // a = {1..60}, b = {41..100} (|∩|=20, |∪|=100), c = {1000..1009}
    val su = ((1 to 60).map(u => ("a", u.toLong)) ++
      (41 to 100).map(u => ("b", u.toLong)) ++
      (1000 to 1009).map(u => ("c", u.toLong))).toDF("g", "u")
    val sk = KmvSketch.groupSketches(su, "g", "u", k = 256)
    val est = KmvSketch.overlapEstimates(sk, "g", "u", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    est.keySet shouldBe Set(("a", "b"), ("a", "c"), ("b", "c"))
    est(("a", "b")) shouldBe ((100L, 20L, 200L)) // 1000*20/100
    est(("a", "c")) shouldBe ((70L, 0L, 0L))
    est(("b", "c")) shouldBe ((70L, 0L, 0L))
  }

  test("overlapEstimates: estimation regime tracks true union/Jaccard within KMV error") {
    val s = spark
    import s.implicits._
    import graft.functions.KmvSketch
    val k = 256
    // uniform u60-like hashes via md5 prefixes; 8000 shared + 8000/8000
    // exclusive => |∪|=24000, J = 1/3
    val rows =
      (1 to 8000).map(i => ("a", s"sh$i")) ++ (1 to 8000).map(i => ("b", s"sh$i")) ++
      (1 to 8000).map(i => ("a", s"xa$i")) ++ (1 to 8000).map(i => ("b", s"xb$i"))
    val su = rows.toDF("g", "t")
      .select($"g", conv(substring(md5($"t"), 1, 15), 16, 10).cast("long").as("u"))
      .distinct()
    val sk = KmvSketch.groupSketches(su, "g", "u", k)
    val r = KmvSketch.overlapEstimates(sk, "g", "u", k).collect().head
    val (unionEst, jmEst) = (r.getLong(4), r.getLong(6))
    math.abs(unionEst - 24000.0) / 24000.0 should be < 0.20 // ~3/sqrt(k)
    jmEst.toDouble should (be > 333.0 * 0.7 and be < 333.0 * 1.3)
  }
}
