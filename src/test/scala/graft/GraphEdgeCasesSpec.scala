package graft

import org.scalatest.matchers.should.Matchers

import graft.graph._

/** Degenerate inputs through the small-graph tiers: empty and single-edge
  * graphs must return well-typed results, not throw. */
class GraphEdgeCasesSpec extends SparkSpec with Matchers {

  test("empty graphs: every iterative algorithm returns an empty typed result") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    Louvain.run(empty).count() shouldBe 0
    Leiden.run(empty).count() shouldBe 0
    Louvain.modularityOptimization(empty).count() shouldBe 0
    KCore.run(empty).count() shouldBe 0
    GraphAlgos.labelPropagationDF(empty).count() shouldBe 0
    GraphAlgos.connectedComponents(empty).count() shouldBe 0
    FastRP.run(empty, dim = 4).count() shouldBe 0
    val noPts = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    Hdbscan.run(noPts).count() shouldBe 0
  }

  test("single-edge graph: totality and sane labels through the sequential tier") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, 2L, 1.0)).toDF("src", "dst", "weight")
    val lv = Louvain.run(one).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lv.keySet shouldBe Set(1L, 2L)
    lv(1L) shouldBe lv(2L) // one edge = one community
    KCore.run(one).collect().map(_.getInt(1)).toSet shouldBe Set(1)
    GraphAlgos.connectedComponents(
      one.select($"src", $"dst")).collect()
      .map(_.getLong(1)).toSet shouldBe Set(1L)
    val fr = FastRP.run(one, dim = 8).collect()
    fr.length shouldBe 2
    fr.foreach(_.getSeq[Double](1).length shouldBe 8)
  }
}
