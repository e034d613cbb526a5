package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Packing

class PackingSpec extends SparkSpec with Matchers {

  test("bestFitPack: hand-checked placements, truncation, bounded open bins") {
    val s = spark
    import s.implicits._
    // one lane, budget 10, maxOpen 2. Decreasing order by eff:
    // 10(doc7),9,7,6,3,2,1. Fold: 10→bin1(r0); 9→bin2(r1); 7→bin3(r3),
    // 3 open → close bin1(r0); 6→bin4(r4), 3 open → close bin2(r1);
    // 3→bin3(r3→0); 2→bin4(r4→2); 1→bin4(r2→1).
    val docs = Seq(
      (1L, 0L, 9L), (2L, 0L, 7L), (3L, 0L, 6L),
      (4L, 0L, 3L), (5L, 0L, 2L), (6L, 0L, 1L),
      (7L, 0L, 99L)) // truncated to budget → placed first (eff 10)
      .toDF("doc_id", "lane", "n_tokens")
    val out = Packing.bestFitPack(docs, budget = 10L, maxOpen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    out(7L) shouldBe ((10L, 1L)) // eff truncated to 10, fills bin 1 exactly
    out(1L) shouldBe ((9L, 2L))
    out(2L) shouldBe ((7L, 3L))
    out(3L) shouldBe ((6L, 4L))  // opens bin 4 → bound closes bin 2 (res 1)
    out(4L) shouldBe ((3L, 3L))  // best fit: bin 3 res 3 beats bin 4 res 4
    out(5L) shouldBe ((2L, 4L))  // bin 3 now res 0; bin 4 res 4 → 2
    out(6L) shouldBe ((1L, 4L))  // bin 3 res 0 can't fit → bin 4 res 2 → 1
  }

  test("lanes pack independently and the surface is total") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i => (i, i % 4, (i * 7) % 13 + 1)).toDF("doc_id", "lane", "n_tokens")
    val out = Packing.bestFitPack(docs, budget = 16L, maxOpen = 4)
    out.count() shouldBe 40 // one row per input doc
    // per-lane bins never exceed capacity
    val over = out.groupBy("lane", "bin")
      .agg(sum("eff_tokens").as("used"))
      .filter(col("used") > 16)
    over.count() shouldBe 0
  }

  test("waste: BFD pads less than naive doc-order first-open-bin packing") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 400L).map(i => (i, i % 8, rnd.nextInt(200).toLong + 1))
    val df = docs.toDF("doc_id", "lane", "n_tokens")
    val budget = 512L
    val out = Packing.bestFitPack(df, budget = budget, maxOpen = 8)
    val bfdBins = out.select(countDistinct(col("lane"), col("bin"))).first().getLong(0)
    // naive whole-doc baseline: walk each lane in doc_id order, append to
    // the current bin if it fits, else open a new one (what a packer
    // without best-fit or decreasing order does)
    val naiveBins = docs.groupBy(_._2).map { case (_, ds) =>
      var bins = 0L
      var resid = 0L
      ds.sortBy(_._1).foreach { case (_, _, n) =>
        val eff = math.min(n, budget)
        if (resid >= eff) resid -= eff
        else { bins += 1; resid = budget - eff }
      }
      bins
    }.sum
    val total = docs.map(d => math.min(d._3, budget)).sum
    val bfdWaste = 1.0 - total.toDouble / (bfdBins * budget)
    val naiveWaste = 1.0 - total.toDouble / (naiveBins * budget)
    withClue(s"bfdBins=$bfdBins naiveBins=$naiveBins " +
        f"bfdWaste=$bfdWaste%.3f naiveWaste=$naiveWaste%.3f: ") {
      bfdBins should be <= naiveBins
    }
  }

  test("q80 vs q71 waste-fraction comparison row (reported, both contracts hold)") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val budget = 512L
    val q80 = graft.queries.TextQueries.defs("q80_sequence_pack_bfd")(spark, dir)
    val q71 = graft.queries.TextQueries.defs("q71_sequence_pack")(spark, dir)
    val eff = q80.select(sum("eff_tokens")).first().getLong(0)
    val bins = q80.select(countDistinct(col("lane"), col("bin"))).first().getLong(0)
    val bfdWaste = 1.0 - eff.toDouble / (bins * budget)
    // q71 concat-and-cut: windows = per-lane ceil(total/budget); docs
    // straddle boundaries, so padding exists only at each lane's tail
    val q71Windows = q71.groupBy("lane").agg(max("end_off").as("t"))
      .select(sum(ceil(col("t") / budget))).first().getLong(0)
    val q71Total = q71.select(sum("n_tokens")).first().getLong(0)
    val cutWaste = 1.0 - q71Total.toDouble / (q71Windows * budget)
    info(f"q80 BFD: bins=$bins waste=$bfdWaste%.4f | q71 cut: windows=$q71Windows waste=$cutWaste%.4f")
    bfdWaste should be >= 0.0
    bfdWaste should be < 1.0
    cutWaste should be >= 0.0
    // BFD keeps documents whole at the price of padding; concat-and-cut
    // pads only lane tails — both contracts hold simultaneously
    eff should be <= q71Total
  }
}
