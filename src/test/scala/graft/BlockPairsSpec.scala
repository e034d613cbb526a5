package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.util.BlockPairs

/** The shared block-pair skeleton (r11 — single copy of the replicate +
  * pair-charging rule behind q102's exact kNN and q48's exact HDBSCAN
  * tier): the exactly-once property is pinned END-TO-END through the
  * real [[BlockPairs.replicate]] path, not a driver-side simulation. */
class BlockPairsSpec extends SparkSpec with Matchers {

  /** Every unordered point pair must be charged in EXACTLY ONE task —
    * the invariant both kernels' exactness proofs rest on. */
  private def chargedPairCounts(ids: Seq[Long], nBlocks: Int): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    val pts = ids.toDF("id")
    BlockPairs.replicate(pts, "id", "spec", nBlocks)
      .as[(Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (task, it) =>
        val rows = it.toArray
        val diag = BlockPairs.isDiagonal(task, nBlocks)
        for {
          x <- rows.indices.iterator
          y <- (x + 1 until rows.length).iterator
          if BlockPairs.charged(diag, rows(x)._2, rows(y)._2)
        } yield (math.min(rows(x)._3, rows(y)._3), math.max(rows(x)._3, rows(y)._3))
      }
      .groupByKey(identity).count().collect()
      .map { case (p, c) => p -> c }.toMap
  }

  test("every unordered pair charged exactly once, for B = 1..7, dense and sparse ids") {
    for {
      nBlocks <- 1 to 7
      ids <- Seq(
        (0L until 23L).toSeq,                       // dense
        Seq(5L, 1000L, -3L, 7L, 999999999L, 42L, 0L, Long.MinValue / 2),
        (0L until 40L).map(_ * 1000000007L))        // clustered hash stress
    } {
      val counts = chargedPairCounts(ids, nBlocks)
      val expected = (for {
        x <- ids; y <- ids if x < y
      } yield (x, y)).toSet
      withClue(s"nBlocks=$nBlocks n=${ids.size}: ") {
        counts.keySet shouldBe expected
        all(counts.values) shouldBe 1L
      }
    }
  }

  test("replicate prepends (task, blk) and preserves passthrough columns and row multiplicity") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "tag", "x")
    val rep = BlockPairs.replicate(pts, "id", "salt", 4)
    rep.columns.toSeq shouldBe Seq("task", "blk", "id", "tag", "x")
    rep.count() shouldBe 3L * 4L // each point lands in exactly nBlocks tasks
    // passthrough values ride along untouched
    rep.select("id", "tag", "x").distinct().as[(Long, String, Double)]
      .collect().toSet shouldBe Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    // block assignment is a pure function of the id: constant per id
    rep.groupBy("id").agg(countDistinct("blk").as("nb"))
      .as[(Long, Long)].collect().foreach(_._2 shouldBe 1L)
  }

  test("numBlocks ceil-divides and floors at 1; diagonal task arithmetic") {
    BlockPairs.numBlocks(0L, 2048) shouldBe 1
    BlockPairs.numBlocks(2048L, 2048) shouldBe 1
    BlockPairs.numBlocks(2049L, 2048) shouldBe 2
    BlockPairs.numBlocks(1000000L, 2048) shouldBe 489
    // task i*B+j is diagonal iff i == j
    for (b <- 1 to 5; i <- 0 until b; j <- i until b)
      BlockPairs.isDiagonal(i.toLong * b + j, b) shouldBe (i == j)
  }
}
