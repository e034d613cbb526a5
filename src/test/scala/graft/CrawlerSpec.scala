package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.sources.Crawler

/** S4 crawler semantics: bounded BFS + visited-set dedup + fan-out cap
  * (reference producer_main.py:124-183), with the fetch layer injected as
  * a relation. */
class CrawlerSpec extends SparkSpec with Matchers {

  private def expandFrom(edges: DataFrame): DataFrame => DataFrame =
    frontier => frontier.join(edges, "did").select(col("did"), col("next"))

  test("BFS depths, seen-set dedup and iteration bound") {
    val s = spark
    import s.implicits._
    // 1 -> 2 -> 3 -> 4 chain, plus a back-edge 3 -> 1 (already seen)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 1L)).toDF("did", "next")
    val out = Crawler.crawl(Seq(1L).toDF("did"), expandFrom(edges),
      maxIterations = 2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2) // depth bound stops before 4
    val deep = Crawler.crawl(Seq(1L).toDF("did"), expandFrom(edges),
      maxIterations = 5).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    deep shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3) // revisit of 1 suppressed
  }

  test("fan-out cap keeps the smallest neighbor ids, deterministically") {
    val s = spark
    import s.implicits._
    val hub = (1L to 100L).map(i => (0L, i)).toDF("did", "next")
    val out = Crawler.crawl(Seq(0L).toDF("did"), expandFrom(hub),
      maxIterations = 1, maxFanout = 20).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.count(_._2 == 1) shouldBe 20 // MAX_LIKERS-style bound
    out.filter(_._2 == 1).keySet shouldBe (1L to 20L).toSet
  }
}
