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

  test("one materializing action per depth (plus the constant seed setup)") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("did", "next")
    // one Dataset action = one SQL execution id; broadcast-build sides and
    // AQE stage jobs inherit their parent action's id, so distinct ids
    // count ACTIONS, which is what the folded loop promises to bound
    val actions = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val id = js.properties.getProperty("spark.sql.execution.id")
        actions.add(if (id == null) "job-" + js.jobId else id)
        ()
      }
    }
    // AQE splits one action into one job per materialized stage — turn it
    // off here so the listener's job count maps 1:1 to driver actions
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      Crawler.crawl(Seq(1L).toDF("did"), expandFrom(edges), maxIterations = 3)
      // the listener bus is async: wait until the job count stabilizes
      var last = -1
      var spins = 0
      while (jobs.get() != last && spins < 50) {
        last = jobs.get(); Thread.sleep(100); spins += 1
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    }
    // seed setup: checkpoint + count = 2 actions; each of the 3 depths: one
    // materializing checkpoint + one block-count read = 2 actions. The old
    // shape (isEmpty + fresh checkpoint + visited checkpoint per depth) was
    // 3 heavyweight actions per depth — this assertion pins the folded loop
    actions.size() should be <= (2 + 3 * 2)
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
