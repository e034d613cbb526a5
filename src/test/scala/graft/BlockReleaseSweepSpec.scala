package graft

import org.scalatest.matchers.should.Matchers

/** Round-4 root-caused a whole leak class: `Dataset.unpersist` never
  * releases `localCheckpoint` blocks, so checkpoint-per-call operators
  * stacked blocks for the session's life (see `util.BlockRelease`). This
  * spec turns the per-operator release discipline into a PERMANENT
  * regression gate: one full `SparkEntry.queries` sweep in one session
  * must leave the block manager exactly where it started.
  *
  * The contract split it pins:
  *  - OPERATOR responsibility: scratch state (bucket rows, candidate
  *    edges, iteration frontiers) is released inside the operator the
  *    moment the output makes it unreachable. A scratch leak is invisible
  *    to the caller and unbounded across calls — the round-4 class.
  *  - CALLER responsibility: several operators return an OUTPUT-sized
  *    `localCheckpoint` (lineage-free result; what lets them release big
  *    scratch eagerly). The consumer releases it after materializing —
  *    done here via `BlockRelease.release(result)`, which reaches exactly
  *    the result's own checkpoint leaves and nothing upstream.
  *
  * The three deliberate session caches (graph projection via q13, IVF
  * index via q26, the q73 canonicalization memo — r16) are warmed BEFORE
  * the baseline snapshot, so any persistent-RDD growth over the sweep is
  * a leak by definition.
  * `SparkContext.unpersistRDD` drops ids from `getPersistentRDDs`
  * synchronously (only block deletion is async), so the assertion is
  * race-free even with `blocking = false` releases.
  */
class BlockReleaseSweepSpec extends SparkSpec with Matchers {

  test("full SparkEntry.queries sweep leaks no storage blocks beyond the session caches") {
    val dir = "/root/testdata/sf0.001"
    val sc = spark.sparkContext
    // warm the deliberate session caches so they are in the baseline
    Seq("q13_degrees", "q26_ann_ivf", "q73_dedup_clusters").foreach { n =>
      val r = SparkEntry.queries(n)(spark, dir); r.count()
      graft.util.BlockRelease.release(r)
    }
    // probe-query timing, fresh side (round-5 "sweep inflation" gate):
    // median of 5 runs of a small fixed query BEFORE the sweep...
    def probeMedian(): Double = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val r = SparkEntry.queries("q29_asof_planned")(spark, dir)
        r.count()
        graft.util.BlockRelease.release(r)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(2)
    }
    val freshProbe = probeMedian()
    val baseline = sc.getPersistentRDDs.keySet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(s"query $name failed: ") {
        val r = fn(spark, dir)
        r.count()
        graft.util.BlockRelease.release(r) // caller-side result release
      }
      spark.streams.resetTerminated() // the Bench loop's between-query hygiene
    }
    // ...and AFTER: whatever a full sweep accumulates must not slow later
    // queries. 1.5× is the driver-contract bound; the absolute floor keeps
    // a sub-second probe's scheduler jitter (shared session, concurrent
    // suites) from flaking the ratio.
    val postProbe = probeMedian()
    withClue(f"probe q29 fresh=$freshProbe%.3f s vs post-sweep=$postProbe%.3f s — " +
        "a full-session sweep left state that slows later queries: ") {
      assert(postProbe <= math.max(freshProbe * 1.5, freshProbe + 1.5))
    }
    // suites share this SparkSession and sbt runs them concurrently, so
    // another suite's in-flight scratch can appear in the snapshot —
    // transient blocks drain within their suite's own release discipline,
    // while a REAL leak persists through every retry
    var leakedIds = sc.getPersistentRDDs.keySet -- baseline
    var tries = 0
    while (leakedIds.nonEmpty && tries < 40) {
      Thread.sleep(500); tries += 1
      leakedIds = sc.getPersistentRDDs.keySet -- baseline
    }
    val after = sc.getPersistentRDDs
    val leaked = leakedIds.filter(after.contains)
      .map(id => s"$id=${after(id).toString.linesIterator.mkString(" | ").take(400)}")
    withClue(s"RDD ids left persistent by the sweep: $leaked — some " +
        "operator checkpointed or cached scratch state without releasing it: ") {
      leaked shouldBe empty
    }
  }
}
