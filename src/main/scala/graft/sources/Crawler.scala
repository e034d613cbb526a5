package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Checkpointer.CheckpointSyntax

/** S4 — the reference crawler's DATA semantics as a distributed operator
  * (reference crawl loop at project/kafka/producer_main.py:124-183):
  * bounded-depth BFS frontier expansion with visited-set dedup
  * (`seen_users`-style `if did in seen: continue` ≙ anti-join against the
  * visited table) and a deterministic per-source fan-out cap
  * (MAX_LIKERS ≙ smallest-id row_number cut, the same bound the salted
  * projection applies to hot posts).
  *
  * The HTTP transport itself stays out-of-engine (SURVEY §2.1 S4 —
  * zero-egress build): `expand` is the injectable fetch layer mapping a
  * frontier of ids to (did, next) neighbor candidate pairs. A real
  * deployment backs it with an HTTP-calling `mapPartitions` (one client
  * per partition, exactly the per-batch shape of
  * [[graft.multimodal.Multimodal.extractFeatures]]); specs and local runs
  * back it with a relation. Visited state is a DataFrame, not a driver
  * set — the frontier, the cap and the dedup all shuffle on `did`, so the
  * crawl scales with the cluster instead of one process's memory.
  */
object Crawler {

  /** @param seeds one `did` column; depth-0 frontier
    * @param expand frontier (did) → candidate (did, next) neighbor pairs
    * @param maxIterations reference MAX_ITERATIONS (bounded propagation)
    * @param maxFanout per-source candidate cap (reference MAX_LIKERS):
    *                  the smallest `next` ids win, deterministically
    * @return (did, depth) — every visited id with its first-visit depth */
  def crawl(seeds: DataFrame, expand: DataFrame => DataFrame,
      maxIterations: Int = 2, maxFanout: Int = 20): DataFrame = {
    var visited = seeds.select(col("did")).distinct()
      .withColumn("depth", lit(0)).cp()
    var visitedCount = visited.count()
    var frontierSize = visitedCount // depth-0 frontier = the seeds
    var depth = 0
    while (depth < maxIterations && frontierSize > 0) {
      val frontier = visited.filter(col("depth") === depth).select(col("did"))
      val w = Window.partitionBy(col("did")).orderBy(col("next"))
      val fresh = expand(frontier)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxFanout) // fan-out bound BEFORE the dedup
        .select(col("next").as("did")).distinct()
        .join(visited, Seq("did"), "left_anti") // seen-set semantics
        .withColumn("depth", lit(depth + 1))
      // ONE materializing action per depth: checkpoint the union
      // (truncating both lineages at once — the per-depth fresh checkpoint
      // is folded in) and drive the loop off the checkpointed size delta
      // instead of a separate isEmpty job; the next frontier is re-derived
      // from the materialized union by a depth filter, never recomputed
      val prev = visited
      visited = visited.union(fresh).cp()
      graft.util.BlockRelease.release(prev) // superseded by the new union
      val n = visited.count() // reads the materialized blocks, no re-run
      frontierSize = n - visitedCount
      visitedCount = n
      depth += 1
    }
    visited
  }
}
