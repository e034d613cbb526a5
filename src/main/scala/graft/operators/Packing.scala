package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines — the step that fits
  * tokenized documents into fixed-budget training windows.
  *
  * Two tiers, one integer surface:
  *  - q71 (TextQueries.q71SequencePack) is CONCATENATE-AND-CUT: zero
  *    padding waste, but documents straddle window boundaries.
  *  - [[bestFitPack]] is bounded BEST-FIT-DECREASING bin packing — the
  *    production packing most trainers use when documents must stay
  *    whole: sort each lane's docs by (effective length desc, id asc),
  *    place each into the open bin with the SMALLEST residual that still
  *    fits (ties → smallest bin id), else open a new bin; when more than
  *    `maxOpen` bins are open, CLOSE the one with the smallest residual
  *    (ties → smallest id) — it is the least likely to fit anything in a
  *    decreasing stream, and the bound is what makes the packer
  *    STREAMING: per-lane state is O(maxOpen), not O(bins).
  *
  * Scale shape (the q71 lane discipline): the corpus routes to `lanes`
  * hash lanes; each lane packs independently behind ONE exchange
  * (repartition by lane + in-partition sort), so the only serialization
  * is per-lane and lanes scale with the cluster. Every quantity is an
  * exact integer — the whole placement is cross-engine decidable, which
  * is what puts q80 under the full DuckDB hash oracle (the oracle
  * replays the same fold as a recursive CTE).
  *
  * Documents longer than the budget are TRUNCATED to it (eff =
  * min(n_tokens, budget)) — the standard trainer contract; n_tokens is
  * preserved on the surface so truncation is visible.
  */
object Packing {

  /** Streaming bounded best-fit state for one lane. */
  private final class BfdState(budget: Long, maxOpen: Int) {
    private val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    private val res = scala.collection.mutable.ArrayBuffer.empty[Long]
    private var nextId = 1L

    def place(eff: Long): Long = {
      var best = -1
      var i = 0
      while (i < res.length) {
        if (res(i) >= eff &&
            (best < 0 || res(i) < res(best) ||
              (res(i) == res(best) && ids(i) < ids(best)))) best = i
        i += 1
      }
      if (best >= 0) { res(best) -= eff; ids(best) }
      else {
        val bin = nextId
        ids += bin
        res += (budget - eff)
        nextId += 1
        if (ids.length > maxOpen) {
          var worst = 0
          var j = 1
          while (j < res.length) {
            if (res(j) < res(worst) ||
                (res(j) == res(worst) && ids(j) < ids(worst))) worst = j
            j += 1
          }
          ids.remove(worst)
          res.remove(worst)
        }
        bin
      }
    }
  }

  /** Pack (doc_id, lane, n_tokens) rows into fixed-budget bins per lane.
    * Returns the TOTAL per-doc surface (doc_id, lane, n_tokens,
    * eff_tokens, bin) — bin ids are 1-based per lane in open order. */
  def bestFitPack(docs: DataFrame, budget: Long = 512L, maxOpen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id").cast("long"), col("lane").cast("long"),
        col("n_tokens").cast("long"),
        least(col("n_tokens"), lit(budget)).cast("long").as("eff"))
      .as[(Long, Long, Long, Long)]
    base
      // ONE exchange: lanes colocate, then the in-partition sort gives
      // each lane its decreasing stream (lanes stay contiguous because
      // lane leads the sort key); the fold below is O(maxOpen) state
      .repartition(col("lane"))
      .sortWithinPartitions(col("lane"), col("eff").desc, col("doc_id").asc)
      .mapPartitions { it =>
        var curLane = Long.MinValue
        var state: BfdState = null
        it.map { case (docId, laneId, nTok, eff) =>
          if (state == null || laneId != curLane) {
            curLane = laneId
            state = new BfdState(budget, maxOpen)
          }
          (docId, laneId, nTok, eff, state.place(eff))
        }
      }
      .toDF("doc_id", "lane", "n_tokens", "eff_tokens", "bin")
  }
}
