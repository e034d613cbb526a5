package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a token stream —
  * the MERGEABLE-SUMMARY tier for frequency queries at 100 TB, where the
  * exact token groupBy's key space (vocabulary ∝ corpus) no longer fits
  * a reducer but a d×w counter grid always does.
  *
  * The Spark shape IS the sketch algebra: the `groupBy(r, b).count`
  * partial aggregation builds one LOCAL sketch per partition (≤ d·w
  * summary rows each — the map-side combine is the CMS merge, counters
  * add), the exchange moves only those fixed-size summaries (shuffle
  * ∝ partitions·d·w, NOT tokens), and the final aggregation is the
  * cluster-wide merge. Estimates then read d cells per probe token:
  * est(t) = min_r grid(r, h_r(t)) ≥ true(t) always (admissibility), with
  * overestimate ≤ ε·N at w = ⌈e/ε⌉ w.p. 1−(1/2)^d.
  *
  * Hashing is md5-derived (`u32(md5("cms:r:" + token)) mod w`) so any
  * engine replays the grid bit-for-bit — the sketch itself goes under
  * the q55/KMV-style EXACT oracle (deterministic given the hash family),
  * not just an error-bound pin. Reference analog: the reference keeps
  * exact counts in Postgres (A2-style aggregates, postgres/community.py)
  * — tractable at its scale; this is the operator that replaces them
  * when the vocabulary itself is shuffle-hostile.
  */
object CmsSketch {

  /** u32 bucket of a token under hash row r (md5-replayable). */
  private def bucket(r: Int, tok: Column, w: Int): Column =
    conv(substring(md5(concat(lit(s"cms:$r:"), tok)), 1, 8), 16, 10)
      .cast("long") % w

  /** Build the d×w counter grid from a 1-column token frame
    * (`tokCol`: one row per token OCCURRENCE). Returns (r, b, c) —
    * ≤ d·w rows. */
  def sketch(toks: DataFrame, tokCol: String, d: Int = 3, w: Int = 512): DataFrame = {
    require(d > 0 && w > 0, "sketch dims must be positive")
    toks.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col(tokCol), w).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** JOIN-SIZE ESTIMATE from two grids over the SAME (d, w, hash
    * family): est |A ⋈_key B| = min_r Σ_b gridA(r,b)·gridB(r,b)
    * (Cormode & Muthukrishnan §4.2 inner-product estimation). Always an
    * OVERestimate (cross terms only add), so `est ≥ true` is decidable —
    * and at 100 TB this is the shuffle-vs-broadcast decision input: two
    * fixed-size summaries answer the cardinality question no scan has to.
    * Returns one row (est_join_size). Inner join on (r, b) — absent
    * cells contribute 0, INCLUDING whole hash rows with zero overlap:
    * the per-row inner products are left-joined back onto the full row-id
    * range 0..d−1 with `coalesce(ip, 0)` so a disjoint row contributes a
    * provable 0 to the min (and fully disjoint grids estimate 0, never
    * NULL). `d` is DERIVED from the grids themselves (max row id + 1
    * across both, one tiny agg over ≤ d·w-row frames — r11, ADVICE: a
    * caller-passed d larger than the build dimension manufactured
    * phantom all-zero rows, silently breaking the overestimate
    * invariant; deriving makes the mismatch unrepresentable). Every
    * build row 0..d−1 appears in a non-empty grid by construction
    * (each token occurrence lands in all d rows), so the derived d is
    * the build d whenever either input sketched at least one token;
    * two empty grids estimate 0 via the d = 1 floor. */
  def joinSizeEstimate(gridA: DataFrame, gridB: DataFrame): DataFrame = {
    val d = gridA.select(col("r")).unionAll(gridB.select(col("r")))
      .agg(coalesce(max(col("r")) + 1, lit(1))).collect()(0).getInt(0)
    val perRow = gridA.select(col("r"), col("b"), col("c").as("ca"))
      .join(gridB.select(col("r"), col("b"), col("c").as("cb")), Seq("r", "b"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
    val rowIds = gridA.sparkSession.range(d).select(col("id").cast("int").as("r"))
    broadcast(rowIds).join(perRow, Seq("r"), "left")
      .select(coalesce(col("ip"), lit(0L)).as("ip"))
      .agg(min(col("ip")).as("est_join_size"))
  }

  /** Point-query the grid for every token in `probes` (a 1-column frame
    * of DISTINCT tokens): (token, est_count). The GRID broadcasts (≤ d·w
    * rows by construction — that fixed size is the whole point of the
    * sketch); absent (r, b) cells read 0. */
  def estimates(grid: DataFrame, probes: DataFrame, tokCol: String,
      d: Int = 3, w: Int = 512): DataFrame = {
    val pb = probes.select(col(tokCol).as("token"))
      .select(col("token"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col("token"), w).as("b"))): _*)).as("rb"))
      .select(col("token"), col("rb.r").as("r"), col("rb.b").as("b"))
    pb.join(broadcast(grid), Seq("r", "b"), "left")
      .select(col("token"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("token"))
      .agg(min(col("c")).as("est_count"))
  }
}
