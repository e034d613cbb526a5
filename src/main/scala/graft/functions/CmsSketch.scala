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
  * Hashing is md5-derived — ONE u60 `md5("cms:" + token)` 15-hex-char
  * prefix per occurrence (the q92/KMV u60 discipline), with hash row r
  * reading bits [15r, 15r+15) (four disjoint 15-bit words ⇒ d ≤ 4,
  * w ≤ 2^15; power-of-two w divides 2^15 ⇒ exactly uniform buckets) —
  * so any engine replays the grid bit-for-bit: the sketch itself goes
  * under the q55/KMV-style EXACT oracle (deterministic given the hash
  * family), not just an error-bound pin. One digest + one hex parse
  * instead of d of each (r12): md5 and `conv` dominate the build (the
  * scan is one pruned column), and the digest must be materialized in a
  * PROJECTION BELOW the explode — a generator expression gets no
  * codegen subexpression elimination, so d "shared" md5 calls inside
  * `explode(array(...))` really execute d times (measured 1.9 → 0.9 s
  * on the sf0.1 lineitem build). Disjoint bits of one strong hash keep
  * the pairwise independence the CM analysis needs. Reference analog:
  * the reference keeps
  * exact counts in Postgres (A2-style aggregates, postgres/community.py)
  * — tractable at its scale; this is the operator that replaces them
  * when the vocabulary itself is shuffle-hostile.
  */
object CmsSketch {

  /** The shared u60 digest: first 15 hex chars of `md5("cms:" + token)`
    * parsed as a long. Compute this ONCE per token in a projection, then
    * slice rows out of it with [[bucket]] (also the streaming grid's
    * hash — graft.streaming.Streams.windowedTokenCms must produce
    * bit-identical cells for streaming ≡ batch). */
  private[graft] def hash60(tok: Column): Column =
    conv(substring(md5(concat(lit("cms:"), tok)), 1, 15), 16, 10).cast("long")

  /** Bucket of hash row r from a materialized [[hash60]] column: the
    * r-th 15-bit word, mod w. Pure bit arithmetic — codegen'd longs,
    * no strings past the hash60 projection. */
  private[graft] def bucket(r: Int, u60: Column, w: Int): Column =
    shiftrightunsigned(u60, 15 * r).bitwiseAND(lit((1L << 15) - 1)) % w

  private[graft] def requireDims(d: Int, w: Int): Unit =
    require(d > 0 && d <= 4 && w > 0 && w <= (1 << 15),
      "sketch dims: 0 < d <= 4 (15-bit words of one u60 digest), 0 < w <= 32768")

  /** Build the d×w counter grid from a 1-column token frame
    * (`tokCol`: one row per token OCCURRENCE). Returns (r, b, c) —
    * ≤ d·w rows. d ≤ 4: rows are disjoint 15-bit words of one digest. */
  def sketch(toks: DataFrame, tokCol: String, d: Int = 3, w: Int = 512): DataFrame = {
    requireDims(d, w)
    toks.select(hash60(col(tokCol)).as("_u60"))
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col("_u60"), w).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** JOIN-SIZE ESTIMATE from two grids over the SAME (d, w, hash
    * family): est |A ⋈_key B| = min_r Σ_b gridA(r,b)·gridB(r,b)
    * (Cormode & Muthukrishnan §4.2 inner-product estimation). Always an
    * OVERestimate (cross terms only add), so `est ≥ true` is decidable —
    * and at 100 TB this is the shuffle-vs-broadcast decision input: two
    * fixed-size summaries answer the cardinality question no scan has to.
    * Returns one row (est_join_size), lazily.
    *
    * FULL-OUTER cell join (r12): cells absent from one side read 0, so
    * their products vanish — which makes a hash row with ZERO bucket
    * overlap contribute a provable 0 to the min through its own
    * non-overlapping cells, with NO row-id scaffolding. This closes the
    * r11 phantom-row hole structurally: row ids come only from cells an
    * actual grid produced, so a row that was never built cannot appear,
    * and a caller-passed d cannot disagree with the build (there is no
    * d parameter). Every build row 0..d−1 appears in every non-empty
    * grid by construction (each token occurrence lands in all d rows),
    * so the outer union covers exactly the build rows. One grid empty →
    * all products 0 → est 0 (admissible: the true join is 0). Both
    * empty → no rows → `coalesce` floors the min to 0, never NULL.
    *
    * Stays ONE lazy plan — r11's separate d-derivation action
    * re-executed both uncached grid lineages before the estimate plan
    * built them again (3.2× on q96), and an eager persist-then-collect
    * repair loses the stage parallelism a single job gets for free
    * (grid builds and the caller's other branches schedule
    * concurrently). Each grid lineage appears exactly once here. */
  def joinSizeEstimate(gridA: DataFrame, gridB: DataFrame): DataFrame = {
    val perRow = gridA.select(col("r"), col("b"), col("c").as("ca"))
      .join(gridB.select(col("r"), col("b"), col("c").as("cb")),
        Seq("r", "b"), "full_outer")
      .groupBy(col("r"))
      .agg(sum(coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L))).as("ip"))
    perRow.agg(coalesce(min(col("ip")), lit(0L)).as("est_join_size"))
  }

  /** The grid as ONE broadcastable row — map (r·w + b) → c, ≤ d·w
    * entries by construction — for MAP-SIDE per-occurrence probing via
    * [[estimateFromMap]]. This is q109's candidate generator: token
    * occurrences probe the broadcast map BEFORE any exchange, so the
    * open vocabulary never crosses the wire (the thing [[estimates]]'
    * probe-frame join cannot avoid when the probe set IS the vocab).
    *
    * The (d, w) pair MUST match the grid's build dims and the probe's
    * [[estimateFromMap]] dims — the map key space is r·w + b, so a w
    * mismatch between the two sides silently coalesces every lookup to
    * 0. `requireDims` here (and the d parameter, unused by the layout
    * but validated) makes a mismatched call fail loudly at plan time
    * instead. */
  def gridAsMap(grid: DataFrame, d: Int = 3, w: Int = 512): DataFrame = {
    requireDims(d, w)
    grid.agg(map_from_entries(collect_list(
      struct((col("r") * w + col("b")).as("k"), col("c").as("v")))).as("cms_map"))
  }

  /** Map-side point estimate against a [[gridAsMap]] column: d
    * element_at lookups + least — pure codegen, zero shuffle, absent
    * cells (and the empty-grid empty map) read 0. `u60Col` should be a
    * materialized [[hash60]] projection (the q87 r12 CSE discipline). */
  def estimateFromMap(u60Col: Column, cmsMap: Column, d: Int = 3,
      w: Int = 512): Column = {
    requireDims(d, w)
    val cells = (0 until d).map(r =>
      coalesce(element_at(cmsMap, lit(r.toLong * w) + bucket(r, u60Col, w)),
        lit(0L)))
    if (d == 1) cells.head else least(cells: _*)
  }

  /** Point-query the grid for every token in `probes` (a 1-column frame
    * of DISTINCT tokens): (token, est_count). The GRID broadcasts (≤ d·w
    * rows by construction — that fixed size is the whole point of the
    * sketch); absent (r, b) cells read 0. */
  def estimates(grid: DataFrame, probes: DataFrame, tokCol: String,
      d: Int = 3, w: Int = 512): DataFrame = {
    requireDims(d, w)
    val pb = probes.select(col(tokCol).as("token"))
      .select(col("token"), hash60(col("token")).as("_u60"))
      .select(col("token"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col("_u60"), w).as("b"))): _*)).as("rb"))
      .select(col("token"), col("rb.r").as("r"), col("rb.b").as("b"))
    pb.join(broadcast(grid), Seq("r", "b"), "left")
      .select(col("token"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("token"))
      .agg(min(col("c")).as("est_count"))
  }
}
