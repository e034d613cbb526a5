package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) distinct-count
  * sketch — completing the mergeable-summary tier alongside KMV
  * ([[KmvSketch]], q55) and count-min ([[CmsSketch]], q87). At 100 TB an
  * exact `COUNT(DISTINCT token)` shuffles the whole vocabulary; the HLL
  * register table is a FIXED m-row summary whose partial aggregation
  * (per-partition max per bucket) IS the sketch merge, so the exchange
  * moves ≤ m rows per partition regardless of corpus size.
  *
  * Determinism contract (the q55/q87 discipline — an EXACT oracle over an
  * approximate operator): the 60-bit hash is md5-derived
  * (`u60(md5("hll:" + v))`, first 15 hex chars — 60 bits so the signed-64
  * parse is engine-portable), split 9 bucket bits (m = 512) + 51 rank
  * bits. rank = leading-zeros(suffix)+1 = 52 − bitlength(suffix)
  * (52 when the suffix is all-zero), computed with pure integer/string
  * ops (`bin()` + `length()`) in both engines — no floats until the final
  * single-division estimate, which both engines fold from the SAME
  * literal expression (IEEE-identical). The harmonic denominator is kept
  * as the INTEGER Σ 2^(52−M[b]) (≤ m·2^52 = 2^61, exact in BIGINT; empty
  * buckets contribute 2^52) so the cross-row aggregation is an
  * associative integer sum — the q77 float-sum trap never opens.
  *
  * Standard error 1.04/√m ≈ 4.6 % at m = 512; the small-range regime
  * (est ≤ 5m/2 with empty registers, where linear counting would take
  * over) is surfaced as a boolean rather than computed — its m·ln(m/V)
  * estimate is the one shape whose libm dependence the integer surface
  * cannot pin.
  *
  * Reference analog: exact Postgres counts (postgres/community.py) —
  * fine at reference scale; this replaces them when the key space itself
  * is shuffle-hostile.
  */
object HllSketch {

  /** Bucket bits; m = 2^P registers. */
  val P = 9
  val M: Int = 1 << P          // 512
  val RankBits = 51            // 60-bit hash = P bucket bits + 51 rank bits
  val MaxRank: Int = RankBits + 1 // all-zero suffix

  private def h60(v: Column): Column =
    conv(substring(md5(concat(lit("hll:"), v)), 1, 15), 16, 10).cast("long")

  /** Register table from a 1-column frame of values (duplicates fine):
    * (b, reg) with reg = max rank, ≤ m rows. The groupBy's map-side
    * combine is the per-partition sketch; the exchange moves registers,
    * not values. */
  def registers(vals: DataFrame, valCol: String): DataFrame = {
    val h = h60(col(valCol))
    val sfx = h.bitwiseAND(lit((1L << RankBits) - 1))
    vals
      .select(
        shiftright(h, RankBits).as("b"),
        when(sfx === 0L, lit(MaxRank))
          .otherwise(lit(MaxRank) - length(bin(sfx)))
          .cast("int")
          .as("rank"))
      .groupBy(col("b"))
      .agg(max(col("rank")).as("reg"))
  }

  /** GROUPED registers: one ≤m-row register table per key — the sketch
    * as a per-key aggregate (distinct-users-per-X at 100 TB: the
    * exchange moves ≤ m rows per key per partition, never user ids). */
  def groupedRegisters(vals: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val h = h60(col(valCol))
    val sfx = h.bitwiseAND(lit((1L << RankBits) - 1))
    vals
      .select(col(keyCol),
        shiftright(h, RankBits).as("b"),
        when(sfx === 0L, lit(MaxRank))
          .otherwise(lit(MaxRank) - length(bin(sfx)))
          .cast("int")
          .as("rank"))
      .groupBy(col(keyCol), col("b"))
      .agg(max(col("rank")).as("reg"))
  }

  /** Per-key summary from grouped registers: (key, m, v_zero, s_harm,
    * est_hll, lc_range) — same integer surface as [[summary]]. */
  def groupedSummary(regs: DataFrame, keyCol: String): DataFrame = {
    val twoP52 = 1L << 52
    regs
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("long").as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), 52 - reg)")).as("s_present"))
      .select(col(keyCol),
        lit(M.toLong).as("m"),
        (lit(M.toLong) - col("n_present")).as("v_zero"),
        (col("s_present") + (lit(M.toLong) - col("n_present")) * lit(twoP52))
          .as("s_harm"))
      .select(col(keyCol), col("m"), col("v_zero"), col("s_harm"),
        floor(
          lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(512.0) * lit(512.0) * lit(4503599627370496.0) /
            col("s_harm").cast("double"))
          .cast("long").as("est_hll"),
        (col("v_zero") > 0).as("lc_range"))
  }

  /** One-row summary from a register table: m, v_zero (empty registers),
    * s_harm (integer harmonic denominator Σ 2^(52−M[b]), empties reading
    * 2^52), est_hll = ⌊α_m·m²·2^52 / s_harm⌋. */
  def summary(regs: DataFrame): DataFrame = {
    val twoP52 = 1L << 52
    regs
      .agg(
        count(lit(1)).cast("long").as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), 52 - reg)")).as("s_present"))
      .select(
        lit(M.toLong).as("m"),
        (lit(M.toLong) - col("n_present")).as("v_zero"),
        (col("s_present") + (lit(M.toLong) - col("n_present")) * lit(twoP52))
          .as("s_harm"))
      .select(
        col("m"), col("v_zero"), col("s_harm"),
        // α_512·m²·2^52 / s_harm, folded from the same literals both engines
        floor(
          lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(512.0) * lit(512.0) * lit(4503599627370496.0) /
            col("s_harm").cast("double"))
          .cast("long").as("est_hll"),
        // the regime where linear counting would take over (surfaced, not
        // computed — see scaladoc)
        (col("v_zero") > 0).as("lc_range"))
  }
}
