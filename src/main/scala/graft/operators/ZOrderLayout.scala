package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout — the multi-dimensional clustering
  * key that makes a 100 TB table prunable on MORE THAN ONE column at
  * once. A table range-partitioned on the interleaved key and written
  * with parquet min/max stats gives every file a bounded rectangle in
  * (x, y) space — dropping the low `bits` of an interleave is EXACTLY a
  * 2^(bits/2) × 2^(bits/2) tile — so a predicate on either dimension
  * (or both) skips all files whose tile misses it. Plain sort-by-x
  * layouts prune only x; this is the layout Delta/Iceberg OPTIMIZE
  * ZORDER produces, built here from nothing but codegen'd bit
  * arithmetic (shiftleft/shiftright/AND — no UDF, no shuffle beyond the
  * one range exchange any layout write needs).
  *
  * Everything is integer: quantization is `x·2^bits DIV (max+1)`
  * (integer division — never floor of a float division, whose
  * nearest-double rounding can land ON an integer the true rational sits
  * just below), the interleave is a literal sum of masked shifts, and so
  * the whole surface replays in any engine (q91's oracle).
  */
object ZOrderLayout {

  /** Morton interleave of two already-quantized non-negative columns in
    * [0, 2^bits): bit i of x lands at 2i, bit i of y at 2i+1. A sum of
    * 2·bits masked-shift terms — folds into one codegen'd expression. */
  def zValue(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1,31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Quantize a non-negative column to [0, 2^bits) against an inclusive
    * max (integer division; requires c·2^bits < 2^63). Column-name based
    * because Scala Columns have no integer-division operator. */
  def quantize(colName: String, maxName: String, bits: Int): Column =
    expr(s"CAST($colName * ${1L << bits} DIV ($maxName + 1) AS BIGINT)")

  /** Physically lay `df` out along the z-curve of two numeric columns:
    * one range exchange on z + in-partition sort, which is the minimum
    * any clustered write pays. Downstream `.write.parquet` then yields
    * files whose (x, y) min/max stats are tile-bounded. */
  def layoutByZ(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 8): DataFrame = {
    val mx = df.agg(max(col(xCol)).as("zmx"), max(col(yCol)).as("zmy"))
    val z = df.crossJoin(broadcast(mx))
      .withColumn("__z",
        zValue(quantize(xCol, "zmx", bits), quantize(yCol, "zmy", bits), bits))
      .drop("zmx", "zmy")
    z.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
