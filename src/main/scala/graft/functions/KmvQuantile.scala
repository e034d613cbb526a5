package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QUANTILE SKETCH over a k-minimum-values uniform sample — the
  * distributed answer to "median / p90 of a 100 TB column" when the full
  * sort is off the table. The k rows with the smallest md5 key-hashes
  * are a uniform-without-replacement sample of the key space (the KMV
  * argument behind q55), harvested by ONE TakeOrderedAndProject —
  * per-partition top-k heads + a driver merge of k·partitions candidates
  * — no global sort, no shuffle of the data. Sample quantiles then
  * converge to the true ones at the DKW rate (ε ≈ √(ln(2/δ)/2k): ~4 %
  * at k=1024, 95 % band — the bound KmvQuantileSpec pins).
  *
  * Mergeable like every KMV structure: the union's k smallest hashes are
  * a subset of the per-split k smallest, so partial samples combine by
  * keep-smallest-k — same algebra, same determinism.
  *
  * Determinism contract (q55/q87/q88 discipline): the hash is the
  * md5-prefix u64 of the ROW KEY (not the value — equal values stay
  * distinguishable, so selection has no ties for any engine to break
  * differently), the rank index is `ceil(p·k/100)` in integers, and no
  * arithmetic ever touches the sampled values themselves — the estimate
  * IS a value from the data, bit-identical everywhere.
  */
object KmvQuantile {

  /** (pct, rn, est_value, k) for each percentile in `pcts`, from the
    * k-minimum-hash sample of `keyHashCol` ordered by `valueCol`.
    * `keyHashCol` must be a unique-per-row u64-in-long hash column. */
  def quantiles(df: DataFrame, keyHashCol: String, valueCol: String,
      k: Int, pcts: Seq[Int]): DataFrame = {
    require(k > 0, "sample size must be positive")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), "pcts in [1,100]")
    val sample = df.orderBy(col(keyHashCol)).limit(k) // TakeOrderedAndProject
    val ranked = sample.select(
      col(valueCol).as("v"),
      row_number().over(Window.orderBy(col(valueCol), col(keyHashCol))).as("rn"),
      count(lit(1)).over(Window.partitionBy()).as("n"))
    val idx = ranked.select(
      col("v"), col("rn"), col("n"),
      explode(array(pcts.map(lit): _*)).as("pct"))
    idx.filter(col("rn") === expr("CAST((pct * n + 99) DIV 100 AS BIGINT)")) // ceil(pct·n/100)
      .select(col("pct").cast("long").as("pct"), col("rn").cast("long").as("rn"),
        col("v").as("est_value"), col("n").cast("long").as("k"))
  }
}
