package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse mutation operators over immutable columnar storage
  * (SURVEY.md §2.10 M1–M3; reference SQL at project/db/postgres.py:38-47,
  * project/postgres/community.py:52-59).
  *
  * Parquet is append-only, so SCD-2 "UPDATE ... SET valid_to = now()" becomes
  * read-transform-overwrite of the current snapshot — expressed as pure
  * DataFrame transforms here (the caller owns the write). The `keys` side is
  * a DataFrame, not a collected list: at 100 TB the expiry set is itself
  * large, and a broadcast-or-shuffle semi-join is the only formulation that
  * scales (the reference's `ANY(:ids)` array param is a driver-side
  * collect in disguise).
  */
object Scd2 {

  /** M1 — close open intervals for the given keys: rows whose `keyCol` is
    * in `keys` and whose valid_to IS NULL get valid_to = `at`. */
  def expire(current: DataFrame, keys: DataFrame, keyCol: String,
      at: Column): DataFrame = {
    val marked = keys.select(col(keyCol)).distinct()
      .withColumn("__expire", lit(true))
    current.join(marked, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("__expire").isNotNull && col("valid_to").isNull, at)
          .otherwise(col("valid_to")))
      .select(current.columns.map(col): _*) // join put the key first; restore order
  }

  /** M1 full step: expire current rows for keys present in `incoming`,
    * then append the incoming rows as new open intervals. */
  def scd2Merge(current: DataFrame, incoming: DataFrame, keyCol: String,
      at: Column): DataFrame = {
    val expired = expire(current, incoming.select(col(keyCol)), keyCol, at)
    val opened = incoming
      .withColumn("valid_from", at)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .select(expired.columns.map(col): _*)
    expired.unionByName(opened)
  }

  /** M2 — idempotent insert (ON CONFLICT DO NOTHING): anti-join before
    * append. */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame,
      keyCols: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing, keyCols, "left_anti")
        .dropDuplicates(keyCols))

  /** Point-in-time view of an SCD-2 table. */
  def asOf(table: DataFrame, at: Column): DataFrame =
    table.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
