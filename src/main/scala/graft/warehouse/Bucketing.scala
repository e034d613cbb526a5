package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed warehouse layout: co-located joins without a shuffle
  * (SURVEY.md §4 "physical-layout choices"; the 100 TB discipline of
  * pre-partitioning the fact tables on their join keys).
  *
  * `saveBucketed` writes a table hash-bucketed (and sorted) by the join
  * key through the session catalog; joins between two tables bucketed the
  * same way skip BOTH Exchange nodes (verified in BucketingSpec by plan
  * inspection). At 100 TB this converts every recurring fact⋈fact join
  * from a full network shuffle into a local zip of pre-sorted buckets.
  */
object Bucketing {

  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // idempotent across sessions: a fresh in-memory catalog doesn't know the
    // table, but its previous on-disk location may survive — clear both
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True if the executed plan of `df` contains no shuffle exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
