package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 surfaces here as a named query; each
  * SQL-expressible one carries a DuckDB oracle in [[oracleSql]] (driver
  * hash-matches at sf0.01). Non-SQL-expressible operators (iterative graph
  * algorithms, hash-seeded sketches) are registered without an oracle →
  * rows-only check + ScalaTest golden/invariant specs.
  */
object SparkEntry {

  /** Flagship on sf0.001: the J1 co-engagement projection (the reference's
    * central graph build, project/metrics/community_detection.py:22-38). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q05Coengagement(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++
      VectorQueries.defs ++
      TextQueries.defs

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      VectorQueries.oracles ++
      TextQueries.oracles
}
