package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of the storage blocks behind a finished
  * DataFrame.
  *
  * `Dataset.unpersist` only covers `cache()`/`persist()` entries in the
  * CacheManager; the blocks materialized by `localCheckpoint()` belong to
  * an internal RDD that only the async ContextCleaner reclaims — after a
  * driver GC, on a 30-minute default period. Long sessions that invoke
  * checkpoint-using operators repeatedly (every iterative graph algorithm
  * here, the dedup banding, the crawler) accumulate those blocks until
  * memory pressure drags every later job: measured on this repo, the 5th+
  * consecutive label-propagation call went 1.2 s → 5.5 s from exactly
  * this. Operators therefore release their scratch state explicitly the
  * moment a downstream checkpoint makes it unreachable.
  *
  * CAUTION: releasing a checkpointed DF whose blocks a LAZY (not yet
  * materialized) downstream plan still needs destroys that plan's only
  * data source (checkpointing truncated the lineage). Call this only once
  * every consumer has materialized.
  */
object BlockRelease {

  /** RDD ids whose storage blocks survive [[release]] (r16 — the q73
    * session memo): callers legitimately release frames DERIVED from a
    * memoized checkpointed frame, and the leaf-walking release would
    * otherwise destroy the memo's only data source (checkpointing
    * truncated its lineage). Bounded by the memos' own LRU bounds —
    * eviction unprotects before releasing. */
  private val protectedIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Shield every checkpoint block reachable from `df`'s plan leaves
    * from [[release]] — for session-memoized frames only. */
  def protect(df: DataFrame): Unit =
    leafRdds(df).foreach(r => protectedIds.add(r.id))

  /** Undo [[protect]]; call before releasing an evicted memo entry. */
  def unprotect(df: DataFrame): Unit =
    leafRdds(df).foreach(r => protectedIds.remove(r.id))

  private def leafRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    try df.queryExecution.logical.collectLeaves().collect {
      case l: LogicalRDD => l.rdd
    } catch { case _: Exception => Seq.empty }

  /** Release cache entries AND checkpoint blocks reachable from `df`'s
    * plan leaves. Safe to call twice; never throws. */
  def release(df: DataFrame): Unit = {
    try df.unpersist(blocking = false)
    catch { case _: Exception => () }
    try df.queryExecution.logical.collectLeaves().foreach {
      case l: LogicalRDD if !protectedIds.contains(l.rdd.id) =>
        try { l.rdd.unpersist(blocking = false); () }
        catch { case _: Exception => () }
      case _ => ()
    } catch { case _: Exception => () }
  }

  def release(dfs: Seq[DataFrame]): Unit = dfs.foreach(release)
}
