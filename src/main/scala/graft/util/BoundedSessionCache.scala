package graft.util

/** Bounded keyed registry for session-lifetime cached state (materialized
  * graph projections, persisted ANN indexes): at most `maxEntries` live
  * values; inserting past the bound evicts the least-recently-used entry
  * and calls `release` on it (unpersist / cleanup). The reference's named
  * GDS projection and vector collection have exactly this drop-if-exists
  * lifecycle — the bound is what keeps a long-lived multi-query session
  * from accreting cached DataFrames forever (round-2 audit finding). */
final class BoundedSessionCache[K, V](maxEntries: Int, release: V => Unit) {
  private val entries = scala.collection.mutable.LinkedHashMap[K, V]()

  def getOrElseUpdate(key: K, build: => V): V = synchronized {
    entries.remove(key) match {
      case Some(v) =>
        entries.put(key, v) // re-insert → most recently used
        v
      case None =>
        val v = build
        entries.put(key, v)
        while (entries.size > maxEntries) {
          val (k0, old) = entries.head
          entries.remove(k0)
          release(old)
        }
        v
    }
  }

  /** Non-inserting lookup; refreshes recency on hit. */
  def peek(key: K): Option[V] = synchronized {
    entries.remove(key).map { v => entries.put(key, v); v }
  }

  /** Drop-if-exists: releases and forgets the entry. */
  def remove(key: K): Unit = synchronized {
    entries.remove(key).foreach(release)
  }

  def size: Int = synchronized(entries.size)
}
