package graft.util

/** Path-compressing union–find with MIN-id roots — the component label is
  * always the smallest member, matching GraphX CC's min-vertex-id
  * convention. One implementation for the five call sites (connected
  * components, Kruskal MSTs, Borůvka's driver merge, DBSCAN cores) that
  * previously each carried their own copy of the compression loop. */
object UnionFind {

  /** Over sparse Long ids (absent id ≙ its own root). */
  final class Longs {
    private val root = new scala.collection.mutable.LongMap[Long]()

    def find(x: Long): Long = {
      var r = x
      while (root.getOrElse(r, r) != r) r = root(r)
      var c = x
      while (root.getOrElse(c, c) != r) { val nx = root(c); root(c) = r; c = nx }
      r
    }

    /** @return true if two components merged (false: already joined) */
    def union(a: Long, b: Long): Boolean = {
      val ra = find(a)
      val rb = find(b)
      if (ra == rb) false
      else { root(math.max(ra, rb)) = math.min(ra, rb); true }
    }
  }

  /** Over dense Int indices 0 until n. */
  final class Ints(n: Int) {
    private val parent = Array.tabulate(n)(identity)

    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }

    /** @return true if two components merged (false: already joined) */
    def union(a: Int, b: Int): Boolean = {
      val ra = find(a)
      val rb = find(b)
      if (ra == rb) false
      else { parent(math.max(ra, rb)) = math.min(ra, rb); true }
    }
  }
}
