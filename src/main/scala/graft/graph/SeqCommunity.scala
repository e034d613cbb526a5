package graft.graph

import scala.collection.mutable

/** Sequential community-detection core over an index-compressed CSR graph —
  * the small-graph tier and the super-graph finish shared by [[Louvain]],
  * [[Leiden]] and modularity optimization.
  *
  * Primitive arrays throughout: node ids are compressed to dense indices
  * once, neighbor lists live in one int array with CSR offsets, and the
  * per-node "weight to candidate community" accumulator is a flat double
  * array reset via a touched-list. The earlier hash-map/boxed-tuple
  * formulation cost seconds on a dense 1k-node graph where this runs in
  * tens of milliseconds — and this code is also the finish that every
  * at-scale run funnels its collected super-graph through.
  *
  * Determinism: nodes are visited in ascending id order, ties break to the
  * smallest community index (= smallest representative id, since ids are
  * sorted before indexing), and coarsened adjacency is sorted — identical
  * labels on identical input, every run.
  */
/** Primitive-parallel symmetric weighted edge list — the storage form of
  * the collect-tier session cache (r11, ADVICE: the cache pinned boxed
  * `Array[(Long, Long, Double)]` on the driver for the session lifetime,
  * ~56 bytes/edge with tuple headers and boxing vs 24 flat bytes here —
  * a 2M-edge cached graph drops from ~110 MB to 48 MB). */
private[graft] final class SymEdges(val src: Array[Long],
    val dst: Array[Long], val w: Array[Double]) {
  require(src.length == dst.length && dst.length == w.length,
    "parallel arrays must align")
  def length: Int = src.length
}

private[graft] object SymEdges {
  def fromTuples(es: Array[(Long, Long, Double)]): SymEdges = {
    val n = es.length
    val s = new Array[Long](n); val d = new Array[Long](n)
    val w = new Array[Double](n)
    var i = 0
    while (i < n) { s(i) = es(i)._1; d(i) = es(i)._2; w(i) = es(i)._3; i += 1 }
    new SymEdges(s, d, w)
  }
}

private[graph] object SeqCommunity {

  /** `ids` sorted ascending; `off`/`nbr`/`w` CSR over non-self directed
    * edges (both orientations present in symmetric input); `selfW` =
    * internal weight per node — a contracted (c,c,w) row contributes w/2,
    * matching the symmetric double-counting convention. */
  final case class Csr(ids: Array[Long], off: Array[Int], nbr: Array[Int],
      w: Array[Double], selfW: Array[Double]) {
    def n: Int = ids.length

    /** Weighted degree: incident edge weight + 2× self weight. */
    def degrees: Array[Double] = {
      val k = new Array[Double](n)
      var u = 0
      while (u < n) {
        var s = 2.0 * selfW(u)
        var j = off(u)
        while (j < off(u + 1)) { s += w(j); j += 1 }
        k(u) = s
        u += 1
      }
      k
    }
  }

  def build(symEdges: Array[(Long, Long, Double)]): Csr =
    build(SymEdges.fromTuples(symEdges))

  def build(se: SymEdges): Csr = {
    val m = se.length
    // distinct sorted ids
    val all = new Array[Long](m * 2)
    var i = 0
    while (i < m) {
      all(2 * i) = se.src(i); all(2 * i + 1) = se.dst(i); i += 1
    }
    java.util.Arrays.sort(all)
    var n = 0
    i = 0
    while (i < all.length) {
      if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(all, n)
    val idx = new mutable.LongMap[Int](n * 2)
    i = 0
    while (i < n) { idx(ids(i)) = i; i += 1 }

    val selfW = new Array[Double](n)
    val degCnt = new Array[Int](n)
    i = 0
    while (i < m) {
      if (se.src(i) == se.dst(i)) selfW(idx(se.src(i))) += se.w(i) / 2.0
      else degCnt(idx(se.src(i))) += 1
      i += 1
    }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + degCnt(i); i += 1 }
    val nbr = new Array[Int](off(n))
    val w = new Array[Double](off(n))
    val pos = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < m) {
      if (se.src(i) != se.dst(i)) {
        val u = idx(se.src(i))
        val p = pos(u)
        nbr(p) = idx(se.dst(i)); w(p) = se.w(i)
        pos(u) = p + 1
      }
      i += 1
    }
    Csr(ids, off, nbr, w, selfW)
  }

  /** Greedy local moving until a full pass makes no move (same move rule,
    * visit order and tie-break as the distributed phase's in-memory
    * ancestor): node u adopts the neighbor community with the best
    * ΔQ ∝ w(u,c) − k_u·tot(c\u)/2m. Returns (community index per node,
    * any move happened). */
  def localMove(csr: Csr, k: Array[Double], m2: Double): (Array[Int], Boolean) = {
    val n = csr.n
    val commOf = Array.tabulate(n)(identity)
    val tot = k.clone()
    val wTo = new Array[Double](n)
    val touched = new Array[Int](n)
    var anyMove = false
    var improved = true
    var passes = 0
    while (improved && passes < 50) {
      improved = false
      passes += 1
      var u = 0
      while (u < n) {
        val cu = commOf(u)
        val ku = k(u)
        var nt = 0
        var j = csr.off(u)
        while (j < csr.off(u + 1)) {
          val c = commOf(csr.nbr(j))
          if (wTo(c) == 0.0) { touched(nt) = c; nt += 1 }
          wTo(c) += csr.w(j)
          j += 1
        }
        tot(cu) -= ku
        var bestC = cu
        var bestGain = wTo(cu) - ku * tot(cu) / m2
        var t = 0
        while (t < nt) {
          val c = touched(t)
          if (c != cu) {
            val g = wTo(c) - ku * tot(c) / m2
            if (g > bestGain + 1e-12 ||
                (math.abs(g - bestGain) <= 1e-12 && c < bestC)) {
              bestGain = g; bestC = c
            }
          }
          t += 1
        }
        tot(bestC) += ku
        if (bestC != cu) { commOf(u) = bestC; improved = true; anyMove = true }
        t = 0
        while (t < nt) { wTo(touched(t)) = 0.0; t += 1 }
        u += 1
      }
    }
    (commOf, anyMove)
  }

  /** Leiden refinement (Traag et al. §A): within each coarse community,
    * nodes still singleton in the refined partition greedily merge into a
    * CONNECTED refined subcommunity of their own community on positive
    * gain. */
  def refine(csr: Csr, k: Array[Double], commOf: Array[Int],
      m2: Double): Array[Int] = {
    val n = csr.n
    val refOf = Array.tabulate(n)(identity)
    val refSz = Array.fill(n)(1)
    val refTot = k.clone()
    val wTo = new Array[Double](n)
    val touched = new Array[Int](n)
    var u = 0
    while (u < n) {
      // TRUE singletons only (group of exactly one node) — the same
      // `sz === 1` guard the distributed refinement enforces; the earlier
      // `refOf(u) == u` test let a group that had already absorbed members
      // merge onward, producing refOf chains the contraction mishandled
      if (refOf(u) == u && refSz(u) == 1) {
        val cu = commOf(u)
        val ku = k(u)
        var nt = 0
        var j = csr.off(u)
        while (j < csr.off(u + 1)) {
          val v = csr.nbr(j)
          if (commOf(v) == cu) { // same coarse community only
            val r = refOf(v)
            if (wTo(r) == 0.0) { touched(nt) = r; nt += 1 }
            wTo(r) += csr.w(j)
          }
          j += 1
        }
        refTot(u) -= ku
        var bestC = u
        var bestGain = 0.0 // merging with itself = no gain
        var t = 0
        while (t < nt) {
          val c = touched(t)
          if (c != u && wTo(c) > 0.0) { // connected subcommunities only
            val g = wTo(c) - ku * refTot(c) / m2
            if (g > bestGain + 1e-12 ||
                (math.abs(g - bestGain) <= 1e-12 && c < bestC)) {
              bestGain = g; bestC = c
            }
          }
          t += 1
        }
        refTot(bestC) += ku
        if (bestC != u) { refOf(u) = bestC; refSz(bestC) += 1 }
        t = 0
        while (t < nt) { wTo(touched(t)) = 0.0; t += 1 }
      }
      u += 1
    }
    refOf
  }

  /** Contract by `groupOf`: new node per group (ordered by first member,
    * i.e. ascending representative id; the group's id is its first
    * member's), intra-group weight folded into selfW, inter-group
    * adjacency aggregated and sorted for determinism. Returns (contracted
    * graph, old index → new index). */
  def coarsen(csr: Csr, groupOf: Array[Int]): (Csr, Array[Int]) = {
    val n = csr.n
    val gMap = new Array[Int](n)
    java.util.Arrays.fill(gMap, -1)
    val comp = new Array[Int](n)
    val newIdsB = new mutable.ArrayBuilder.ofLong
    var newN = 0
    var i = 0
    while (i < n) {
      val g = groupOf(i)
      if (gMap(g) == -1) { gMap(g) = newN; newIdsB += csr.ids(i); newN += 1 }
      comp(i) = gMap(g)
      i += 1
    }
    val newIds = newIdsB.result()

    val newSelf = new Array[Double](newN)
    val acc = new mutable.LongMap[Double]()
    var u = 0
    while (u < n) {
      val cu = comp(u)
      newSelf(cu) += csr.selfW(u)
      var j = csr.off(u)
      while (j < csr.off(u + 1)) {
        val cv = comp(csr.nbr(j))
        if (cu == cv) newSelf(cu) += csr.w(j) / 2.0 // each intra edge seen twice
        else {
          val key = (cu.toLong << 32) | (cv.toLong & 0xffffffffL)
          acc(key) = acc.getOrElse(key, 0.0) + csr.w(j)
        }
        j += 1
      }
      u += 1
    }
    val keys = acc.keysIterator.toArray
    java.util.Arrays.sort(keys)
    val degCnt = new Array[Int](newN)
    i = 0
    while (i < keys.length) { degCnt((keys(i) >>> 32).toInt) += 1; i += 1 }
    val off = new Array[Int](newN + 1)
    i = 0
    while (i < newN) { off(i + 1) = off(i) + degCnt(i); i += 1 }
    val nbr = new Array[Int](keys.length)
    val w = new Array[Double](keys.length)
    i = 0
    while (i < keys.length) { // keys sorted → CSR slots fill in order
      nbr(i) = (keys(i) & 0xffffffffL).toInt
      w(i) = acc(keys(i))
      i += 1
    }
    (Csr(newIds, off, nbr, w, newSelf), comp)
  }

  /** Classic sequential Louvain: local move + contract, iterated to a
    * fixed point. Returns original id → representative label id. */
  def louvain(symEdges: Array[(Long, Long, Double)], m2: Double): Map[Long, Long] =
    louvain(SymEdges.fromTuples(symEdges), m2)

  def louvain(symEdges: SymEdges, m2: Double): Map[Long, Long] = {
    val csr0 = build(symEdges)
    var csr = csr0
    val mapping = Array.tabulate(csr0.n)(identity)
    var improvedLevel = true
    var guard = 0
    while (improvedLevel && guard < 20) {
      guard += 1
      val (commOf, anyMove) = localMove(csr, csr.degrees, m2)
      if (!anyMove) improvedLevel = false
      else {
        val (next, comp) = coarsen(csr, commOf)
        // comp is indexed by OLD NODE and already folds commOf in
        // (comp(u) = gMap(commOf(u))): composing through the partition a
        // second time attached nodes to the group of their community's
        // LABEL NODE, which is wrong whenever that label node itself
        // moved elsewhere (caught by a 3000-graph fuzz against the
        // pre-CSR implementation)
        var i = 0
        while (i < mapping.length) { mapping(i) = comp(mapping(i)); i += 1 }
        csr = next
        if (csr.n <= 1) improvedLevel = false
      }
    }
    val out = Map.newBuilder[Long, Long]
    var i = 0
    while (i < csr0.n) { out += csr0.ids(i) -> csr.ids(mapping(i)); i += 1 }
    out.result()
  }

  /** Sequential Leiden: local move → refine → contract by the REFINED
    * partition (labels follow the coarse one), iterated. Returns original
    * id → coarse community representative id. */
  def leiden(symEdges: Array[(Long, Long, Double)], m2: Double): Map[Long, Long] =
    leiden(SymEdges.fromTuples(symEdges), m2)

  def leiden(symEdges: SymEdges, m2: Double): Map[Long, Long] = {
    val csr0 = build(symEdges)
    var csr = csr0
    val mapping = Array.tabulate(csr0.n)(identity)
    var labelOfCur: Array[Long] = csr.ids.clone()
    var improvedLevel = true
    var guard = 0
    while (improvedLevel && guard < 20) {
      guard += 1
      val k = csr.degrees
      val (commOf, anyMove) = localMove(csr, k, m2)
      if (!anyMove) improvedLevel = false
      else {
        val refOf = refine(csr, k, commOf, m2)
        val (next, comp) = coarsen(csr, refOf)
        // a refined group lies inside ONE coarse community, so the new
        // super-node's label is that community's representative id (its
        // first member in ascending order)
        val commRep = new Array[Long](csr.n)
        java.util.Arrays.fill(commRep, -1L)
        var i = 0
        while (i < csr.n) {
          if (commRep(commOf(i)) == -1L) commRep(commOf(i)) = csr.ids(i)
          i += 1
        }
        val newLabels = new Array[Long](next.n)
        i = 0
        // comp(u) = gMap(refOf(u)) — already per OLD NODE (same
        // double-application hazard as the louvain mapping above)
        while (i < csr.n) { newLabels(comp(i)) = commRep(commOf(i)); i += 1 }
        labelOfCur = newLabels
        i = 0
        while (i < mapping.length) { mapping(i) = comp(mapping(i)); i += 1 }
        // refinement merged nothing → the graph stopped contracting, and
        // every further level would recompute the identical state (local
        // move is deterministic from singletons): fixed point, stop —
        // without this the loop burns all `guard` levels re-running full
        // local-move passes on an unshrinking graph
        if (next.n >= csr.n || next.n <= 1) improvedLevel = false
        csr = next
      }
    }
    val out = Map.newBuilder[Long, Long]
    var i = 0
    while (i < csr0.n) { out += csr0.ids(i) -> labelOfCur(mapping(i)); i += 1 }
    out.result()
  }

  /** Local moving only, no contraction — GDS-style modularity
    * optimization. Returns original id → representative label id. */
  def localMoveOnly(symEdges: Array[(Long, Long, Double)], m2: Double): Map[Long, Long] =
    localMoveOnly(SymEdges.fromTuples(symEdges), m2)

  def localMoveOnly(symEdges: SymEdges, m2: Double): Map[Long, Long] = {
    val csr = build(symEdges)
    val (commOf, _) = localMove(csr, csr.degrees, m2)
    val out = Map.newBuilder[Long, Long]
    var i = 0
    while (i < csr.n) { out += csr.ids(i) -> csr.ids(commOf(i)); i += 1 }
    out.result()
  }
}
