package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Leiden community detection (SURVEY.md G5; reference GDS call at
  * project/metrics/community_detection.py:64-69).
  *
  * Same hybrid shape as [[Louvain]] (distributed local-move rounds on the
  * full graph, then contraction and an in-memory finish) — Leiden differs in
  * the **refinement phase** (Traag et al. 2019): before each contraction,
  * every community is re-partitioned from singletons, nodes merging only
  * within their community and only when actually connected to the target
  * subcommunity. This guarantees well-connected communities — the known
  * defect of Louvain that Leiden fixes — and the refined partition is what
  * gets contracted, while the coarse partition seeds the next level.
  */
object Leiden {

  /** @param edges0 canonical (src, dst, weight)
    * @return (node, label) */
  def run(edges0: DataFrame, distRounds: Int = 2,
      collectThreshold: Long = 2000000L): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    // Phase 1 (distributed prune + contraction) shared with Louvain
    val (pre, contracted, m2) = Louvain.distributedPhase(edges0, distRounds)
    val nEdges = contracted.count()
    require(nEdges <= collectThreshold,
      s"super-graph still has $nEdges directed edges; raise distRounds/collectThreshold")

    val refined = leidenInMemory(contracted.as[(Long, Long, Double)].collect(), m2)
    val labelDf = refined.toSeq.toDF("pl", "label")
    pre.join(broadcast(labelDf), pre("comm") === labelDf("pl"))
      .select(col("node"), labelDf("label"))
  }

  /** In-memory Leiden over a symmetric weighted edge list (with self-loops
    * from contraction): local move → refine → contract, iterated. */
  private[graph] def leidenInMemory(symEdges: Array[(Long, Long, Double)],
      m2: Double): Map[Long, Long] = {
    var adj: Map[Long, Array[(Long, Double)]] =
      symEdges.filter(e => e._1 != e._2).groupBy(_._1)
        .map { case (u, es) => u -> es.map(e => (e._2, e._3)) }
    var self: Map[Long, Double] =
      symEdges.filter(e => e._1 == e._2).groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._3).sum / 2.0 }
    var nodes: Array[Long] = symEdges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    // orig node -> current-level super-node (follows the REFINED contraction)
    val toNode = mutable.Map[Long, Long](nodes.map(n => n -> n): _*)
    // latest level's refined-super-node -> coarse community (the labels)
    var lastSuper: Map[Long, Long] = nodes.map(n => n -> n).toMap

    var improvedLevel = true
    var guard = 0
    while (improvedLevel && guard < 20) {
      guard += 1
      val k = mutable.Map[Long, Double]()
      nodes.foreach { u =>
        k(u) = adj.getOrElse(u, Array.empty).map(_._2).sum + 2.0 * self.getOrElse(u, 0.0)
      }

      // ---- 1. local move (as Louvain) ----
      val commOf = mutable.Map[Long, Long](nodes.map(n => n -> n): _*)
      val tot = mutable.Map[Long, Double](nodes.map(n => n -> k(n)): _*)
      var improvedPass = true
      var anyMove = false
      var passes = 0
      while (improvedPass && passes < 50) {
        improvedPass = false; passes += 1
        nodes.foreach { u =>
          val cu = commOf(u); val ku = k(u)
          val wTo = mutable.Map[Long, Double]().withDefaultValue(0.0)
          adj.getOrElse(u, Array.empty).foreach { case (v, w) => wTo(commOf(v)) += w }
          tot(cu) -= ku
          var bestC = cu
          var bestGain = wTo(cu) - ku * tot(cu) / m2
          wTo.keys.foreach { c =>
            if (c != cu) {
              val g = wTo(c) - ku * tot(c) / m2
              if (g > bestGain + 1e-12 || (math.abs(g - bestGain) <= 1e-12 && c < bestC)) {
                bestGain = g; bestC = c
              }
            }
          }
          tot(bestC) += ku
          if (bestC != cu) { commOf(u) = bestC; improvedPass = true; anyMove = true }
        }
      }
      if (!anyMove) { improvedLevel = false }
      else {
        // ---- 2. refinement: re-partition each community from singletons;
        // a node may only merge with a subcommunity of its own community it
        // is CONNECTED to (Traag et al. §A; gain-positive merges only) ----
        val refOf = mutable.Map[Long, Long](nodes.map(n => n -> n): _*)
        val refTot = mutable.Map[Long, Double](nodes.map(n => n -> k(n)): _*)
        nodes.foreach { u =>
          if (refOf(u) == u) { // still singleton in refined partition
            val cu = commOf(u); val ku = k(u)
            val wTo = mutable.Map[Long, Double]().withDefaultValue(0.0)
            adj.getOrElse(u, Array.empty).foreach { case (v, w) =>
              if (commOf(v) == cu) wTo(refOf(v)) += w // same community only
            }
            refTot(u) -= ku
            var bestC = u
            var bestGain = 0.0 // merging with itself = no gain
            wTo.keys.foreach { c =>
              if (c != u && wTo(c) > 0.0) { // connected subcommunities only
                val g = wTo(c) - ku * refTot(c) / m2
                if (g > bestGain + 1e-12 || (math.abs(g - bestGain) <= 1e-12 && c < bestC)) {
                  bestGain = g; bestC = c
                }
              }
            }
            refTot(bestC) += ku
            if (bestC != u) refOf(u) = bestC
          }
        }

        val newSelf = mutable.Map[Long, Double]().withDefaultValue(0.0)
        val newAdj = mutable.Map[(Long, Long), Double]().withDefaultValue(0.0)
        nodes.foreach { u =>
          val ru = refOf(u)
          newSelf(ru) += self.getOrElse(u, 0.0)
          adj.getOrElse(u, Array.empty).foreach { case (v, w) =>
            val rv = refOf(v)
            if (ru == rv) newSelf(ru) += w / 2.0
            else newAdj((ru, rv)) += w
          }
        }
        // contraction follows the REFINED partition; labels follow the COARSE
        // one (a coarse community can span several refined super-nodes)
        val superComm = mutable.Map[Long, Long]()
        nodes.foreach { u => superComm(refOf(u)) = commOf(u) }
        toNode.keys.toArray.foreach { orig => toNode(orig) = refOf(toNode(orig)) }
        lastSuper = superComm.toMap

        nodes = refOf.values.toArray.distinct.sorted
        adj = newAdj.toSeq.groupBy(_._1._1)
          .map { case (u, es) => u -> es.map { case ((_, v), w) => (v, w) }.toArray }
        self = newSelf.toMap
        if (nodes.length <= 1) improvedLevel = false
      }
    }
    toNode.map { case (orig, n) => orig -> lastSuper.getOrElse(n, n) }.toMap
  }
}
