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
      collectThreshold: Long = 2000000L, maxLevels: Int = 4): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    // Phase 1 (distributed local moves) shared with Louvain
    val phase = Louvain.distributedPhase(edges0, distRounds)

    // Phase 2: DISTRIBUTED refinement at the full-graph level — the
    // scale-critical part of Leiden's guarantee happens before any
    // contraction (ROADMAP gap 1 closed)
    val ref = refineDistributed(phase, rounds = 2)

    // contract by the REFINED partition (Leiden's rule), then finish in
    // memory on the super-graph; if the refined super-graph is still over
    // the collect threshold, run further DISTRIBUTED Louvain-style
    // coarsening levels first (graceful degradation — never abort)
    val contractedRef = phase.sym
      .join(ref.select(col("node").as("src"), col("ref").as("rsrc")), "src")
      .join(ref.select(col("node").as("dst"), col("ref").as("rdst")), "dst")
      .groupBy(col("rsrc"), col("rdst")).agg(sum("weight").as("weight"))
      .localCheckpoint()
    val (mapping, contracted, nEdges) = Louvain.coarsenUntilFits(
      ref.select(col("node"), col("ref").as("comm")), contractedRef,
      phase.m2, distRounds, collectThreshold, maxLevels)

    if (nEdges <= collectThreshold) {
      val finished = leidenInMemory(contracted.as[(Long, Long, Double)].collect(), phase.m2)
      val labelDf = finished.toSeq.toDF("rl", "label")
      mapping.join(broadcast(labelDf), mapping("comm") === labelDf("rl"))
        .select(col("node"), labelDf("label"))
    } else {
      mapping.select(col("node"), col("comm").as("label"))
    }
  }

  /** Distributed Leiden refinement: within each coarse community, nodes
    * that are still SINGLETONS in the refined partition greedily merge
    * into a refined subcommunity of their coarse community they are
    * actually CONNECTED to, when the modularity gain is positive
    * (Traag et al. §A, the move set that guarantees well-connected
    * communities). Same shuffle shape as the local-move phase; hash-parity
    * damping; every structure node-or-edge-sized. */
  private[graph] def refineDistributed(phase: Louvain.Phase, rounds: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val sym = phase.sym
    val comm = phase.comm
    val deg = phase.deg
    val m2 = phase.m2

    // edges with BOTH endpoints in the same coarse community (only these
    // participate in refinement)
    val intra = sym
      .join(comm.select(col("node").as("src"), col("comm").as("csrc")), "src")
      .join(comm.select(col("node").as("dst"), col("comm").as("cdst")), "dst")
      .filter(col("csrc") === col("cdst"))
      .select(col("src"), col("dst"), col("weight"))
      .localCheckpoint()

    var ref = comm.select(col("node"), col("node").as("ref")).cache()
    var round = 0
    var moved = 1L
    while (round < rounds && moved > 0) {
      val refSize = ref.groupBy(col("ref")).agg(count(lit(1)).as("sz"))
      val singles = ref.join(refSize, "ref").filter(col("sz") === 1)
        .select(col("node"))
      val refTot = ref.join(deg, "node")
        .groupBy(col("ref")).agg(sum(col("k")).as("tot"))
      val cand = intra
        .join(singles.select(col("node").as("src")), "src", "left_semi")
        .join(ref.select(col("node").as("dst"), col("ref").as("rnbr")), "dst")
        .groupBy(col("src").as("node"), col("rnbr"))
        .agg(sum("weight").as("w_ur"))
        .join(deg, "node")
        .join(refTot.select(col("ref").as("r2"), col("tot")), col("rnbr") === col("r2"))
        .filter(col("rnbr") =!= col("node")) // its own singleton group is no target
        .withColumn("gain", col("w_ur") - col("k") * col("tot") / lit(m2))
        .filter(col("gain") > 0.0) // positive-gain, connected merges only
      val moves = cand
        .groupBy(col("node"))
        .agg(max(struct(col("gain"), (lit(0L) - col("rnbr")).as("negr"))).as("b"))
        .select(col("node").as("mn"), (lit(0L) - col("b.negr")).as("target"))
        .filter(pmod(xxhash64(col("mn")) + lit(round), lit(2)) === 0)
        .localCheckpoint()
      moved = moves.count()
      if (moved > 0) {
        val prev = ref
        ref = ref.as("r").join(moves, col("r.node") === col("mn"), "left")
          .select(col("r.node").as("node"),
            coalesce(col("target"), col("r.ref")).as("ref"))
          .cache()
        ref.count()
        prev.unpersist(blocking = false)
      }
      round += 1
    }
    ref
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
