package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Checkpointer.CheckpointSyntax

/** Distributed k-core decomposition (SURVEY.md G3; reference GDS call at
  * project/metrics/community_detection.py:56-58) by h-index convergence
  * (Montresor et al., "Distributed k-core decomposition"):
  * every node starts at its degree and repeatedly lowers its estimate to the
  * h-index of its neighbors' estimates; the fixpoint is the coreness.
  *
  * Fully parallel (no sequential peeling), converges in a few dozen rounds
  * on social graphs, message size bounded by `capCore` ints per vertex —
  * the formulation that survives a 1000-executor graph, unlike
  * peel-min-degree which is inherently sequential.
  */
object KCore {

  /** @param edges canonical (src, dst, weight) DataFrame; unweighted
    *   cores. Content assumed fixed for the instance's lifetime (see
    *   Louvain.symTiered's cache contract).
    * @return (node, core) DataFrame */
  def run(edges: DataFrame, maxIter: Int = 64,
      collectThreshold: Long = 2000000L): DataFrame = {
    // Small-graph tier (same gate as the Louvain family): exact
    // Batagelj–Zaveršnik peeling on the collected graph. Coreness is
    // unique, so this returns bit-identical cores to the h-index fixpoint
    // — peeling is inherently sequential, which is exactly why it is the
    // right algorithm below the threshold and the wrong one above it.
    val spark = edges.sparkSession
    import spark.implicits._
    // symmetrized edges ride Louvain's r10 session cache — coreness is
    // weight-agnostic (peel reads adjacency only), so the weighted shared
    // array serves unchanged and q40 shares q42/q45/q47's one collect
    val tiered = Louvain.symTiered(edges, collectThreshold)
    if (tiered.isRight) {
      val (es, _) = tiered.toOption.get
      val csr = SeqCommunity.build(es)
      val core = peel(csr)
      return (0 until csr.n).map(i => (csr.ids(i), core(i)))
        .toDF("node", "core")
    }
    val (sym, _, _) = tiered.swap.toOption.get
    // At-scale path: the DataFrame h-index iteration. Its per-round
    // shuffles move 16-byte (node, estimate) rows with map-side combine;
    // the Pregel histogram alternative ([[runPregel]]) allocates a
    // (capCore+1)-int array per edge side per round, which on a DENSE
    // graph is a measured multi-GB-per-round storm (ScaleBench: 16 s here
    // vs 35+ min for Pregel on a 4.5M-edge dense fixture; same fixpoint,
    // equality-tested).
    // self-loops do not contribute to coreness (peel's CSR routes them
    // out of the adjacency) — drop them here so all tiers agree
    runDFSym(sym.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")), maxIter, ownsSym = false)
  }

  /** h-index k-core as pure DataFrame iteration (no GraphX): per round,
    * every node's new estimate is max over distinct neighbor-estimate
    * values v of min(v, #neighbors with estimate ≥ v), capped by its own
    * estimate — the same fixpoint, expressed as two shuffles per round
    * (grouped histogram + running count) with map-side combine, 16-byte
    * rows throughout. THE at-scale path since round 3: with one
    * plan-truncating action per round its cost is data-bound (the round-2
    * "339 s at sf0.1" reading measured the old cache()-per-round plan
    * growth plus small-graph fixed costs, both gone — the small tier now
    * owns small graphs and ScaleBench measures this at 16 s on a dense
    * 4.5M-edge fixture where the Pregel histogram messages ran 35+ min). */
  def runDF(edges: DataFrame, maxIter: Int = 64): DataFrame =
    runDFSym(Projection.symmetrize(
        edges.select(col("src"), col("dst"), lit(1.0).as("weight")))
      .select(col("src"), col("dst")).distinct() // parallel edges count once
      .filter(col("src") =!= col("dst")) // self-loops don't contribute
      .cp(), maxIter)

  /** [[runDF]] over an ALREADY symmetric, deduped, materialized (src, dst)
    * edge set — run() hands its tier-gate sym straight in, so the
    * at-scale path does not symmetrize the full edge set twice.
    * `ownsSym` = false when the frame derives from the cache-owned tier
    * sym (r12, Louvain.symTiered): releasing it would cascade into the
    * cached checkpoint blocks through the plan leaves. */
  private def runDFSym(sym: DataFrame, maxIter: Int,
      ownsSym: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var est = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("int").as("est")).cp()
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val hist = sym
        .join(est.select(col("node").as("dst"), col("est").as("ne")), "dst")
        .groupBy(col("src").as("node"), col("ne"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("node")).orderBy(col("ne").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val h = hist
        .withColumn("cum", sum(col("cnt")).over(w))
        .select(col("node"),
          least(col("ne"), col("cum")).cast("int").as("cand"))
        .groupBy(col("node"))
        .agg(max(col("cand")).as("h"))
      // ONE eager action per round (the Louvain local-move discipline):
      // the new estimate and the did-it-change flag come out of the same
      // localCheckpoint — which also TRUNCATES the plan; the earlier
      // cache()-per-round version grew the logical plan every round and
      // Catalyst analysis, not execution, came to dominate long runs
      val next = est.join(h, Seq("node"), "left")
        .select(col("node"),
          least(col("est"), coalesce(col("h"), lit(0))).as("est"),
          (least(col("est"), coalesce(col("h"), lit(0))) =!= col("est")).as("mv"))
        .cp()
      changed = next.filter(col("mv")).count()
      graft.util.BlockRelease.release(est) // superseded round state
      est = next.select(col("node"), col("est"))
      iter += 1
    }
    val out = est.cp()
    graft.util.BlockRelease.release(
      if (ownsSym) Seq(est, sym) else Seq(est))
    out.select(col("node"), col("est").as("core"))
  }

  /** Batagelj–Zaveršnik bucket peeling over CSR arrays: O(E), exact. */
  private[graph] def peel(csr: SeqCommunity.Csr): Array[Int] = {
    val n = csr.n
    if (n == 0) return Array.empty
    val core = Array.tabulate(n)(u => csr.off(u + 1) - csr.off(u))
    val maxDeg = core.max
    val bin = new Array[Int](maxDeg + 2)
    core.foreach(d => bin(d) += 1)
    var start = 0
    var d = 0
    while (d <= maxDeg) { val c = bin(d); bin(d) = start; start += c; d += 1 }
    val vert = new Array[Int](n)
    val pos = new Array[Int](n)
    var v = 0
    while (v < n) { pos(v) = bin(core(v)); vert(pos(v)) = v; bin(core(v)) += 1; v += 1 }
    d = maxDeg
    while (d >= 1) { bin(d) = bin(d - 1); d -= 1 }
    bin(0) = 0
    var i = 0
    while (i < n) {
      val u = vert(i)
      var j = csr.off(u)
      while (j < csr.off(u + 1)) {
        val w0 = csr.nbr(j)
        if (core(w0) > core(u)) { // lower w0's bucket by one, swap to front
          val dw = core(w0); val pw = pos(w0)
          val pt = bin(dw); val t = vert(pt)
          if (t != w0) { vert(pt) = w0; vert(pw) = t; pos(w0) = pt; pos(t) = pw }
          bin(dw) += 1
          core(w0) -= 1
        }
        j += 1
      }
      i += 1
    }
    core
  }

  /** Pregel h-index with capped histogram messages — kept as the
    * message-combining formulation for SPARSE graphs (small per-vertex
    * degree ⇒ small combined histograms). If the result saturates at
    * `capCore` the caller should rerun with a larger cap (degeneracy
    * bound k ≤ √(2·|E|)); [[run]] prefers [[runDF]] at scale because the
    * (capCore+1)-int per-edge message allocation is hostile on dense
    * graphs (measured — see run()'s scaladoc). */
  private[graft] def runPregel(edges: DataFrame, maxIter: Int, capCore: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // canonical orientation + distinct + no self-loops: parallel edges
    // (either orientation) count once and loops not at all — the same
    // simple-graph semantics as peel/runDF
    val cached = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("src"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    val nEdges = cached.count()
    val p = GraphAlgos.sizedPartitions(cached, nEdges)
    val edgeRdd = cached.as[(Long, Long)].rdd
      .coalesce(p).map { case (s, d) => Edge(s, d, 1) }
    val g0 = Graph.fromEdges(edgeRdd, defaultValue = 0)
    // init: estimate = degree
    var g = g0.outerJoinVertices(g0.degrees) { (_, _, d) => d.getOrElse(0) }.cache()

    var iter = 0
    var changed = Long.MaxValue
    while (iter < maxIter && changed > 0) {
      // histogram of neighbor estimates (capped); h-index from the top
      val msgs = g.aggregateMessages[Array[Int]](
        ctx => {
          val cap = capCore
          val a = new Array[Int](cap + 1)
          a(math.min(ctx.srcAttr, cap)) += 1
          ctx.sendToDst(a)
          val b = new Array[Int](cap + 1)
          b(math.min(ctx.dstAttr, cap)) += 1
          ctx.sendToSrc(b)
        },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
      val updated = g.outerJoinVertices(msgs) { (_, est, histOpt) =>
        histOpt match {
          case None => 0
          case Some(hist) =>
            // h = max k ≤ est with #{nbr est ≥ k} ≥ k
            var count = 0
            var k = math.min(est, capCore)
            var h = 0
            var i = hist.length - 1
            while (i >= 0 && h == 0) {
              count += hist(i)
              if (count >= i && i <= k) h = i
              i -= 1
            }
            math.min(est, h)
        }
      }.cache()
      updated.vertices.count() // materialize before diff
      changed = updated.vertices.join(g.vertices)
        .filter { case (_, (n, o)) => n != o }.count()
      g.unpersist(blocking = false)
      g = updated
      iter += 1
    }
    g.vertices.toDF("node", "core")
  }
}
