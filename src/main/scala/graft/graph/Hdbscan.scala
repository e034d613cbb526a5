package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

import graft.functions.VectorFunctions

/** True HDBSCAN over embedding vectors (SURVEY.md G2; reference GDS call at
  * project/metrics/community_detection.py:49-54) — the real algorithm, not
  * the DBSCAN substitute ([[DensityCluster]] remains as the flat-ε tier):
  *
  *  1. **Core distances**: distance to the minPts-th nearest neighbor, from
  *     a kNN edge set (exact brute kNN under `bruteThreshold` points; LSH
  *     bucket candidates above it — the standard approximate-kNN tier, same
  *     centered-hyperplane machinery as [[DensityCluster]]).
  *  2. **Mutual reachability**: d_mreach(a,b) = max(core_a, core_b, d(a,b))
  *     on the kNN candidate edges (the kNN graph contains the MST edges for
  *     all but adversarial data — the standard scalable formulation).
  *  3. **Distributed Borůvka MST**: each component picks its minimum
  *     outgoing edge (deterministic total order on (w, a, b)), components
  *     merge by pointer-doubling over the chosen-edge functional graph —
  *     O(log n) rounds of node-sized shuffles, never all-pairs.
  *  4. **Hierarchy extraction** on the collected MST (n−1 edges — NODE-
  *     sized, the same collect-threshold discipline as [[Louvain]]):
  *     single-linkage dendrogram via union-find, condensed tree with
  *     `minClusterSize`, Excess-of-Mass cluster selection, noise = −1 —
  *     the hdbscan condensed-tree algorithm (Campello–Moulavi–Sander).
  *     Over the threshold it degrades to a flat quantile cut of the MST
  *     (documented approximation), never aborts.
  */
object Hdbscan {

  /** @param points (id, v) with v array<double>
    * @param minPts          core-distance neighbor rank (density smoothing)
    * @param minClusterSize  smallest condensed cluster
    * @param knnK            candidate neighbors per point (≥ minPts)
    * @return (id, label) — label = min member id of the cluster, −1 noise */
  def run(points: DataFrame, minPts: Int = 5, minClusterSize: Int = 5,
      knnK: Int = 16, bits: Int = 10, tables: Int = 8,
      bruteThreshold: Long = 2000L,
      collectThreshold: Long = 5000000L): DataFrame = {
    require(knnK >= minPts, s"knnK ($knnK) must be ≥ minPts ($minPts)")
    val spark = points.sparkSession
    import spark.implicits._

    val n = points.count()
    // Candidate edge tiers: under `bruteThreshold` the COMPLETE graph —
    // this makes the small-n tier EXACT HDBSCAN (the MST and hierarchy are
    // the true ones; a kNN-only candidate set loses the inter-cluster
    // bridge edges, which inverts where sparse points fall out of the
    // hierarchy). The whole exact tier runs IN MEMORY (n ≤ 2000 → ≤ 2M
    // pairs): pairwise distances, core distances, mutual reachability and
    // Kruskal are one collect of n vectors plus ~n²·dim flops — the
    // DataFrame formulation of the same O(n²) work was pure scheduler and
    // shuffle overhead at this size. Above the threshold, kNN-truncated
    // LSH candidates — the standard approximate tier whose deviations are
    // confined to inter-cluster bridge orderings.
    if (n <= bruteThreshold) {
      val pts = points.select(col("id"), col("v"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      return exactInMemory(pts, minPts, minClusterSize).toSeq.toDF("id", "label")
    }
    val (knn, knnScratch) = knnLsh(points, knnK, bits, tables)
    val und = knn
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("d"))
      .groupBy("a", "b").agg(min(col("d")).as("d"))
      .localCheckpoint()
    graft.util.BlockRelease.release(knnScratch) // bucket rows: und owns the data now

    // core distance = d of the minPts-th nearest incident candidate; a
    // point with fewer than minPts candidates (LSH tier only) sits in a
    // near-empty region — an effectively-infinite core distance sends it to
    // the top of the hierarchy, where it condenses out as noise
    val wNode = Window.partitionBy(col("node")).orderBy(col("d").asc, col("nbr").asc)
    val core = und.select(col("a").as("node"), col("b").as("nbr"), col("d"))
      .union(und.select(col("b"), col("a"), col("d")))
      .withColumn("rn", row_number().over(wNode))
      .filter(col("rn") === minPts)
      .select(col("node").as("id"), col("d").as("core"))
    val inf = lit(1e30)
    val mre = und
      .join(core.select(col("id").as("a"), col("core").as("ca")), Seq("a"), "left")
      .join(core.select(col("id").as("b"), col("core").as("cb")), Seq("b"), "left")
      .select(col("a"), col("b"),
        greatest(col("d"), coalesce(col("ca"), inf), coalesce(col("cb"), inf)).as("w"))

    // MST tiering (same collect-threshold discipline as Louvain/Leiden):
    // when the CANDIDATE edge set itself fits in memory, sequential Kruskal
    // under the same lexicographic (w, a, b) total order produces the
    // identical unique MST in one collect — the distributed Borůvka rounds
    // (several eager jobs each, O(log n) of them) are reserved for edge
    // sets that genuinely exceed one executor.
    val nCand = und.count()
    val labels =
      if (nCand <= collectThreshold) {
        val edges = kruskalMst(mre.select(col("a"), col("b"), col("w"))
          .as[(Long, Long, Double)].collect())
        val ids = points.select(col("id")).as[Long].collect()
        extractLabels(edges, ids, minClusterSize).toSeq.toDF("id", "label")
      } else {
        runDistributedMst(points, mre, minClusterSize, collectThreshold)
      }
    // both branches have materialized everything derived from the
    // candidate edges — release them instead of leaking per call
    graft.util.BlockRelease.release(und)

    points.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), lit(-1L)).as("label"))
  }

  /** Distributed Borůvka MST + hierarchy extraction — the at-scale path of
    * [[run]] once the candidate edge set no longer fits in memory. */
  private def runDistributedMst(points: DataFrame, mre: DataFrame,
      minClusterSize: Int, collectThreshold: Long): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val mst = boruvkaMst(mre).localCheckpoint()
    val mstSize = mst.count()

    val out = if (mstSize <= collectThreshold) {
        val edges = mst.select(col("a"), col("b"), col("w"))
          .as[(Long, Long, Double)].collect()
        val ids = points.select(col("id")).as[Long].collect()
        val lab = extractLabels(edges, ids, minClusterSize)
        lab.toSeq.toDF("id", "label")
      } else {
        // degradation tier: flat cut of the MST → connected components;
        // undersized components are noise. The cut lands at the largest
        // multiplicative gap in the (approximate) weight quantiles — the
        // single-linkage gap criterion, one distributed pass. A flat cut is
        // what the full hierarchy refines — quality degrades, the job
        // survives
        val probes = (0 to 50).map(_ / 50.0).toArray
        val qs = mst.stat.approxQuantile("w", probes, 0.001)
        // geometric midpoint of the widest gap: quantile resolution can
        // hide stragglers just below the jump — a log-midway cut keeps
        // them and still excludes everything across the gap
        val cut = qs.zip(qs.tail).filter(_._1 > 0.0)
          .maxByOption { case (lo, hi) => hi / lo }
          .map { case (lo, hi) => math.sqrt(lo * hi) }.getOrElse(qs.last)
        val comps = GraphAlgos.connectedComponents(
          mst.filter(col("w") <= cut)
            .select(col("a").as("src"), col("b").as("dst")))
        val sizes = comps.groupBy("label").agg(count(lit(1)).as("sz"))
        comps.join(sizes, "label")
          .select(col("node").as("id"),
            when(col("sz") >= minClusterSize, col("label")).otherwise(lit(-1L)).as("label"))
          .localCheckpoint() // node-sized; lets the MST blocks go
      }
    graft.util.BlockRelease.release(mst)
    out
  }

  /** Sequential Kruskal under the lexicographic (w, a, b) edge order —
    * the same strict total order [[boruvkaMst]] breaks ties with, so both
    * produce the identical unique MST. */
  private[graft] def kruskalMst(
      edges: Array[(Long, Long, Double)]): Array[(Long, Long, Double)] = {
    val uf = new graft.util.UnionFind.Longs
    val out = mutable.ArrayBuffer[(Long, Long, Double)]()
    val order = graft.util.IndirectSort.sorted(edges.length) { (x, y) =>
      val ex = edges(x); val ey = edges(y)
      ex._3 < ey._3 || (ex._3 == ey._3 &&
        (ex._1 < ey._1 || (ex._1 == ey._1 && ex._2 < ey._2)))
    }
    order.foreach { i =>
      val e = edges(i)
      if (uf.union(e._1, e._2)) out += e
    }
    out.toArray
  }

  /** Exact in-memory HDBSCAN for the small-n tier: complete pairwise
    * distances, core distance = minPts-th smallest neighbor distance,
    * mutual reachability folded in place, Kruskal MST under the (w, a, b)
    * total order, condensed-tree labels — identical semantics (and, via
    * the shared strict edge order, the identical MST) to the distributed
    * formulation. `pts` must be sorted by id. */
  private[graft] def exactInMemory(pts: Array[(Long, Array[Double])],
      minPts: Int, minClusterSize: Int): Map[Long, Long] = {
    val n = pts.length
    if (n == 0) return Map.empty
    val ids = pts.map(_._1)
    val vs = pts.map(_._2)
    val m = n * (n - 1) / 2
    val w = new Array[Double](m) // pair distances, then mreach in place
    val ai = new Array[Int](m)
    val bi = new Array[Int](m)
    val perNode = Array.ofDim[Double](n, n - 1)
    val cnt = new Array[Int](n)
    var p = 0
    var i = 0
    while (i < n) {
      val vi = vs(i)
      var j = i + 1
      while (j < n) {
        val vj = vs(j)
        var s = 0.0
        var d0 = 0
        while (d0 < vi.length) { val t = vi(d0) - vj(d0); s += t * t; d0 += 1 }
        val d = math.sqrt(s)
        w(p) = d; ai(p) = i; bi(p) = j
        perNode(i)(cnt(i)) = d; cnt(i) += 1
        perNode(j)(cnt(j)) = d; cnt(j) += 1
        p += 1
        j += 1
      }
      i += 1
    }
    val core = new Array[Double](n)
    i = 0
    while (i < n) {
      if (n - 1 >= minPts) {
        java.util.Arrays.sort(perNode(i))
        core(i) = perNode(i)(minPts - 1)
      } else core(i) = 1e30 // isolated region → condenses out as noise
      i += 1
    }
    p = 0
    while (p < m) {
      val c = math.max(core(ai(p)), core(bi(p)))
      if (c > w(p)) w(p) = c
      p += 1
    }
    // stable sort by w keeps the (a, b)-ascending enumeration order for
    // ties — exactly the lexicographic (w, a, b) order Borůvka uses
    val order = graft.util.IndirectSort.sorted(m)((x, y) => w(x) < w(y))
    val uf = new graft.util.UnionFind.Ints(n)
    val mstEdges = mutable.ArrayBuffer[(Long, Long, Double)]()
    var o = 0
    while (o < m && mstEdges.length < n - 1) {
      val e = order(o)
      if (uf.union(ai(e), bi(e)))
        mstEdges += ((ids(ai(e)), ids(bi(e)), w(e)))
      o += 1
    }
    extractLabels(mstEdges.toArray, ids, minClusterSize)
  }

  /** Approximate kNN edges from centered-hyperplane LSH bucket mates
    * (candidate generation = equality join, the at-scale tier). */
  private[graft] def knnLsh(points: DataFrame, k: Int,
      bits: Int, tables: Int): (DataFrame, DataFrame) = {
    val meanRow = points.agg(graft.functions.VectorMean(col("v")).as("m"))
      .select(col("m")).first().getSeq[Double](0)
    val meanCol = array(meanRow.map(lit): _*)
    val dim = points.select(size(col("v"))).first().getInt(0)
    val centered = points.withColumn("vc",
      zip_with(col("v"), meanCol, (x, m) => x - m))
    val allSigs = graft.functions.VectorExpressions
      .hyperplane_sigs(col("vc"), dim, "hdbscan", bits, tables)
    val bucketed = centered
      .select(col("id"), col("v"), posexplode(allSigs).as(Seq("t", "s")))
      .repartition(col("t"), col("s")) // don't inherit the scan's (often
      //        single-file) partitioning into the bucket self-join
      .localCheckpoint()
    val w = Window.partitionBy(col("a")).orderBy(col("d").asc, col("b").asc)
    // distance computed INSIDE the bucket join projection: the dedup then
    // shuffles 24-byte (a, b, d) rows, not kilobyte vector pairs — with
    // clustered data one bucket can hold a whole cluster, and carrying
    // vectors through that dedup was a multi-GB shuffle
    val wBucket = Window.partitionBy(col("t"), col("s"), col("a"))
      .orderBy(col("d").asc, col("b").asc)
    val topk = bucketed.as("x").join(bucketed.as("y"),
        col("x.t") === col("y.t") && col("x.s") === col("y.s") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.t").as("t"), col("x.s").as("s"),
        col("x.id").as("a"), col("y.id").as("b"),
        sqrt(VectorFunctions.l2distSq(col("x.v"), col("y.v"))).as("d"))
      // LOSSLESS per-(node, bucket) top-k BEFORE the global dedup: a
      // neighbor ranked > k inside any one bucket already has ≥ k closer
      // distinct neighbors there, so it cannot make the global top-k.
      // Plan shape (verified via executedPlan): the rank-limit pushdown
      // plants a PARTIAL WindowGroupLimit before this window's exchange,
      // so every exchange from here on — (t,s,a), the (a,b) dedup, the
      // final (a) window — carries ≤ tables·k rows per node instead of
      // the dedup shuffling every bucket-collision pair
      .withColumn("rb", row_number().over(wBucket))
      .filter(col("rb") <= k)
      .drop("rb", "t", "s")
      .dropDuplicates("a", "b")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    (topk, bucketed) // caller releases `bucketed` once topk is materialized
  }

  /** Distributed Borůvka: O(log n) rounds; each round every component
    * adopts its minimum-weight outgoing edge (total order (w, a, b) makes
    * the choice — and the MST under distinct weights — deterministic), and
    * touching components merge via pointer doubling over the chosen-edge
    * functional graph (whose cycles are exactly the mutual-min 2-cycles). */
  private[graft] def boruvkaMst(edges: DataFrame,
      mergeCollect: Long = 10000000L): DataFrame = {
    val spark = edges.sparkSession
    val und = edges.select(col("a"), col("b"), col("w")).localCheckpoint()
    var comp = und.select(col("a").as("node")).union(und.select(col("b")))
      .distinct().select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    // minE checkpoints feed the LAZY mst union across rounds — they are
    // only releasable after the final mst materializes; everything else is
    // released the round it is superseded
    val minEs = mutable.ArrayBuffer[DataFrame]()
    var mst: DataFrame = null
    var done = false
    while (!done) {
      val e = und
        .join(comp.select(col("node").as("a"), col("comp").as("ca")), "a")
        .join(comp.select(col("node").as("b"), col("comp").as("cb")), "b")
        .filter(col("ca") =!= col("cb"))
        .localCheckpoint()
      if (e.isEmpty) done = true
      else {
        val cand = e.select(col("ca").as("c"),
            struct(col("w"), col("a"), col("b"), col("cb").as("tc")).as("ed"))
          .union(e.select(col("cb").as("c"),
            struct(col("w"), col("a"), col("b"), col("ca").as("tc")).as("ed")))
        val minE = cand.groupBy("c").agg(min(col("ed")).as("ed"))
          .select(col("c"), col("ed.a").as("a"), col("ed.b").as("b"),
            col("ed.w").as("w"), col("ed.tc").as("tc"))
          .localCheckpoint()
        minEs += minE
        val nComps = minE.count()
        val chosen = minE.select(col("a"), col("b"), col("w")).distinct()
        mst = if (mst == null) chosen else mst.union(chosen)
        // Component merge. The merge graph is COMPONENT-sized and shrinks
        // geometrically per round, so once it fits (mergeCollect), a
        // driver union-find + broadcast relabel map is one job — the same
        // contracted-finish discipline as Louvain. Above the threshold
        // (first rounds at extreme n) pointer doubling over the chosen-
        // edge functional graph merges distributedly in O(log) hops.
        val relabel: DataFrame =
          if (nComps <= mergeCollect) {
            import spark.implicits._
            val pairs = minE.select(col("c"), col("tc")).as[(Long, Long)].collect()
            val uf = new graft.util.UnionFind.Longs
            pairs.foreach { case (c, tc) => uf.union(c, tc) }
            val entries = pairs.flatMap { case (c, tc) => Seq(c, tc) }.distinct
              .map(c => (c, uf.find(c)))
            broadcast(entries.toSeq.toDF("comp", "nc"))
          } else {
            // root mutual-min 2-cycles at the smaller comp id, then
            // pointer-double to the roots (3 lazy hops per materialization)
            val p0 = minE.select(col("c"), col("tc"))
            var p = p0.as("x")
              .join(p0.select(col("c").as("tc"), col("tc").as("ttc")).as("y"), Seq("tc"), "left")
              .select(col("c"),
                when(col("ttc") === col("c") && col("tc") > col("c"), col("c"))
                  .otherwise(col("tc")).as("p"))
              .localCheckpoint()
            var changed = 1L
            while (changed > 0) {
              var q = p
              for (_ <- 1 to 3)
                q = q.as("x")
                  .join(q.select(col("c").as("p"), col("p").as("gp")).as("y"), Seq("p"), "left")
                  .select(col("c"), coalesce(col("gp"), col("p")).as("p"))
              val nxt = q.localCheckpoint()
              changed = nxt.as("n")
                .join(p.select(col("c"), col("p").as("prev")).as("o"), Seq("c"))
                .filter(col("p") =!= col("prev")).count()
              graft.util.BlockRelease.release(p) // superseded doubling state
              p = nxt
            }
            p.select(col("c").as("comp"), col("p").as("nc"))
          }
        val prevComp = comp
        comp = comp
          .join(relabel, Seq("comp"), "left")
          .select(col("node"), coalesce(col("nc"), col("comp")).as("comp"))
          .localCheckpoint()
        graft.util.BlockRelease.release(prevComp)
      }
      graft.util.BlockRelease.release(e) // consumed into minE/mst this round
    }
    val result =
      if (mst == null) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], und.schema)
      else mst.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("w")).distinct()
        .localCheckpoint()
    graft.util.BlockRelease.release(und)
    graft.util.BlockRelease.release(comp)
    minEs.foreach(graft.util.BlockRelease.release)
    result
  }

  /** In-memory hierarchy extraction: single-linkage dendrogram (union-find
    * over MST edges sorted by weight), condensed tree at `minClusterSize`,
    * Excess-of-Mass selection, labels = min member id, noise −1. */
  private[graft] def extractLabels(mstEdges: Array[(Long, Long, Double)],
      pointIds: Array[Long], minClusterSize: Int): Map[Long, Long] = {
    val n = pointIds.length
    if (n == 0) return Map.empty
    val idx = pointIds.zipWithIndex.map { case (id, i) => id -> i }.toMap

    // ---- dendrogram via union-find (internal nodes n .. n+m-1) ----
    val maxNodes = 2 * n - 1 max 1
    val parent = Array.tabulate(maxNodes)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val childL = new Array[Int](n - 1 max 1)
    val childR = new Array[Int](n - 1 max 1)
    val height = new Array[Double](n - 1 max 1)
    val sz = Array.fill(maxNodes)(1)
    var next = n
    mstEdges.sortBy(e => (e._3, e._1, e._2)).foreach { case (a, b, w) =>
      val ra = find(idx(a)); val rb = find(idx(b))
      if (ra != rb) {
        val id = next; next += 1
        childL(id - n) = ra; childR(id - n) = rb; height(id - n) = w
        sz(id) = sz(ra) + sz(rb)
        parent(ra) = id; parent(rb) = id
      }
    }
    val roots = (0 until next).filter(i => find(i) == i)

    def leavesOf(node: Int): List[Int] = {
      var acc = List.empty[Int]
      val stack = mutable.Stack(node)
      while (stack.nonEmpty) {
        val x = stack.pop()
        if (x < n) acc ::= x
        else { stack.push(childL(x - n)); stack.push(childR(x - n)) }
      }
      acc
    }

    // ---- condensed tree ----
    // rows: (parentCluster, Left(point) | Right(childCluster), λ, size)
    final case class CRow(parent: Int, point: Int, childCluster: Int,
        lambda: Double, size: Int)
    val rows = mutable.ArrayBuffer[CRow]()
    val lambdaBirth = mutable.Map[Int, Double]()
    val clusterParent = mutable.Map[Int, Int]() // condensed child → parent
    var nextCluster = 0
    def newCluster(birth: Double, par: Int): Int = {
      val c = nextCluster; nextCluster += 1
      lambdaBirth(c) = birth
      if (par >= 0) clusterParent(c) = par
      c
    }

    val mcs = minClusterSize
    // The kNN candidate graph can leave the MST a FOREST (true HDBSCAN's
    // complete graph is always connected). Semantically that equals a
    // single tree whose top edge has weight → ∞: a VIRTUAL super-root
    // splits into the components at λ → 0, so each big component becomes a
    // candidate cluster. With exactly one component the virtual root is
    // transparent and its single child takes the true root's role
    // (never selectable — allow_single_cluster=False).
    val virtualRoot = newCluster(0.0, -1)
    val bigRoots = roots.count(r => r >= n && sz(r) >= mcs)
    val rootLike = mutable.Set[Int]()
    roots.foreach { root =>
      if (root >= n && sz(root) >= mcs) {
        val rootCluster = newCluster(0.0, virtualRoot)
        rows += CRow(virtualRoot, -1, rootCluster, 0.0, sz(root))
        if (bigRoots == 1) rootLike += rootCluster
        val stack = mutable.Stack[(Int, Int)]((root, rootCluster))
        while (stack.nonEmpty) {
          val (node, cid) = stack.pop()
          val l = childL(node - n); val r = childR(node - n)
          val lam = if (height(node - n) > 0.0) 1.0 / height(node - n) else 1e30
          val bigL = sz(l) >= mcs; val bigR = sz(r) >= mcs
          if (bigL && bigR) {
            val cl = newCluster(lam, cid)
            val cr = newCluster(lam, cid)
            rows += CRow(cid, -1, cl, lam, sz(l))
            rows += CRow(cid, -1, cr, lam, sz(r))
            stack.push((l, cl)); stack.push((r, cr))
          } else if (bigL) {
            leavesOf(r).foreach(p => rows += CRow(cid, p, -1, lam, 1))
            if (l >= n) stack.push((l, cid))
            else rows += CRow(cid, l, -1, lam, 1) // unreachable: sz(l) ≥ mcs ≥ 2
          } else if (bigR) {
            leavesOf(l).foreach(p => rows += CRow(cid, p, -1, lam, 1))
            if (r >= n) stack.push((r, cid))
            else rows += CRow(cid, r, -1, lam, 1)
          } else {
            (leavesOf(l) ++ leavesOf(r)).foreach(p => rows += CRow(cid, p, -1, lam, 1))
          }
        }
      } else {
        // component smaller than mcs: its points fall out of the virtual
        // root at λ = 0 (zero stability contribution) → noise
        leavesOf(root).foreach(p => rows += CRow(virtualRoot, p, -1, 0.0, 1))
      }
    }

    // ---- stability + Excess-of-Mass selection ----
    val stability = Array.fill(nextCluster)(0.0)
    rows.foreach { r =>
      stability(r.parent) += (r.lambda - lambdaBirth(r.parent)) * r.size
    }
    val childrenOf = (0 until nextCluster)
      .map(c => c -> mutable.ArrayBuffer[Int]()).toMap
    clusterParent.foreach { case (c, p) => childrenOf(p) += c }
    // never-selectable: the virtual root, plus the single component root
    // when the forest is actually one tree (allow_single_cluster=False)
    val isRoot = (0 until nextCluster).filter(!clusterParent.contains(_)).toSet ++ rootLike
    val selected = Array.fill(nextCluster)(false)
    val subtreeStab = Array.fill(nextCluster)(0.0)
    // children have larger ids than parents (allocation order) → reverse id
    // order IS bottom-up
    (nextCluster - 1 to 0 by -1).foreach { c =>
      val kids = childrenOf(c)
      // a childless ROOT is never selected (allow_single_cluster=False —
      // matching the reference library's default semantics)
      if (kids.isEmpty) { selected(c) = !isRoot(c); subtreeStab(c) = stability(c) }
      else {
        val s = kids.map(subtreeStab).sum
        if (stability(c) > s && !isRoot(c)) {
          selected(c) = true; subtreeStab(c) = stability(c)
        } else subtreeStab(c) = s
      }
    }
    // top-down: a selected cluster absorbs its whole condensed subtree
    val winner = Array.fill(nextCluster)(-1)
    def markSubtree(c: Int, w: Int): Unit = {
      winner(c) = w
      childrenOf(c).foreach(markSubtree(_, w))
    }
    def walk(c: Int): Unit =
      if (selected(c)) markSubtree(c, c)
      else childrenOf(c).foreach(walk)
    isRoot.foreach(walk)

    // ---- labels: min member point id per winning cluster ----
    val memberOf = mutable.Map[Int, Int]() // point idx → winning cluster
    rows.foreach { r =>
      if (r.point >= 0 && winner(r.parent) >= 0)
        memberOf(r.point) = winner(r.parent)
    }
    val minId = mutable.Map[Int, Long]()
    memberOf.foreach { case (p, c) =>
      val id = pointIds(p)
      minId(c) = math.min(minId.getOrElse(c, Long.MaxValue), id)
    }
    pointIds.zipWithIndex.map { case (id, i) =>
      id -> memberOf.get(i).map(minId).getOrElse(-1L)
    }.toMap
  }
}
