package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.BlockPairs

/** EXACT distributed k-nearest-neighbor JOIN over an embedding column —
  * the kNN-GRAPH constructor (deduplication clustering, SemDeDup-style
  * semantic neighborhoods, graph-based curation all start from this
  * join), built on the shared BLOCK-PAIR EDGE PARTITIONING skeleton
  * ([[graft.util.BlockPairs]] — one replicate + one pair-charging rule,
  * also the HDBSCAN exact tier's):
  *
  *  - every point PAIR is evaluated in EXACTLY ONE memory-bounded task
  *    ([[graft.util.BlockPairs.charged]]);
  *  - each task keeps, per point, its local k smallest (d², nbr) under
  *    the strict lexicographic order; a point's true global k-th
  *    neighbor has at most k−1 closer pairs anywhere, so it survives its
  *    task's local cut — the union (≤ n·B·k rows of 24-byte scalars,
  *    never vectors) provably contains the global top-k;
  *  - one per-point window (row_number over (d², nbr)) takes the exact
  *    global answer.
  *
  * Cost honesty (r10 verdict correction): Θ(n²) distance evaluations AND
  * a quadratic replicate shuffle — the replicate moves n·B =
  * n²/taskTarget full-vector rows into the groupByKey, which dominates
  * bytes moved. The bounded guarantees are per-task memory
  * (O(taskTarget · (dim + k))) and the POST-kernel shuffle (n·B·k scalar
  * rows, never vectors, never n² rows); B grows with n so executors stay
  * flat at 100 TB. Distances are d² (no sqrt) accumulated in
  * vector-index order — the same IEEE op sequence any engine replays,
  * which is what puts the operator under a FULL hash oracle (q102)
  * rather than a surface pin.
  */
object Knn {

  /** (id, rank, nbr, d2): the exact k nearest neighbors of every point
    * (self excluded), rank 1..k by (d², nbr id) — deterministic under
    * distance ties. Points in an n ≤ k corpus return their n−1 rows. */
  def exactKnnJoin(points: DataFrame, idCol: String, vecCol: String, k: Int,
      taskTarget: Int = 2048): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    require(taskTarget >= 2, s"taskTarget ($taskTarget) must be >= 2")
    val spark = points.sparkSession
    import spark.implicits._
    val n = points.count()
    val nBlocks = BlockPairs.numBlocks(n, taskTarget)
    val rep = BlockPairs.replicate(
        points.select(col(idCol).as("id"), col(vecCol).as("v")),
        "id", "knn", nBlocks)
      .as[(Long, Int, Long, Array[Double])]
    val cand = rep.groupByKey(_._1).flatMapGroups { (task, it) =>
      val pts = it.toArray
      val diag = BlockPairs.isDiagonal(task, nBlocks)
      val m = pts.length
      // per-point local top-k under (d², nbr): parallel sorted arrays
      val kd = Array.fill(m)(Array.fill(k)(Double.MaxValue))
      val kn = Array.fill(m)(new Array[Long](k))
      def add(i: Int, d: Double, nbr: Long): Unit = {
        val ds = kd(i); val ns = kn(i)
        if (d < ds(k - 1) || (d == ds(k - 1) && nbr < ns(k - 1))) {
          var j = k - 1
          while (j > 0 && (ds(j - 1) > d || (ds(j - 1) == d && ns(j - 1) > nbr))) {
            ds(j) = ds(j - 1); ns(j) = ns(j - 1); j -= 1
          }
          ds(j) = d; ns(j) = nbr
        }
      }
      var x = 0
      while (x < m) {
        val bx = pts(x)._2; val vx = pts(x)._4
        var y = x + 1
        while (y < m) {
          if (BlockPairs.charged(diag, bx, pts(y)._2)) {
            val vy = pts(y)._4
            var s = 0.0; var d0 = 0
            while (d0 < vx.length) { val t = vx(d0) - vy(d0); s += t * t; d0 += 1 }
            add(x, s, pts(y)._3); add(y, s, pts(x)._3)
          }
          y += 1
        }
        x += 1
      }
      pts.indices.iterator.flatMap { i =>
        kd(i).iterator.zip(kn(i).iterator)
          .filter(_._1 < Double.MaxValue)
          .map { case (d, nb) => (pts(i)._3, nb, d) }
      }
    }.toDF("id", "nbr", "d2")
    val w = Window.partitionBy(col("id")).orderBy(col("d2").asc, col("nbr").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank").cast("long").as("rank"),
        col("nbr"), col("d2"))
  }
}
