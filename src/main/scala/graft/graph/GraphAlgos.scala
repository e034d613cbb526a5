package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.graphx.lib.{ConnectedComponents => CCLib, LabelPropagation => LPLib}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphX-hosted algorithms (SURVEY.md G4 + connected components).
  * Canonical-edge DataFrames in, (node, label) DataFrames out. */
object GraphAlgos {

  /** Partition count proportional to edge volume (~50k edges/partition,
    * capped by cluster parallelism): iterative GraphX jobs pay per-partition
    * scheduling overhead every superstep, so a small graph on 32 partitions
    * is pure waste, while message-heavy supersteps (LPA label maps) still
    * need real parallelism once edges reach the hundreds of thousands. */
  private[graph] def sizedPartitions(edges: DataFrame, nEdges: Long): Int = {
    val par = edges.sparkSession.sparkContext.defaultParallelism
    math.max(2, math.min(par, (nEdges / 50000L).toInt + 1))
  }

  private def toGraph(edges: DataFrame): Graph[Int, Int] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val cached = edges.select(col("src").cast("long"), col("dst").cast("long")).cache()
    val p = sizedPartitions(cached, cached.count())
    val edgeRdd = cached.as[(Long, Long)].rdd
      .coalesce(p).map { case (s, d) => Edge(s, d, 1) }
    Graph.fromEdges(edgeRdd, defaultValue = 0)
  }

  /** Synchronous label propagation (G4; reference GDS call at
    * project/metrics/community_detection.py:60-62). GraphX built-in treats
    * each edge bidirectionally. */
  def labelPropagation(edges: DataFrame, maxSteps: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    LPLib.run(toGraph(edges), maxSteps).vertices.toDF("node", "label")
  }

  /** Synchronous label propagation as pure DataFrame iteration — same
    * semantics as the GraphX version (every node adopts its neighborhood's
    * most frequent label each step; deterministic smallest-label
    * tie-break), but each superstep is two shuffles of (node, label)
    * pairs with map-side combine instead of Pregel's per-vertex
    * Map[label,count] messages — dense graphs propagate an order of
    * magnitude cheaper, and the same plan scales out. */
  def labelPropagationDF(edges: DataFrame, maxSteps: Int = 5): DataFrame = {
    val sym = Projection.symmetrize(edges).select(col("src"), col("dst"))
      .localCheckpoint() // edge set reused every superstep
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (step <- 1 to maxSteps) {
      val counts = sym
        .join(labels.select(col("node").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src"), col("nl"))
        .agg(count(lit(1)).as("cnt"))
      labels = counts
        .groupBy(col("src").as("node"))
        .agg(max(struct(col("cnt"), (lit(0L) - col("nl")).as("negl"))).as("b"))
        .select(col("node"), (lit(0L) - col("b.negl")).as("label"))
      // supersteps chain LAZILY into one DAG (AQE re-plans each shuffle
      // stage from runtime stats); materialize every 3rd step only to
      // bound lineage/codegen depth — per-step eager actions were 5
      // scheduler round-trips of pure fixed overhead on a node-sized DF
      if (step % 3 == 0 && step < maxSteps) labels = labels.localCheckpoint()
    }
    labels.localCheckpoint() // lineage-free node-sized result
  }

  /** Connected components (free from GraphX; label = min vertex id). */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    CCLib.run(toGraph(edges)).vertices.toDF("node", "label")
  }
}
