package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.graphx.lib.{ConnectedComponents => CCLib, LabelPropagation => LPLib}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** GraphX-hosted algorithms (SURVEY.md G4 + connected components).
  * Canonical-edge DataFrames in, (node, label) DataFrames out. */
object GraphAlgos {

  private def toGraph(edges: DataFrame): Graph[Int, Int] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd.map { case (s, d) => Edge(s, d, 1) }
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

  /** Connected components (free from GraphX; label = min vertex id). */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    CCLib.run(toGraph(edges)).vertices.toDF("node", "label")
  }
}
