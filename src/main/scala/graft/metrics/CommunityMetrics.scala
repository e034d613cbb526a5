package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.graph.Projection

/** Community / echo-chamber metrics as closed-form one-pass aggregations
  * (SURVEY.md §2.4 A5–A12; reference python loops at
  * project/metrics/metrics.py).
  *
  * The reference iterates Python-side per community — O(C·E) passes
  * (metrics.py:148-189). Every metric here is instead a constant number of
  * grouped aggregations over the edge and membership relations — the
  * signature algorithmic win of the Spark engine (SURVEY.md §4).
  */
object CommunityMetrics {

  /** Modularity Q = Σ_c [L_c/m − (d_c/2m)²] of a labeled undirected
    * weighted graph (A10; replaces NetworkX community.modularity at
    * metrics.py:57-98). Three aggregations, no iteration.
    *
    * @param edges  canonical src<dst weighted edges
    * @param labels (node, label)
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges
      .join(labels.select(col("node").as("src"), col("label").as("lsrc")), "src")
      .join(labels.select(col("node").as("dst"), col("label").as("ldst")), "dst")
    val agg = e.agg(
      sum(col("weight")).as("m"),
      sum(when(col("lsrc") === col("ldst"), col("weight")).otherwise(0.0)).as("intra"))
    val degByLabel = Projection.degrees(edges)
      .join(labels, "node")
      .groupBy(col("label"))
      .agg(sum(col("degree")).as("d_c"))
    val sumSq = degByLabel.agg(sum(col("d_c") * col("d_c")).as("sum_dc_sq"),
      count(lit(1)).as("n_communities"))
    agg.crossJoin(sumSq)
      .select(
        (col("intra") / col("m") -
          col("sum_dc_sq") / (lit(4.0) * col("m") * col("m"))).as("modularity"),
        col("m"), col("n_communities"))
  }

  /** Per-community structural metrics in ONE pass over the labeled edge
    * relation: internal/cut weights, volume, conductance, internal density
    * (A7/A8/A9; metrics.py:109-126,165-189). */
  def structure(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges
      .join(labels.select(col("node").as("src"), col("label").as("lsrc")), "src")
      .join(labels.select(col("node").as("dst"), col("label").as("ldst")), "dst")
    // each edge contributes to its endpoints' communities
    val perCommunity = e.select(
        explode(array(
          struct(col("lsrc").as("label"),
            when(col("lsrc") === col("ldst"), col("weight")).otherwise(0.0).as("internal_w"),
            when(col("lsrc") =!= col("ldst"), col("weight")).otherwise(0.0).as("cut_w"),
            when(col("lsrc") === col("ldst"), 1L).otherwise(0L).as("internal_n")),
          struct(col("ldst").as("label"),
            lit(0.0).as("internal_w"), // count intra edge once (on src side)
            when(col("lsrc") =!= col("ldst"), col("weight")).otherwise(0.0).as("cut_w"),
            lit(0L).as("internal_n")))).as("x"))
      .select(col("x.*"))
      .groupBy(col("label"))
      .agg(sum(col("internal_w")).as("internal_weight"),
        sum(col("cut_w")).as("cut_weight"),
        sum(col("internal_n")).as("internal_edge_count"))
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("size"))
    val vol = Projection.degrees(edges).join(labels, "node")
      .groupBy(col("label")).agg(sum(col("degree")).as("volume"))
    val m = edges.agg(sum(col("weight"))).first().getDouble(0)
    sizes
      .join(perCommunity, Seq("label"), "left")
      .join(vol, Seq("label"), "left")
      .na.fill(0.0, Seq("internal_weight", "cut_weight", "volume"))
      .na.fill(0L, Seq("internal_edge_count"))
      .withColumn("conductance",
        when(least(col("volume"), lit(2.0 * m) - col("volume")) > 0.0,
          col("cut_weight") / least(col("volume"), lit(2.0 * m) - col("volume"))))
      .withColumn("density",
        when(col("size") > 1,
          col("internal_edge_count").cast("double") * 2.0 /
            (col("size") * (col("size") - 1))))
  }

  /** Echo Chamber Score per community from member vectors, closed form
    * (A12/A4–A6; replaces the O(C·E) python loop at metrics.py:127-205).
    *
    * With unit vectors: mean intra-pair cosine = (‖S_c‖² − n_c)/(n_c(n_c−1)),
    * mean cross-pair cosine = S_c·(S − S_c)/(n_c(N − n_c)) — so the whole
    * table needs one vector-sum aggregation per community plus a broadcast
    * of the global sum. O(N·dim) total, no pair join: THE 100 TB path.
    *
    * @param members (label, v) with v already L2-normalized array<double>
    */
  def ecs(members: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions
    val byLabel = members
      .groupBy(col("label"))
      .agg(graft.functions.VectorMean(col("v")).as("centroid"),
        count(lit(1)).as("n_c"))
      .withColumn("s_c", transform(col("centroid"), x => x * col("n_c")))
    val totals = byLabel.agg(
      graft.functions.VectorMean(col("s_c")).as("mean_s"),
      count(lit(1)).as("n_labels"),
      sum(col("n_c")).as("n_total"))
      .withColumn("s_tot", transform(col("mean_s"), x => x * col("n_labels")))
      .select(col("s_tot"), col("n_total"))
    byLabel.crossJoin(broadcast(totals))
      .withColumn("cohesion",
        when(col("n_c") > 1,
          (VectorFunctions.dot(col("s_c"), col("s_c")) - col("n_c")) /
            (col("n_c") * (col("n_c") - lit(1)))))
      .withColumn("separation",
        when(col("n_total") > col("n_c"),
          lit(1.0) - VectorFunctions.dot(col("s_c"),
            zip_with(col("s_tot"), col("s_c"), (t, s) => t - s)) /
            (col("n_c") * (col("n_total") - col("n_c")))))
      .withColumn("ecs", col("cohesion") * col("separation"))
      .select(col("label"), col("n_c"), col("cohesion"), col("separation"), col("ecs"))
  }

  /** Global homophily: mean cosine similarity across graph edges minus mean
    * similarity of random pairs (A5; metrics.py:101-106 computes the edge
    * mean). `nodeVecs`: (node, v) unit vectors. */
  def homophily(edges: DataFrame, nodeVecs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions._
    val e = edges
      .join(nodeVecs.select(col("node").as("src"), col("v").as("va")), "src")
      .join(nodeVecs.select(col("node").as("dst"), col("v").as("vb")), "dst")
    e.agg(avg(dot(col("va"), col("vb"))).as("edge_mean_sim"),
      count(lit(1)).as("n_edges"))
  }
}
