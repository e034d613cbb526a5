package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions, VectorSum}

/** FastRP node embeddings (SURVEY.md G1; reference GDS call at
  * project/metrics/community_detection.py:40-45, dim 128 weighted):
  * very sparse random projection init (Achlioptas ±√3 entries, seeded by
  * deterministic per-(node, dim) hashing — reproducible across runs with no
  * random state), then k rounds of weighted-neighbor averaging with L2
  * normalization, combined with per-iteration weights (Chen et al., FastRP).
  *
  * Each round is one shuffle: edges ⋈ vectors on src, scale by weight,
  * partial-aggregated element-wise sum on dst. State is localCheckpoint'ed
  * per round (lineage discipline for driver-looped jobs, SURVEY.md §4).
  */
object FastRP {

  /** @param edges canonical (src, dst, weight)
    * @param iterationWeights β_k per propagation round (round 1..k)
    * @return (node, embedding array<double> unit-norm) */
  def run(edges: DataFrame, dim: Int = 64,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0)): DataFrame = {
    val sym = Projection.symmetrize(edges)
      .groupBy("src", "dst").agg(sum("weight").as("weight"))
      .localCheckpoint()
    val deg = sym.groupBy(col("src").as("node")).agg(sum("weight").as("k"))

    // sparse ±√3 seeded init: hash(node, j) mod 6 → {0:+√3, 1:−√3, 2..5: 0}
    val s = math.sqrt(3.0)
    def initVec(node: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val h = pmod(xxhash64(node, j), lit(6))
        when(h === 0, lit(s)).when(h === 1, lit(-s)).otherwise(lit(0.0))
      })

    // cache() rather than localCheckpoint(): keeps size statistics visible,
    // so Catalyst broadcast-joins the (node-count-sized) vector table into
    // the edge join when it actually fits, and shuffles when it doesn't —
    // the right plan at every scale. Lineage depth is bounded by the
    // (small, fixed) iteration count.
    var vecs = deg.select(col("node"), initVec(col("node")).as("v")).cache()
    var combined = deg.select(col("node"),
      transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0)).as("acc"))

    for (beta <- iterationWeights) {
      // v_next(u) = normalize( Σ_nbr (w/deg_u)·v(nbr) )
      val msgs = sym
        .join(vecs.select(col("node").as("src"), col("v")), "src")
        .select(col("dst").as("node"),
          transform(col("v"), x => x * col("weight")).as("wv"))
        .groupBy("node")
        .agg(VectorSum(col("wv")).as("sv"))
      val next = msgs.join(deg, "node")
        .select(col("node"),
          VectorFunctions.l2normalize(transform(col("sv"), x => x / col("k"))).as("v"))
      vecs = deg.select(col("node")).join(next, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("v"), initVec(col("node"))).as("v"))
        .cache()
      if (beta != 0.0) {
        combined = combined.join(vecs, "node")
          .select(col("node"),
            zip_with(col("acc"), col("v"), (a, x) => a + lit(beta) * x).as("acc"))
      }
    }
    combined.select(col("node"),
      VectorFunctions.l2normalize(col("acc")).as("embedding"))
  }
}
