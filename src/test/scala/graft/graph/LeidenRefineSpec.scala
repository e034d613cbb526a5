package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** In-package spec (refineDistributed is private[graph]): the r8 round-1
  * fast path must reproduce the general-shape round-1 EXACTLY — same gain
  * formula, same tie-break, same parity damping — it only removes joins
  * that compute trivialities when every refined group is a singleton. */
class LeidenRefineSpec extends graft.SparkSpec with Matchers {

  /** The pre-r8 general round-1 body, kept verbatim as the equality
    * reference: with ref = identity this is what the fast path replaces. */
  private def generalRoundOne(phase: Louvain.Phase): DataFrame = {
    val comm = phase.comm
    val deg = phase.deg
    val m2 = phase.m2
    val sym = phase.sym
    val intra = sym
      .join(comm.select(col("node").as("src"), col("comm").as("csrc")), "src")
      .join(comm.select(col("node").as("dst"), col("comm").as("cdst")), "dst")
      .filter(col("csrc") === col("cdst"))
      .select(col("src"), col("dst"), col("weight"))
    val ref = comm.select(col("node"), col("node").as("ref"))
    val refAgg = ref.join(deg, "node")
      .groupBy(col("ref"))
      .agg(count(lit(1)).as("sz"), sum(col("k")).as("tot"))
    val singles = ref.join(refAgg.select(col("ref"), col("sz")), "ref")
      .filter(col("sz") === 1).select(col("node"))
    val cand = intra
      .join(singles.select(col("node").as("src")), "src", "left_semi")
      .join(ref.select(col("node").as("dst"), col("ref").as("rnbr")), "dst")
      .groupBy(col("src").as("node"), col("rnbr"))
      .agg(sum("weight").as("w_ur"))
      .join(deg, "node")
      .join(refAgg.select(col("ref").as("r2"), col("tot")), col("rnbr") === col("r2"))
      .filter(col("rnbr") =!= col("node"))
      .withColumn("gain", col("w_ur") - col("k") * col("tot") / lit(m2))
      .filter(col("gain") > 0.0)
    val best = cand
      .groupBy(col("node"))
      .agg(max(struct(col("gain"), (lit(0L) - col("rnbr")).as("negr"))).as("b"))
      .select(col("node").as("mn"), (lit(0L) - col("b.negr")).as("target"))
    val parity = pmod(xxhash64(col("r.node")) + lit(0), lit(2)) === 0
    ref.as("r")
      .join(best, col("r.node") === col("mn"), "left")
      .select(col("r.node").as("node"),
        when(col("target").isNotNull && parity, col("target"))
          .otherwise(col("r.ref")).as("ref"))
  }

  test("round-1 fast path ≡ general shape on a mixed graph") {
    val s = spark
    import s.implicits._
    // two triangles + a chain + an isolated edge, uneven weights
    val edges = Seq(
      (1L, 2L, 2.0), (2L, 3L, 1.0), (1L, 3L, 1.5),
      (4L, 5L, 1.0), (5L, 6L, 2.0), (4L, 6L, 1.0),
      (3L, 4L, 0.5), (7L, 8L, 1.0), (6L, 7L, 0.25))
      .toDF("src", "dst", "weight")
    val (sym, _, m2) = Louvain.symWithStats(edges)
    val phase = Louvain.distributedPhaseSym(sym, distRounds = 2, m2)
    val fast = Leiden.refineDistributed(phase, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val general = generalRoundOne(phase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe general
    fast.keySet shouldBe (1L to 8L).toSet // total over all nodes
  }
}
