package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.util.Checkpointer.CheckpointSyntax

/** DIAGNOSTIC TOOL, not product surface: phase-level wall-clock profiler
  * for the iterative graph suite (built for the round-3 Leiden/Louvain
  * tier work). Not part of the library API and not benchmarked; kept for
  * future per-phase regressions hunts. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val g = t("projection(build+cache)") {
      Projection.supplierGraph(spark, sfDir)
    }
    // warm run
    t("leiden(warm-up run)") { Leiden.run(g, distRounds = 2).count() }

    (1 to 2).foreach { i =>
      t(s"leiden(full run $i)") { Leiden.run(g, distRounds = 2).count() }
    }
    // in-memory tier breakdown
    val (sym0, n0, m20) = Louvain.symWithStats(g)
    println(s"PROFILE nSymEdges=$n0 m2=$m20")
    import spark.implicits._
    val collected = t("tier: collect sym") { sym0.as[(Long, Long, Double)].collect() }
    t("tier: SeqCommunity.build") { SeqCommunity.build(collected) }
    t("tier: seq leiden") { Leiden.leidenInMemory(collected, m20) }
    t("tier: seq leiden 2nd") { Leiden.leidenInMemory(collected, m20) }
    t("tier: seq louvain") { Louvain.localLouvain(collected, m20) }
    t("tier: seq localMoveOnly") { SeqCommunity.localMoveOnly(collected, m20) }

    // setup breakdown (mirrors distributedPhase internals)
    val sym = t("setup: symmetrize+ckpt") {
      Projection.symmetrize(g)
        .groupBy("src", "dst").agg(sum("weight").as("weight"))
        .cp()
    }
    val m2 = t("setup: m2 agg") { sym.agg(sum("weight")).first().getDouble(0) }
    t("setup: deg ckpt") {
      sym.groupBy(col("src").as("node")).agg(sum("weight").as("k")).cp()
    }
    println(s"PROFILE m2=$m2 edges=${sym.count()}")

    // phase breakdown (mirrors Leiden.run internals)
    val phase = t("phase1: distributedPhase(2)") {
      val p = Louvain.distributedPhase(g, 2)
      p.comm.count(); p
    }
    val ref = t("phase2: refineDistributed(2)") {
      val r = Leiden.refineDistributed(phase, 2)
      r.count(); r
    }
    t("phase3: contract+coarsen+finish") {
      val contractedRef = phase.sym
        .join(ref.select(col("node").as("src"), col("ref").as("rsrc")), "src")
        .join(ref.select(col("node").as("dst"), col("ref").as("rdst")), "dst")
        .groupBy(col("rsrc"), col("rdst")).agg(sum("weight").as("weight"))
        .cp()
      contractedRef.count()
    }
    spark.stop()
  }
}
