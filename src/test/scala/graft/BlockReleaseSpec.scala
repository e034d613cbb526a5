package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.dedup.Dedup
import graft.graph.{GraphAlgos, KCore, Leiden, Louvain}

/** Regression net for the round-4 leak class: `Dataset.unpersist` never
  * releases `localCheckpoint` blocks, so checkpoint-per-call operators
  * that don't release their scratch state stack blocks in the block
  * manager for the life of the session (measured: the 5th+ consecutive
  * label-propagation call went 1.2 s → 5.5 s). Every operator is
  * expected to free what it checkpoints — this spec calls the heaviest
  * offenders REPEATEDLY and asserts the session's RDD block population
  * does not grow with the call count. */
class BlockReleaseSpec extends SparkSpec with Matchers {

  private def rddBlocks(): Int =
    org.apache.spark.SparkEnv.get.blockManager.master
      .getStorageStatus.map(_.rddBlocks.size).sum

  test("repeated operator calls do not accumulate checkpoint blocks") {
    val s = spark
    import s.implicits._
    val edges = (0L until 400L).flatMap(i =>
        Seq((i, (i + 1) % 400, 1.0), (i, (i + 7) % 400, 1.0)))
      .toDF("src", "dst", "weight")
    val docs = (0L until 60L)
      .map(i => (i, s"alpha beta gamma delta epsilon token$i zeta eta theta"))
      .toDF("doc_id", "text").withColumn("source", lit("s"))

    def sweep(): Unit = {
      GraphAlgos.labelPropagationDF(edges, maxSteps = 3).count()
      GraphAlgos.connectedComponents(edges).count()
      Louvain.run(edges).count()
      Leiden.run(edges).count()
      KCore.run(edges).count()
      Dedup.minhashNearDups(docs, "doc_id", "text").count()
      ()
    }
    sweep() // warm: session-lifetime state (caches) may appear here
    val after1 = rddBlocks()
    (1 to 3).foreach(_ => sweep())
    val after4 = rddBlocks()
    // three further full sweeps may not grow the block population by
    // more than a rounding margin — a leaky operator adds its
    // edge/bucket-sized checkpoint EVERY call and fails this immediately
    (after4 - after1) should be <= 8
  }
}
