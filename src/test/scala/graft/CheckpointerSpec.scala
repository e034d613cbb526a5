package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.dedup.Dedup
import graft.schemas.Tables
import graft.util.Checkpointer

/** The reliable-checkpoint escape hatch (r16 verdict item 2): every
  * operator checkpoint routes through [[graft.util.Checkpointer.cp]] —
  * default `localCheckpoint`, reliable `Dataset.checkpoint` when
  * `graft.checkpoint.dir` is set. Both modes must be verdict-identical
  * on a checkpoint-heavy group-dedup query (gid stage, join-backs,
  * components, size attach — ~15 cp calls end to end). */
class CheckpointerSpec extends SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("reliable mode == local mode on a group-dedup query (r16)") {
    Checkpointer.dir shouldBe None // default: localCheckpoint
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source")).limit(60)
    val docs = (0 until 3).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("source")))
      .reduce(_ unionByName _).localCheckpoint()
    def run() = Dedup
      .jaccardNearDupGroups(docs, "doc_id", "text", "source", 0.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val local = run()
    val cpDir = java.nio.file.Files
      .createTempDirectory("graft_reliable_cp").toString
    sys.props("graft.checkpoint.dir") = cpDir
    try {
      Checkpointer.dir shouldBe Some(cpDir)
      val reliable = run()
      reliable shouldBe local
      // reliable mode actually wrote checkpoint state to the directory
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(cpDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      wrote should be > 0L
    } finally {
      sys.props.remove("graft.checkpoint.dir")
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(cpDir))
    }
    local should not be empty
    graft.util.BlockRelease.release(docs)
  }
}
