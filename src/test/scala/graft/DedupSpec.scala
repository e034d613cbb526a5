package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.dedup.Dedup
import graft.schemas.Tables

class DedupSpec extends SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH finds every true near-dup pair (recall vs brute force)") {
    val docs = Tables.load(spark, dir, "documents")
    val sh = Dedup.shingled(docs, "doc_id", "text").cache()
    // brute-force ground truth (only viable at test scale)
    val truth = Dedup.jaccardOfPairs(
      sh.select(col("doc_id").as("doc_a")).crossJoin(sh.select(col("doc_id").as("doc_b")))
        .filter(col("doc_a") < col("doc_b")), sh)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    truth should not be empty // the generator plants near-dups
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh shouldBe truth // LSH (16 bands × 4 rows) recalls all ≥0.5 pairs here,
    //                    and the exact-verify stage removes false positives
  }

  test("cosine-LSH near-dups equal brute force on hashed doc embeddings (q24 ground truth)") {
    import graft.functions.TextExpressions.embed_text
    // both test scales — sf0.01 is the driver's correctness SF
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val docs = Tables.load(spark, d, "documents")
        .select(col("doc_id"), embed_text(col("text"), 64).as("v"))
      val truth = Dedup.cosineNearDupsBrute(docs, "doc_id", "v", tau = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      truth should not be empty // planted rewordings embed nearly identically
      val lsh = Dedup.cosineNearDups(docs, "doc_id", "v", tau = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      lsh shouldBe truth // banding recalls every ≥0.9 pair here (miss ≈ 2.6e-3
      //                    per borderline pair, deterministic hyperplanes);
      //                    the exact-verify stage removes all false positives
    }
  }

  test("exact dedup groups: one group per normalized text") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDuplicateGroups(docs, "doc_id", "text").collect()
    out.length shouldBe 2
    out.find(_.getLong(1) == 2L).get.getLong(2) shouldBe 1L // canonical = min id
  }

  test("SimHash pigeonhole banding finds planted near-identical docs") {
    val s = spark
    import s.implicits._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("token7", "tokenX")), // one-token change → tiny hamming
      (3L, (100 to 140).map(i => s"zz$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
    pairs should not contain ((2L, 3L))
  }
}
