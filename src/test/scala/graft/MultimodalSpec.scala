package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.multimodal.Multimodal
import graft.schemas.Tables

class MultimodalSpec extends SparkSpec with Matchers {

  private lazy val media =
    Multimodal.fromDocuments(Tables.load(spark, "/root/testdata/sf0.001", "documents"))
      .cache()

  test("media table: binary payload + typed metadata struct, total partition") {
    media.schema("payload").dataType.typeName shouldBe "binary"
    media.schema("meta").dataType.typeName shouldBe "struct"
    media.select("kind").distinct().count() shouldBe 3
    media.count() shouldBe 500
  }

  test("feature extraction: fixed-dim normalized features, deterministic") {
    val f1 = Multimodal.extractFeatures(media).cache()
    f1.count() shouldBe 500
    val row = f1.filter(col("media_id") === 0).collect()(0)
    row.getAs[Seq[Double]]("features").length shouldBe 16
    row.getAs[Seq[Double]]("features").sum shouldBe 1.0 +- 1e-9 // L1-normalized histogram
    val f2 = Multimodal.extractFeatures(media)
    f1.select("media_id", "features").collect().toSet shouldBe
      f2.select("media_id", "features").collect().toSet
  }

  test("frame sampling: one payload row → N frame rows with partitioned bytes") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 2), 4)
    frames.count() shouldBe 4
    frames.select(min(col("frame_idx")), max(col("frame_idx"))).collect()(0)
      .toSeq shouldBe Seq(0, 3)
  }

  test("resize bounds payload size") {
    val resized = Multimodal.resizePayload(media, 10)
    resized.select(max(org.apache.spark.sql.functions.length(col("payload"))))
      .collect()(0).getInt(0) should be <= 10
  }
}
