package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.ZOrderLayout

/** Z-order layout (q91's operator): interleave bijectivity, the tile
  * property that makes every bin a bounded rectangle (= the two-sided
  * file-skipping guarantee), and the layout writer's range invariants. */
class ZOrderSpec extends SparkSpec with Matchers {

  test("zValue is a bijection [0,32)x[0,32) -> [0,1024)") {
    val s = spark
    import s.implicits._
    val grid = s.range(32).select($"id".as("x"))
      .crossJoin(s.range(32).select($"id".as("y")))
    val z = grid.select(ZOrderLayout.zValue($"x", $"y", 5).as("z"))
    z.distinct().count() shouldBe 1024L
    val mm = z.agg(min($"z"), max($"z")).collect()(0)
    mm.getLong(0) shouldBe 0L
    mm.getLong(1) shouldBe 1023L
  }

  test("dropping 2b low z bits identifies the (x>>b, y>>b) tile exactly") {
    val s = spark
    import s.implicits._
    val pts = s.range(256).select($"id".as("x"))
      .crossJoin(s.range(256).select($"id".as("y")))
      .sample(withReplacement = false, 0.1, seed = 7)
    val binned = pts
      .select($"x", $"y", shiftright(ZOrderLayout.zValue($"x", $"y", 8), 8).as("bin"))
      .groupBy($"bin")
      .agg(countDistinct(shiftright($"x", 4), shiftright($"y", 4)).as("tiles"))
    binned.agg(max($"tiles")).collect()(0).getLong(0) shouldBe 1L
  }

  test("layoutByZ preserves rows and yields non-overlapping z ranges across partitions") {
    val s = spark
    import s.implicits._
    val df = s.range(5000)
      .select(($"id" % 97).as("a"), ($"id" % 89).as("b"), $"id".as("payload"))
    val laid = ZOrderLayout.layoutByZ(df, "a", "b", numPartitions = 8)
    laid.columns.toSeq shouldBe df.columns.toSeq
    laid.count() shouldBe 5000L
    // recompute z on the laid-out frame and check partition ranges are ordered
    val mx = df.agg(max($"a").as("zmx"), max($"b").as("zmy"))
    val withZ = laid.crossJoin(broadcast(mx))
      .select(spark_partition_id().as("pid"),
        ZOrderLayout.zValue(
          ZOrderLayout.quantize("a", "zmx", 8),
          ZOrderLayout.quantize("b", "zmy", 8), 8).as("z"))
      .groupBy($"pid").agg(min($"z").as("zmin"), max($"z").as("zmax"))
      .orderBy($"pid")
      .collect()
    withZ.sliding(2).foreach {
      case Array(lo, hi) => lo.getAs[Long]("zmax") should be <= hi.getAs[Long]("zmin")
      case _ =>
    }
  }
}
