package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.TopKByScore

/** Grouped top-k aggregator (q93's operator): equivalence to the
  * window-rank formulation it replaces, order independence (the property
  * that makes map-side combine safe), and buffer-merge correctness. */
class TopKSpec extends SparkSpec with Matchers {

  test("agrees with window row_number on random data, including ties") {
    val s = spark
    import s.implicits._
    val df = s.range(2000).select(
      ($"id" % 13).as("g"),
      (xxhash64($"id") % 50).as("score"), // coarse → plenty of ties
      $"id".as("item"))
      .localCheckpoint()
    val viaAgg = df.groupBy($"g")
      .agg(TopKByScore($"score", $"item", 3).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("long").as("rank"),
        $"col._1".as("score"), $"col._2".as("item"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaWindow = df.select($"g", $"score", $"item",
        row_number().over(Window.partitionBy($"g")
          .orderBy($"score".desc, $"item".asc)).as("rank"))
      .filter($"rank" <= 3)
      .select($"g", $"rank".cast("long"), $"score", $"item")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    viaAgg shouldBe viaWindow
  }

  test("order independent: reduce over any permutation gives the same buffer") {
    val agg = new TopKByScore(4)
    val vals = Seq((5L, 1L), (5L, 2L), (9L, 7L), (1L, 3L), (9L, 4L), (3L, 8L))
    val expected = agg.finish(vals.foldLeft(agg.zero)(agg.reduce))
    Seq(vals.reverse, vals.sortBy(_._2), scala.util.Random.shuffle(vals)).foreach { p =>
      agg.finish(p.foldLeft(agg.zero)(agg.reduce)) shouldBe expected
    }
    expected shouldBe Seq((9L, 4L), (9L, 7L), (5L, 1L), (5L, 2L))
  }

  test("merge of split buffers == reduce of the union (map-side combine contract)") {
    val agg = new TopKByScore(3)
    val vals = (0 until 100).map(i => ((i * 37 % 19).toLong, i.toLong))
    val (l, r) = vals.splitAt(50)
    val whole = vals.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    merged shouldBe whole
  }
}
