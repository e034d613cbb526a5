package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.CmsSketch

/** Count-min sketch (q87's operator): admissibility, mergeability (the
  * property that makes it THE 100 TB frequency summary), and the
  * degenerate-width bound. */
class CmsSketchSpec extends SparkSpec with Matchers {

  private def tokFrame(words: Seq[String]) = {
    val s = spark
    import s.implicits._
    words.toDF("tok")
  }

  test("estimates are admissible (est >= true) and exact absent collisions") {
    val s = spark
    import s.implicits._
    val words = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val toks = tokFrame(words)
    val grid = CmsSketch.sketch(toks, "tok")
    val est = CmsSketch.estimates(grid, Seq("alpha", "beta", "gamma", "absent").toDF("t"), "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est("alpha") should be >= 7L
    est("beta") should be >= 3L
    est("gamma") should be >= 1L
    est("absent") should be >= 0L
    // w=512 over 3 distinct tokens: collisions need a 3-row agreement —
    // with these fixed md5 hashes there are none, so estimates are exact
    est("alpha") shouldBe 7L
    est("beta") shouldBe 3L
    est("gamma") shouldBe 1L
    est("absent") shouldBe 0L
  }

  test("sketch is mergeable: grid(A union B) = cellwise sum of grid(A) + grid(B)") {
    val a = tokFrame(Seq("x", "x", "y", "z"))
    val b = tokFrame(Seq("y", "z", "z", "w"))
    val merged = CmsSketch.sketch(tokFrame(Seq("x", "x", "y", "z", "y", "z", "z", "w")), "tok")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = (CmsSketch.sketch(a, "tok").collect() ++ CmsSketch.sketch(b, "tok").collect())
      .groupBy(r => (r.getInt(0), r.getLong(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    merged shouldBe summed
  }

  test("join-size estimate: admissible, and exact absent collisions") {
    val a = tokFrame(Seq("x", "x", "y"))
    val b = tokFrame(Seq("x", "y", "y", "z"))
    // true |A join B| = 2*1 + 1*2 = 4
    val est = CmsSketch.joinSizeEstimate(
      CmsSketch.sketch(a, "tok"), CmsSketch.sketch(b, "tok"))
      .collect()(0).getLong(0)
    est should be >= 4L
    est shouldBe 4L // 4 distinct keys in 512 buckets: no collisions here
  }

  test("join-size estimate: disjoint grids give a provable 0, never NULL (r9 ADVICE)") {
    // one hash row with zero overlapping buckets must contribute 0 to the
    // min (not vanish from it), and fully disjoint grids must estimate 0
    val a = tokFrame(Seq("only-in-a", "aa"))
    val b = tokFrame(Seq("only-in-b", "bb"))
    val row = CmsSketch.joinSizeEstimate(
      CmsSketch.sketch(a, "tok"), CmsSketch.sketch(b, "tok")).collect()(0)
    row.isNullAt(0) shouldBe false
    row.getLong(0) shouldBe 0L
  }

  test("join-size estimate derives d from the grids — no phantom-row underestimate (r11 ADVICE)") {
    // pre-r11 a caller-passed d LARGER than the build dimension injected
    // all-zero phantom rows whose ip=0 won the min → est 0, silently
    // breaking admissibility; d is now max(r)+1 from the grids themselves
    val a = tokFrame(Seq("x", "x", "y"))
    val b = tokFrame(Seq("x", "y", "y", "z"))
    val g2a = CmsSketch.sketch(a, "tok", d = 2)
    val g2b = CmsSketch.sketch(b, "tok", d = 2)
    // true join size 4; a d=2 build must still be admissible (pre-r11 the
    // default d=3 would have manufactured a zero row here → est 0 < 4)
    CmsSketch.joinSizeEstimate(g2a, g2b)
      .collect()(0).getLong(0) should be >= 4L
    // empty grids: derived d floors at 1, estimate is a provable 0
    val empty = CmsSketch.sketch(tokFrame(Seq.empty), "tok")
    val r1 = CmsSketch.joinSizeEstimate(empty, g2b).collect()(0)
    r1.isNullAt(0) shouldBe false
    r1.getLong(0) shouldBe 0L
    val r2 = CmsSketch.joinSizeEstimate(empty, empty).collect()(0)
    r2.isNullAt(0) shouldBe false
    r2.getLong(0) shouldBe 0L
  }

  test("w=1 degenerates to the total count for every probe — the epsilon*N bound's edge") {
    val s = spark
    import s.implicits._
    val toks = tokFrame(Seq("a", "b", "c", "c"))
    val grid = CmsSketch.sketch(toks, "tok", d = 2, w = 1)
    val est = CmsSketch.estimates(grid, Seq("a", "nope").toDF("t"), "t", d = 2, w = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est("a") shouldBe 4L
    est("nope") shouldBe 4L // everything collides into the one cell
  }
}
