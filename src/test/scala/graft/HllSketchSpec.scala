package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.HllSketch

/** HyperLogLog (q88's operator): estimate accuracy vs the 1.04/√m bound,
  * mergeability (register-wise max — the property that makes it the
  * 100 TB cardinality summary), duplicate-insensitivity, and the
  * register invariants. */
class HllSketchSpec extends SparkSpec with Matchers {

  private def valFrame(vals: Seq[String]) = {
    val s = spark
    import s.implicits._
    vals.toDF("v")
  }

  private def estimate(vals: Seq[String]): Long =
    HllSketch.summary(HllSketch.registers(valFrame(vals), "v"))
      .collect()(0).getAs[Long]("est_hll")

  test("estimate within 3 standard errors (1.04/sqrt(512) ~ 4.6%) at n=20000") {
    val n = 20000
    val est = estimate((0 until n).map(i => s"val$i"))
    val tol = (3 * 1.04 / math.sqrt(512.0) * n).toLong // ~2760
    est should be >= (n - tol)
    est should be <= (n + tol)
  }

  test("duplicates do not move the registers: card({a}*1000) == card({a})") {
    val once = HllSketch.registers(valFrame(Seq("a", "b", "c")), "v")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dup = HllSketch.registers(
      valFrame(Seq.fill(1000)(Seq("a", "b", "c")).flatten), "v")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    dup shouldBe once
  }

  test("mergeable: registers(A union B) = bucketwise max of registers(A), registers(B)") {
    val a = (0 until 500).map(i => s"a$i")
    val b = (0 until 500).map(i => s"b$i") ++ a.take(100) // overlap too
    val merged = HllSketch.registers(valFrame(a ++ b), "v")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val maxed = (HllSketch.registers(valFrame(a), "v").collect() ++
      HllSketch.registers(valFrame(b), "v").collect())
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getInt(1)).max).toMap
    merged shouldBe maxed
  }

  test("register invariants: bucket in [0,512), rank in [1,52], s_harm bounded") {
    val regs = HllSketch.registers(valFrame((0 until 3000).map(i => s"x$i")), "v")
    val rows = regs.collect()
    all(rows.map(_.getLong(0))) should (be >= 0L and be < 512L)
    all(rows.map(_.getInt(1))) should (be >= 1 and be <= 52)
    val s = HllSketch.summary(regs).collect()(0)
    s.getAs[Long]("m") shouldBe 512L
    s.getAs[Long]("v_zero") shouldBe (512L - rows.length)
    // s_harm <= m * 2^52 (every register empty) and >= 1 per bucket
    s.getAs[Long]("s_harm") should be <= (512L << 52)
    s.getAs[Long]("s_harm") should be > 0L
  }
}
