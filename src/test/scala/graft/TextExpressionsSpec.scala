package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.TextExpressions._
import graft.functions.{VectorFunctions => V}

class TextExpressionsSpec extends SparkSpec with Matchers {

  test("embed_text: deterministic, unit-norm, fixed dim") {
    val s = spark
    import s.implicits._
    val d = Seq("the quick brown fox", "the quick brown fox", "entirely different words here")
      .toDF("text")
    val out = d.select(embed_text(col("text"), 32).as("v"))
      .select(col("v"), org.apache.spark.sql.functions.size(col("v")).as("n"),
        V.l2norm(col("v")).as("norm"))
      .collect()
    out.foreach { r => r.getInt(1) shouldBe 32 }
    out(0).getDouble(2) shouldBe 1.0 +- 1e-6
    out(0).getSeq[Float](0) shouldBe out(1).getSeq[Float](0) // deterministic
    out(0).getSeq[Float](0) should not be out(2).getSeq[Float](0)
  }

  test("simhash64: near-identical texts are close in Hamming space, unrelated far") {
    val s = spark
    import s.implicits._
    val d = Seq(
      ("a", "the cat sat on the mat and looked at the dog outside the window today"),
      ("b", "the cat sat on the mat and looked at the dog outside the door today"),
      ("c", "completely unrelated gibberish tokens quantum flux reactor panels seven")).toDF("id", "t")
    val fp = d.select(col("id"), simhash64(col("t")).as("h"))
    val m = fp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    java.lang.Long.bitCount(m("a") ^ m("b")) should be < 16
    java.lang.Long.bitCount(m("a") ^ m("c")) should be > 16
  }

  test("rolling_hash: deterministic, content-sensitive, in [0, 2^61)") {
    val s = spark
    import s.implicits._
    val d = Seq("abc", "abc", "abd").toDF("t")
    val hs = d.select(rolling_hash(col("t"))).collect().map(_.getLong(0))
    hs(0) shouldBe hs(1)
    hs(0) should not be hs(2)
    all(hs) should be >= 0L
    all(hs) should be < (1L << 61)
  }

  test("hamming64 exact") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, 7L)).toDF("a", "b")
    d.select(hamming64(col("a"), col("b"))).collect()(0).getInt(0) shouldBe 3
  }
}
