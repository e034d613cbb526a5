package graft

import java.sql.Timestamp

import org.scalatest.matchers.should.Matchers

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec with Matchers {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of: latest right row with rightTs ≤ leftTs, inclusive on ties, null before first") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "k", ts("2024-01-01 10:00:00")),
      (2L, "k", ts("2024-01-01 12:00:00")),
      (3L, "k", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "z", ts("2024-01-01 12:00:00"))) // key with no right rows
      .toDF("lid", "key", "lts")
    val right = Seq(
      ("k", ts("2024-01-01 10:00:00"), 100L), // tie with lid=1 → included (≤)
      ("k", ts("2024-01-01 11:00:00"), 200L))
      .toDF("key", "rts", "payload")
    val out = AsOfJoin.asOf(left, right, "key", "lts", "rts", Seq("payload"))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[Any]("payload")).map(_.asInstanceOf[Long])).toMap
    out(1L) shouldBe Some(100L) // equal timestamp counts
    out(2L) shouldBe Some(200L) // latest preceding
    out(3L) shouldBe None       // nothing precedes
    out(4L) shouldBe None       // key absent on right
  }
}
