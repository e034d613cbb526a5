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

  test("as-of carries the whole latest right row atomically when its payload holds NULLs") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", ts("2024-01-01 12:00:00")))
      .toDF("lid", "key", "lts")
    val right = Seq(
      ("k", ts("2024-01-01 10:00:00"), Some(100L), Some("old")),
      ("k", ts("2024-01-01 11:00:00"), None, Some("new"))) // latest row: a IS NULL
      .toDF("key", "rts", "a", "b")
    val out = AsOfJoin.asOf(left, right, "key", "lts", "rts", Seq("a", "b")).collect()(0)
    // row-atomic semantics: the latest right row wins wholesale — its NULL
    // `a` must NOT be backfilled from the older row
    Option(out.getAs[Any]("a")) shouldBe None
    out.getAs[String]("b") shouldBe "new"
  }

  test("AsOfJoinExec rejects int-backed timestamp columns instead of reading garbage") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1, 10)).toDF("lid", "key", "lts") // IntegerType ts
    val right = Seq((1, 5, 100L)).toDF("key", "rts", "payload")
    val ex = intercept[Exception] {
      AsOfJoin.asOfPlanned(left, right, "key", "lts", "rts", Seq("payload")).collect()
    }
    ex.getMessage should include("long-backed")
  }

  test("custom physical operator (AsOfJoinExec) matches the union+window formulation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val left = graft.schemas.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id", $"ts")
    val right = graft.schemas.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .filter($"o_custkey" <= 150)
      .select(($"o_custkey" - 1).as("user_id"), $"o_orderdate".as("ots"), $"o_orderkey")
      .groupBy($"user_id", $"ots").agg(max($"o_orderkey").as("asof_order"))
    val viaWindow = AsOfJoin.asOf(left, right, "user_id", "ts", "ots", Seq("asof_order"))
      .select($"event_id", $"asof_order").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("asof_order"))).toMap
    val planned = AsOfJoin.asOfPlanned(left, right, "user_id", "ts", "ots", Seq("asof_order"))
    planned.queryExecution.executedPlan.toString should include("AsOfJoin ")
    val viaExec = planned.select($"event_id", $"asof_order").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("asof_order"))).toMap
    viaExec.size shouldBe viaWindow.size
    viaExec shouldBe viaWindow
  }
}
