package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.warehouse.Scd2

class Scd2Spec extends SparkSpec with Matchers {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("expire closes only open intervals of the given keys (M1, db/postgres.py:38-47)") {
    val s = spark
    import s.implicits._
    val current = Seq(
      ("c1", "u1", ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      ("c1", "u2", ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00"))),
      ("c2", "u3", ts("2024-01-01 00:00:00"), None: Option[Timestamp]))
      .toDF("community_id", "member_id", "valid_from", "valid_to")
    val keys = Seq("u1", "u2").toDF("member_id")
    val out = Scd2.expire(current, keys, "member_id", lit(ts("2024-03-01 00:00:00")))
      .orderBy("member_id").collect()
    out(0).getTimestamp(3) shouldBe ts("2024-03-01 00:00:00") // u1: open → closed now
    out(1).getTimestamp(3) shouldBe ts("2024-02-01 00:00:00") // u2: already closed, untouched
    out(2).getTimestamp(3) shouldBe null                      // u3: not in keys, stays open
  }

  test("scd2Merge: expire + append keeps history and one open row per key") {
    val s = spark
    import s.implicits._
    val current = Seq(
      ("c1", "u1", ts("2024-01-01 00:00:00"), None: Option[Timestamp]))
      .toDF("community_id", "member_id", "valid_from", "valid_to")
    val incoming = Seq(("c9", "u1")).toDF("community_id", "member_id")
    val out = Scd2.scd2Merge(current, incoming, "member_id", lit(ts("2024-03-01 00:00:00")))
    out.count() shouldBe 2
    val open = out.filter(col("valid_to").isNull).collect()
    open.length shouldBe 1
    open(0).getString(0) shouldBe "c9"
    // point-in-time views see the right community
    Scd2.asOf(out, lit(ts("2024-02-01 00:00:00"))).collect()(0).getString(0) shouldBe "c1"
    Scd2.asOf(out, lit(ts("2024-04-01 00:00:00"))).collect()(0).getString(0) shouldBe "c9"
  }

  test("insertIfAbsent is idempotent (M2, ON CONFLICT DO NOTHING)") {
    val s = spark
    import s.implicits._
    val existing = Seq(("louvain", 1)).toDF("name", "x")
    val incoming = Seq(("louvain", 99), ("leiden", 2), ("leiden", 3)).toDF("name", "x")
    val out = Scd2.insertIfAbsent(existing, incoming, Seq("name"))
    out.count() shouldBe 2
    out.filter(col("name") === "louvain").collect()(0).getInt(1) shouldBe 1
    // replay converges
    Scd2.insertIfAbsent(out, incoming, Seq("name")).count() shouldBe 2
  }
}
