package graft

import org.scalatest.matchers.should.Matchers

/** The SQL surface: custom expressions registered via GraftExtensions are
  * callable from spark.sql. (The spark.sql.extensions config path wires the
  * same builders at session construction; tests share one session, so the
  * live-session registration path is exercised here.) */
class ExtensionsSpec extends SparkSpec with Matchers {

  test("custom functions callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  size(embed_text('hello world', 16)) AS d,
        |  simhash64('a b c') AS sh,
        |  rolling_hash('abc') AS rh,
        |  hamming64(0L, 7L) AS hd,
        |  size(minhash_sig(array('x','y'), 8)) AS mh,
        |  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  vec_sqdist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS sd
        |""".stripMargin).collect()(0)
    r.getAs[Int]("d") shouldBe 16
    r.getAs[Int]("hd") shouldBe 3
    r.getAs[Int]("mh") shouldBe 8
    r.getAs[Double]("dp") shouldBe 11.0
    r.getAs[Double]("sd") shouldBe 25.0
  }

  test("kmv_distinct + its md5 tier callable from SQL; exact below k") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT kmv_distinct(v, 64) AS nat, kmv_distinct_md5(v, 64) AS md5
        |FROM (SELECT explode(sequence(1, 40)) AS v)""".stripMargin).collect()(0)
    r.getAs[Long]("nat") shouldBe 40L // below k → exact
    r.getAs[Long]("md5") shouldBe 40L
  }
}
