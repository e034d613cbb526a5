package graft

import org.scalatest.matchers.should.Matchers

import graft.report.ChartSink

/** S13 chart sink: the reference's per-metric bar chart
  * (visualization.py:7-47) as a deterministic SVG artifact. */
class ChartSinkSpec extends SparkSpec with Matchers {

  test("bar chart SVG: one bar per row, tallest bar spans the plot, file lands") {
    val s = spark
    import s.implicits._
    val df = Seq(("c0", 0.5), ("c1", 1.0), ("c2", 0.25))
      .toDF("community", "conductance")
    val path = java.nio.file.Files.createTempDirectory("chart")
      .resolve("conductance.svg").toString
    ChartSink.barChartSvg(df, "community", "conductance", "Conductance", path)

    val svg = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    svg should startWith("<?xml")
    svg should include("<svg")
    "<rect x=".r.findAllIn(svg).length shouldBe 3 // one bar per community
    svg should include("Conductance")
    // deterministic: identical bytes on re-render
    val again = ChartSink.render(
      Array(("c0", 0.5), ("c1", 1.0), ("c2", 0.25)), "Conductance", 800, 400)
    svg shouldBe again
  }

  test("report-size contract is enforced: oversize input fails fast, not OOM") {
    val s = spark
    import s.implicits._
    val big = spark.range(ChartSink.MaxRows + 1L)
      .selectExpr("cast(id as string) as label", "cast(id as double) as v")
    val path = java.nio.file.Files.createTempDirectory("chart_big")
      .resolve("big.svg").toString
    val e = intercept[IllegalArgumentException] {
      ChartSink.barChartSvg(big, "label", "v", "too big", path)
    }
    e.getMessage should include("chart input exceeds")
  }

  test("labels are XML-escaped and zero/negative values render as zero-height bars") {
    val rendered = ChartSink.render(
      Array(("a<b>&\"q\"", 0.0), ("neg", -3.0)), "t", 400, 200)
    rendered should include("a&lt;b&gt;&amp;&quot;q&quot;")
    rendered should include("""height="0.0"""")
    rendered should not include "height=\"-"
  }
}
