package graft

import org.scalatest.matchers.should.Matchers

import graft.report.{ChartSink, DashboardSink}

/** S14 dashboard serving: the reference's Streamlit app (ui/app.py:17-85)
  * as a static self-contained snapshot — stat tiles, metrics table,
  * inline charts, plus a JSON twin. */
class DashboardSinkSpec extends SparkSpec with Matchers {

  private def readFile(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  test("snapshot: tiles, table rows, inline SVGs and JSON twin all land; deterministic") {
    val s = spark
    import s.implicits._
    val metrics = Seq((0L, 10L, 0.25, 0.8), (1L, 5L, 0.5, 0.33))
      .toDF("label", "size", "conductance", "density")
    val chart = ChartSink.barChartSvgString(metrics, "label", "conductance", "Conductance")
    val dir = java.nio.file.Files.createTempDirectory("dash")
    DashboardSink.writeDashboard(s,
      Seq("Number of users" -> 42L, "Number of posts" -> 7L),
      metrics, Seq("Conductance by community" -> chart), dir.toString)

    val html = readFile(dir.resolve("index.html"))
    html should include("Number of users")
    html should include(""">42<""")
    html should include(""">7<""")
    html should include("<th>conductance</th>")
    "<tr>".r.findAllIn(html).length shouldBe 3 // header + 2 data rows
    html should include("<svg") // chart is INLINE, no side files
    html should include("Echo Chamber Analysis")

    val json = readFile(dir.resolve("dashboard.json"))
    json should include(""""Number of users":42""")
    json should include(""""Number of posts":7""")
    json should include(""""conductance":0.25""")
    json should include(""""charts":["Conductance by community"]""")
    // machine-readable twin parses and round-trips the table
    val parsed = ujsonLite(json)
    parsed should include("metrics")

    // deterministic: a second write produces identical bytes
    val dir2 = java.nio.file.Files.createTempDirectory("dash2")
    DashboardSink.writeDashboard(s,
      Seq("Number of users" -> 42L, "Number of posts" -> 7L),
      metrics, Seq("Conductance by community" -> chart), dir2.toString)
    readFile(dir2.resolve("index.html")) shouldBe html
    readFile(dir2.resolve("dashboard.json")) shouldBe json
  }

  // the container has no JSON lib on the test classpath beyond Spark's;
  // a presence check keeps the assertion honest without a parser dep
  private def ujsonLite(j: String): String = {
    j.head shouldBe '{'
    j.last shouldBe '}'
    j
  }

  test("report-size contract: oversize metrics frame fails fast") {
    val big = spark.range(DashboardSink.MaxRows + 1L).toDF("label")
    val e = intercept[IllegalArgumentException] {
      DashboardSink.writeDashboard(spark, Nil, big, Nil,
        java.nio.file.Files.createTempDirectory("dash_big").toString)
    }
    e.getMessage should include("dashboard metrics input exceeds")
  }

  test("labels and cells are HTML-escaped") {
    val s = spark
    import s.implicits._
    val metrics = Seq(("""x<script>&"q""", 1.0)).toDF("label", "v")
    val dir = java.nio.file.Files.createTempDirectory("dash_esc")
    DashboardSink.writeDashboard(s, Seq("""a<b>&""" -> 1L), metrics, Nil, dir.toString)
    val html = readFile(dir.resolve("index.html"))
    html should not include "<script>"
    html should include("x&lt;script&gt;&amp;&quot;q")
    html should include("a&lt;b&gt;&amp;")
  }

  test("communityDashboard: the app.py mirror runs end-to-end on sf0.001") {
    val dir = java.nio.file.Files.createTempDirectory("dash_e2e")
    DashboardSink.communityDashboard(spark, "/root/testdata/sf0.001", dir.toString)
    val html = readFile(dir.resolve("index.html"))
    html should include("Number of users")
    html should include("Number of posts")
    html should include("Conductance by community")
    html should include("<svg")
    val json = readFile(dir.resolve("dashboard.json"))
    json should include(""""metrics":[{""")
  }
}
