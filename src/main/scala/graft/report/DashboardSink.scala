package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Checkpointer.CheckpointSyntax

/** S14 — dashboard serving (SURVEY.md §2.1; the reference serves a
  * Streamlit app, project/ui/app.py:17-85: two live-count metric tiles,
  * a "Run analysis" action whose results render as per-community metric
  * charts, plus the latest-run metrics). An interactive web server is out
  * of engine scope by design (SURVEY §2.1 note) — what the ENGINE owes
  * the dashboard is the serving ARTIFACT: a self-contained static
  * snapshot any web server (or a browser, directly) can serve.
  *
  * [[writeDashboard]] writes two files to a Hadoop-visible directory:
  *  - `index.html` — stat tiles (app.py:31-32's `st.metric` twins), the
  *    per-community metrics table, and the chart SVGs inlined
  *    (app.py:73-85's image loop — inline SVG needs no side files);
  *  - `dashboard.json` — the machine-readable twin (stats + table rows),
  *    for programmatic consumers the reference never had.
  *
  * Inputs are REPORT-sized by contract (post-aggregation frames — same
  * contract and guard as [[ChartSink]]); the collect here is the
  * dashboard's own cardinality, never raw data. Output is deterministic
  * for fixed input (fixed ordering, fixed formatting) so snapshots diff
  * cleanly and the spec can golden-test them.
  */
object DashboardSink {

  /** Same report-size contract as [[ChartSink.MaxRows]]. */
  val MaxRows = 10000

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def cellText(v: Any): String = v match {
    case null => ""
    case d: Double => f"$d%.6g"
    case f: Float => f"${f.toDouble}%.6g"
    case other => other.toString
  }

  private def cellJson(v: Any): String = v match {
    case null => "null"
    case d: Double => if (d.isNaN || d.isInfinite) jsonStr(d.toString) else d.toString
    case f: Float => cellJson(f.toDouble)
    case n: Number => n.toString
    case b: Boolean => b.toString
    case other => jsonStr(other.toString)
  }

  private def writeFile(spark: SparkSession, path: String, body: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Write `dir/index.html` + `dir/dashboard.json`.
    *
    * @param stats  (label, value) metric tiles, rendered in order
    * @param metrics the per-community metrics frame (report-sized; rows
    *                rendered in frame order — sort upstream for
    *                deterministic snapshots)
    * @param charts (caption, svgMarkup) pairs, inlined in order
    */
  def writeDashboard(spark: SparkSession, stats: Seq[(String, Long)],
      metrics: DataFrame, charts: Seq[(String, String)], dir: String,
      title: String = "Echo Chamber Analysis"): Unit = {
    val cols = metrics.columns
    val rows = metrics.limit(MaxRows + 1).collect()
    require(rows.length <= MaxRows,
      s"dashboard metrics input exceeds $MaxRows rows — pass the " +
        "aggregated per-community frame, not raw data")

    val tiles = stats.map { case (label, v) =>
      s"""<div class="tile"><div class="tile-v">$v</div><div class="tile-l">${esc(label)}</div></div>"""
    }.mkString("\n")
    val thead = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val tbody = rows.map { r =>
      "<tr>" + cols.indices.map(i => s"<td>${esc(cellText(r.get(i)))}</td>").mkString + "</tr>"
    }.mkString("\n")
    val chartHtml = charts.map { case (caption, svg) =>
      s"""<figure>$svg<figcaption>${esc(caption)}</figcaption></figure>"""
    }.mkString("\n")
    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
         |<style>
         |body{font-family:sans-serif;margin:2em;background:#fafafa;color:#222}
         |.tiles{display:flex;gap:1em}
         |.tile{background:#fff;border:1px solid #ddd;border-radius:8px;padding:1em 2em;text-align:center}
         |.tile-v{font-size:2em;font-weight:bold}.tile-l{color:#666}
         |table{border-collapse:collapse;margin:1em 0;background:#fff}
         |th,td{border:1px solid #ddd;padding:4px 10px;text-align:right}
         |th{background:#f0f0f0}
         |figure{margin:1em 0}figcaption{color:#666;font-size:0.9em}
         |</style></head><body>
         |<h1>${esc(title)}</h1>
         |<div class="tiles">
         |$tiles
         |</div>
         |<h2>Results</h2>
         |<table><thead><tr>$thead</tr></thead><tbody>
         |$tbody
         |</tbody></table>
         |$chartHtml
         |</body></html>
         |""".stripMargin

    val statsJson = stats.map { case (l, v) => s"${jsonStr(l)}:$v" }.mkString("{", ",", "}")
    val rowsJson = rows.map { r =>
      cols.indices.map(i => s"${jsonStr(cols(i))}:${cellJson(r.get(i))}").mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val json =
      s"""{"title":${jsonStr(title)},"stats":$statsJson,"metrics":$rowsJson,""" +
        s""""charts":${charts.map(c => jsonStr(c._1)).mkString("[", ",", "]")}}"""

    val base = dir.stripSuffix("/")
    writeFile(spark, s"$base/index.html", html)
    writeFile(spark, s"$base/dashboard.json", json)
  }

  /** The app.py mirror end-to-end (EP2 wired to the snapshot): live
    * counts (A2 — distinct engaged users + document count, the User/Post
    * node counts of app.py:24-29), one analysis run (J1 projection → G6
    * Louvain → A7–A10 structure metrics), and the per-community charts
    * (conductance + density by community — visualization.py's
    * by-community bar charts). Everything upstream of the collect is the
    * distributed plan; the snapshot write is report-sized. */
  def communityDashboard(spark: SparkSession, dataDir: String,
      outDir: String): Unit = {
    val events = spark.read.parquet(s"$dataDir/events.parquet")
    val docs = spark.read.parquet(s"$dataDir/documents.parquet")
    val nUsers = events.select(col("user_id")).distinct().count()
    val nPosts = docs.count()
    val edges = graft.graph.Projection.supplierGraph(spark, dataDir)
    val communities = graft.graph.Louvain.run(edges, distRounds = 2)
    val metrics = graft.metrics.CommunityMetrics.structure(edges, communities)
      .orderBy(col("label"))
      .cp() // three consumers: table + two charts
    val charts = Seq(
      "Conductance by community" -> ChartSink.barChartSvgString(
        metrics, "label", "conductance", "Conductance by community"),
      "Internal density by community" -> ChartSink.barChartSvgString(
        metrics, "label", "density", "Internal density by community"))
    writeDashboard(spark,
      Seq("Number of users" -> nUsers, "Number of posts" -> nPosts),
      metrics, charts, outDir)
    graft.util.BlockRelease.release(metrics)
  }
}
