package graft.report

import org.apache.spark.sql.DataFrame

/** S13 — chart/report sink (SURVEY.md §2.1; the reference renders one
  * matplotlib PNG bar chart per community metric,
  * project/metrics/visualization.py:7-47). Engine-side the contract is the
  * same: a (label, value) result rendered to one self-contained artifact
  * per metric — here a dependency-free SVG (the container ships no
  * raster/plot libs; SVG is lossless, diffable and testable).
  *
  * The input is REPORT-sized by contract (per-community metric rows — the
  * reference plots the same post-aggregation frame), so the collect here
  * is the chart's own cardinality, never raw data.
  */
object ChartSink {

  /** Hard cap on chart rows: the input is report-sized by contract, and
    * the guard makes a miswired caller (raw data instead of the
    * aggregated metric frame) fail fast instead of collecting it into
    * driver memory. */
  val MaxRows = 10000

  /** Render a vertical bar chart of (labelCol, valueCol) to SVG markup.
    * Deterministic output: bars in the DataFrame's row order, fixed
    * geometry, values formatted with 4 significant decimals. */
  def barChartSvgString(df: DataFrame, labelCol: String, valueCol: String,
      title: String, width: Int = 800, height: Int = 400): String = {
    val limited = df.select(labelCol, valueCol).limit(MaxRows + 1).collect()
    require(limited.length <= MaxRows,
      s"chart input exceeds $MaxRows rows — pass the aggregated metric " +
        "frame, not raw data (the collect here is chart-sized by contract)")
    val rows = limited.map { r =>
      val label = Option(r.get(0)).map(_.toString).getOrElse("null")
      val v = r.get(1) match {
        case null => 0.0
        case n: Number => n.doubleValue()
        case other => other.toString.toDouble
      }
      (label, v)
    }
    render(rows, title, width, height)
  }

  /** [[barChartSvgString]] written to `path` (any Hadoop-visible FS). */
  def barChartSvg(df: DataFrame, labelCol: String, valueCol: String,
      title: String, path: String, width: Int = 800, height: Int = 400): Unit = {
    val svg = barChartSvgString(df, labelCol, valueCol, title, width, height)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(svg.getBytes("UTF-8")) finally out.close()
  }

  private[graft] def render(rows: Array[(String, Double)], title: String,
      width: Int, height: Int): String = {
    val margin = 48
    val plotW = width - 2 * margin
    val plotH = height - 2 * margin
    val maxV = math.max(rows.map(r => math.max(r._2, 0.0)).foldLeft(0.0)(math.max), 1e-12)
    val n = math.max(rows.length, 1)
    val bw = plotW.toDouble / n
    val esc = (s: String) => s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val bars = rows.zipWithIndex.map { case ((label, v), i) =>
      val h = math.max(0.0, v / maxV) * plotH
      val x = margin + i * bw
      val y = margin + (plotH - h)
      f"""<rect x="${x + bw * 0.1}%.1f" y="$y%.1f" width="${bw * 0.8}%.1f" height="$h%.1f" fill="#4878a8"/>
         |<text x="${x + bw / 2}%.1f" y="${height - margin + 16}%.1f" font-size="11" text-anchor="middle">${esc(label)}</text>
         |<text x="${x + bw / 2}%.1f" y="${y - 4}%.1f" font-size="10" text-anchor="middle">${f"$v%.4g"}</text>""".stripMargin
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">
       |<rect width="$width" height="$height" fill="white"/>
       |<text x="${width / 2}" y="24" font-size="16" text-anchor="middle" font-weight="bold">${esc(title)}</text>
       |<line x1="$margin" y1="${height - margin}" x2="${width - margin}" y2="${height - margin}" stroke="#333"/>
       |<line x1="$margin" y1="$margin" x2="$margin" y2="${height - margin}" stroke="#333"/>
       |$bars
       |</svg>
       |""".stripMargin
  }
}
