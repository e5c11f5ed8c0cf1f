package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K8 — PNG plot sink (`databias/visualization_generator.py:40-553`): the
  * reference renders matplotlib dashboards from pandas aggregates and
  * uploads the PNGs to GCS. Re-expressed Spark-first: the AGGREGATION is a
  * distributed query (the §2.5 oracle-checked aggregates); only the
  * vector-to-pixels step runs on the driver over the tiny collected result
  * — exactly where matplotlib ran. Rendering is JDK-only
  * (Graphics2D + ImageIO, no plotting library), and the write goes through
  * the Hadoop FS API so any warehouse URI (file:, gs:, s3a:) works — the
  * same K2 path as every other sink.
  *
  * Deterministic: fixed fonts/colors/layout, no clock — byte-stable PNGs
  * for a given aggregate (spec'd), so re-runs are idempotent in object
  * storage.
  */
object PlotSink {

  private val palette = Array(
    new java.awt.Color(0x4c72b0), new java.awt.Color(0xdd8452),
    new java.awt.Color(0x55a868), new java.awt.Color(0xc44e52),
    new java.awt.Color(0x8172b3), new java.awt.Color(0x937860))

  /** Horizontal bar chart with value labels — the
    * `plot_collection_overview` left panel (`visualization_generator
    * .py:69-80`): one bar per category, top-N by value, labels on the
    * axis, value text at the bar end.
    */
  def barChartPng(rows: Seq[(String, Double)], title: String,
                  width: Int = 800, height: Int = 0): Array[Byte] = {
    val n = rows.size
    val rowH = 28
    val h = if (height > 0) height else 60 + n * rowH + 20
    val img = new java.awt.image.BufferedImage(width, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_TEXT_ANTIALIASING,
        java.awt.RenderingHints.VALUE_TEXT_ANTIALIAS_OFF) // determinism
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, width, h)
      g.setColor(java.awt.Color.BLACK)
      g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.BOLD, 14))
      g.drawString(title, 16, 24)
      g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.PLAIN, 12))
      val labelW = 180
      val plotW = width - labelW - 90
      val maxV = math.max(rows.map(_._2).foldLeft(0.0)(math.max), 1e-12)
      rows.zipWithIndex.foreach { case ((label, v), i) =>
        val y = 50 + i * rowH
        g.setColor(java.awt.Color.BLACK)
        g.drawString(label.take(24), 16, y + 16)
        val barLen = math.max(1, (v / maxV * plotW).round.toInt)
        g.setColor(palette(i % palette.length))
        g.fillRect(labelW, y + 4, barLen, rowH - 10)
        g.setColor(java.awt.Color.DARK_GRAY)
        g.drawString(fmt(v), labelW + barLen + 6, y + 16)
      }
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Pie chart — the `plot_collection_overview` right panel
    * (`visualization_generator.py:83-87`): share per category with
    * percentage labels.
    */
  def pieChartPng(rows: Seq[(String, Double)], title: String,
                  size: Int = 480): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(size + 220, size + 60,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_TEXT_ANTIALIASING,
        java.awt.RenderingHints.VALUE_TEXT_ANTIALIAS_OFF)
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, img.getWidth, img.getHeight)
      g.setColor(java.awt.Color.BLACK)
      g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.BOLD, 14))
      g.drawString(title, 16, 24)
      g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.PLAIN, 12))
      val total = math.max(rows.map(_._2).sum, 1e-12)
      var startDeg = 90.0
      rows.zipWithIndex.foreach { case ((label, v), i) =>
        val sweep = -v / total * 360.0
        g.setColor(palette(i % palette.length))
        // integer degree arithmetic accumulates gap error; track doubles
        g.fillArc(16, 44, size, size,
          math.round(startDeg).toInt, math.round(sweep).toInt)
        val pct = v / total * 100.0
        g.fillRect(size + 32, 50 + i * 22, 12, 12)
        g.setColor(java.awt.Color.BLACK)
        g.drawString(f"${label.take(20)}%s ($pct%1.1f%%)", size + 50, 61 + i * 22)
        startDeg += sweep
      }
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def fmt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%1.2f"

  /** Top-N value_counts of `labelCol` weighted by `valueCol` → horizontal
    * bar PNG at `path` (any Hadoop FS URI). The aggregate is distributed;
    * only N (label, value) pairs reach the driver.
    */
  def writeBarChart(df: DataFrame, labelCol: String, valueCol: String,
                    path: String, title: String, topN: Int = 20): Unit = {
    val rows = df.select(col(labelCol).cast("string"), col(valueCol).cast("double"))
      .orderBy(col(valueCol).desc, col(labelCol))
      .limit(topN)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    writeBytes(df, barChartPng(rows, title), path)
  }

  /** Share-per-category pie PNG at `path`. */
  def writePieChart(df: DataFrame, labelCol: String, valueCol: String,
                    path: String, title: String, topN: Int = 10): Unit = {
    val rows = df.select(col(labelCol).cast("string"), col(valueCol).cast("double"))
      .orderBy(col(valueCol).desc, col(labelCol))
      .limit(topN)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    writeBytes(df, pieChartPng(rows, title), path)
  }

  /** Write pre-rendered PNG bytes to any Hadoop FS URI (file:, gs:, s3a:)
    * — for callers that rendered with [[barChartPng]]/[[pieChartPng]]
    * directly, e.g. the pipeline failure-report path that also inlines the
    * same bytes into the alert mail.
    */
  def writePng(spark: org.apache.spark.sql.SparkSession, bytes: Array[Byte],
               path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def writeBytes(df: DataFrame, bytes: Array[Byte], path: String): Unit =
    writePng(df.sparkSession, bytes, path)
}
