package graft.sinks

import org.apache.spark.sql.Row

/** K9 — email alert sink (`schema_validator.py:435-565`): the reference
  * builds a multipart HTML mail from the anomaly dict (severity-colored
  * blocks, run metadata, an inline bias PNG via Content-ID) and sends it
  * over authenticated SMTP; when SMTP credentials are unconfigured it logs
  * and skips.
  *
  * Re-expressed with the engine's transport-injection pattern
  * (`HttpSource.HttpTransport`): the HTML rendering and MIME assembly are
  * PURE functions over the collected (tiny) anomaly rows, and the RFC 5321
  * dialogue (EHLO → AUTH LOGIN → MAIL FROM → RCPT TO → DATA → QUIT) runs
  * against a pluggable [[SmtpTransport]] — specs script a fake server and
  * assert the exact dialogue; production plugs a TLS socket. No mail
  * library needed or available in-container; the protocol is ~40 lines.
  */
object AlertSink {

  final case class SmtpConfig(
      host: String = sys.env.getOrElse("SMTP_HOST", "smtp.gmail.com"),
      port: Int = 465,
      user: Option[String] = sys.env.get("SMTP_USER"),
      password: Option[String] = sys.env.get("SMTP_PASSWORD"),
      to: Option[String] = sys.env.get("ALERT_EMAIL"))

  /** One SMTP exchange: send a command line (None = just read the
    * greeting), get the reply line(s). Implementations: TLS socket in
    * production, scripted fake in specs.
    */
  trait SmtpTransport {
    def connect(host: String, port: Int): Unit
    def exchange(command: Option[String]): String
    def close(): Unit
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def b64Wrapped(bytes: Array[Byte]): String =
    java.util.Base64.getMimeEncoder(76, "\r\n".getBytes).encodeToString(bytes)

  /** The reference's severity-colored anomaly blocks + run metadata, as one
    * HTML document (`schema_validator.py:474-535`, structure preserved,
    * emoji/branding dropped). Pure — byte-stable for given inputs.
    */
  def renderAnomalyHtml(anomalies: Seq[Row], severity: String, runTs: String,
                        totalRows: Long, qualityScore: Double,
                        inlineImageCid: Option[String] = None): String = {
    val blocks = anomalies.map { r =>
      val sev = r.getAs[String]("severity")
      val bg = if (sev == "critical") "#ffebee" else "#fff3e0"
      val edge = if (sev == "critical") "#f44336" else "#ff9800"
      s"""<div style="margin:10px 0;padding:10px;background-color:$bg;border-left:4px solid $edge">
         |<h4>${r.getAs[String]("anomaly_type")} - ${r.getAs[String]("column_name")}</h4>
         |<p><b>${r.getAs[String]("description")}</b></p>
         |</div>""".stripMargin
    }.mkString("\n")
    val viz = inlineImageCid.map(cid =>
      s"""<hr/><h3>Current Bias Metrics Visualization</h3>
         |<img src="cid:$cid" style="max-width:100%"/>""".stripMargin)
      .getOrElse("")
    s"""<html><body style="font-family:Arial,sans-serif;max-width:900px">
       |<h2>Data Quality Anomaly Detected</h2>
       |<div style="background-color:#f5f5f5;padding:15px">
       |<p><b>Severity:</b> ${severity.toUpperCase}</p>
       |<p><b>Timestamp:</b> $runTs</p>
       |<p><b>Total Rows:</b> $totalRows</p>
       |<p><b>Quality Score:</b> $qualityScore%</p>
       |</div>
       |<h3>Detected Anomalies (${anomalies.size}):</h3>
       |$blocks
       |$viz
       |</body></html>""".stripMargin
  }

  /** multipart/related(multipart/alternative(text/html), image/png) — the
    * reference's MIMEMultipart('related') + inline MIMEImage shape. Fixed
    * boundaries keep the bytes deterministic for the spec.
    */
  def buildMimeMessage(subject: String, from: String, to: String,
                       html: String, inlinePng: Option[(String, Array[Byte])])
      : String = {
    val outer = "=_graft_related"
    val alt = "=_graft_alternative"
    val htmlPart =
      s"""--$alt\r
         |Content-Type: text/html; charset="utf-8"\r
         |Content-Transfer-Encoding: base64\r
         |\r
         |${b64Wrapped(html.getBytes("UTF-8"))}\r
         |--$alt--\r""".stripMargin
    val imagePart = inlinePng.map { case (cid, bytes) =>
      s"""\r
         |--$outer\r
         |Content-Type: image/png\r
         |Content-Transfer-Encoding: base64\r
         |Content-ID: <$cid>\r
         |Content-Disposition: inline; filename="$cid.png"\r
         |\r
         |${b64Wrapped(bytes)}\r""".stripMargin
    }.getOrElse("")
    s"""Subject: $subject\r
       |From: $from\r
       |To: $to\r
       |MIME-Version: 1.0\r
       |Content-Type: multipart/related; boundary="$outer"\r
       |\r
       |--$outer\r
       |Content-Type: multipart/alternative; boundary="$alt"\r
       |\r
       |$htmlPart$imagePart\r
       |--$outer--\r""".stripMargin
  }

  /** RFC 5321 client dialogue. Returns the server replies (for logging /
    * assertion); throws on a non-2xx/3xx reply. Skips silently (None) when
    * credentials are unconfigured — the reference's behavior.
    */
  def sendAlert(cfg: SmtpConfig, message: String,
                transport: SmtpTransport): Option[Seq[String]] = {
    (cfg.user, cfg.password) match {
      case (Some(user), Some(password)) =>
        val to = cfg.to.getOrElse(user)
        transport.connect(cfg.host, cfg.port)
        try {
          val replies = scala.collection.mutable.ArrayBuffer.empty[String]
          def cmd(c: Option[String], expect: Char): Unit = {
            val r = transport.exchange(c)
            replies += r
            if (r.isEmpty || (r.head != expect))
              throw new java.io.IOException(
                s"SMTP: '${c.getOrElse("<greeting>")}' -> '$r'")
          }
          cmd(None, '2')                                  // 220 greeting
          cmd(Some("EHLO graft"), '2')                    // 250
          cmd(Some("AUTH LOGIN"), '3')                    // 334 Username:
          cmd(Some(b64(user)), '3')                       // 334 Password:
          cmd(Some(b64(password)), '2')                   // 235 accepted
          cmd(Some(s"MAIL FROM:<$user>"), '2')            // 250
          cmd(Some(s"RCPT TO:<$to>"), '2')                // 250
          cmd(Some("DATA"), '3')                          // 354
          // dot-stuffing per RFC 5321 §4.5.2, then the terminating dot
          val stuffed = message.linesWithSeparators
            .map(l => if (l.startsWith(".")) "." + l else l).mkString
          cmd(Some(stuffed + "\r\n."), '2')               // 250 queued
          cmd(Some("QUIT"), '2')                          // 221
          Some(replies.toSeq)
        } finally transport.close()
      case _ => None // unconfigured -> log-and-skip, never a hard failure
    }
  }

  /** TLS-socket transport for production use (SMTPS, port 465 — the
    * reference's `smtplib.SMTP_SSL`). Single-threaded, driver-side: alert
    * mails are one per run, not per record.
    */
  final class SslSocketTransport extends SmtpTransport {
    private var socket: java.net.Socket = _
    private var in: java.io.BufferedReader = _
    private var out: java.io.PrintWriter = _

    def connect(host: String, port: Int): Unit = {
      socket = javax.net.ssl.SSLSocketFactory.getDefault
        .createSocket(host, port)
      in = new java.io.BufferedReader(
        new java.io.InputStreamReader(socket.getInputStream, "UTF-8"))
      out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(socket.getOutputStream, "UTF-8"))
    }

    def exchange(command: Option[String]): String = {
      command.foreach { c => out.print(c + "\r\n"); out.flush() }
      // multiline replies: "250-..." continues, "250 ..." ends
      var line = in.readLine()
      val first = line
      while (line != null && line.length >= 4 && line.charAt(3) == '-')
        line = in.readLine()
      if (first == null) "" else first
    }

    def close(): Unit = if (socket != null) socket.close()
  }
}
