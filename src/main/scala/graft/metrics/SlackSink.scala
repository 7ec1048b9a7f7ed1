package graft.metrics

/** Slack Incoming-Webhook sink seam (SURVEY.md §2.1 S11; reference
  * `dags/lib/slack_utils.py`). The engine does no network IO, so the
  * HTTP POST is an injected transport; everything else — URL assembly,
  * payload shape, success/failure semantics, and both message formats
  * (run summary via [[Audit.formatSummary]], failure callback via
  * [[SlackSink.failureMessage]]) — is the real behavior, unit-tested
  * with a recording transport.
  */
trait SlackSink {
  /** Post one message; true on success (the reference's `slack_post`
    * contract, `slack_utils.py:35-48`). */
  def post(text: String): Boolean
}

object SlackSink {

  /** Webhook URL assembly from the connection triple — the reference
    * builds `schema://host/password` (`slack_utils.py:24-33`). */
  def webhookUrl(schema: String, host: String, token: String): String =
    s"$schema://$host/$token"

  /** The JSON payload `requests.post(json={"text": text})` sends. */
  def payload(text: String): String = {
    val esc = text.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"text": "$esc"}"""
  }

  /** `slack_post` semantics over an injectable transport: missing URL →
    * false (the reference logs and returns False, `slack_utils.py:39-42`);
    * transport exception → false; otherwise true. */
  def viaTransport(url: Option[String], send: (String, String) => Unit): SlackSink =
    new SlackSink {
      def post(text: String): Boolean = url match {
        case None => false
        case Some(u) =>
          try { send(u, payload(text)); true }
          catch { case _: Exception => false }
      }
    }

  /** The failure-callback message shape (`slack_utils.py:52-68`): DAG /
    * task / run line, error truncated to 300 chars, log link only when a
    * URL exists. */
  def failureMessage(dagId: String, taskId: String, runId: String,
                     error: String, logUrl: String = ""): String = {
    val err = error.take(300)
    s""":x: *Airflow task failed*
       |• DAG: `$dagId`  • Task: `$taskId`
       |• Run: `$runId`
       |• Error: `$err`
       |""".stripMargin + (if (logUrl.nonEmpty) s"• <$logUrl|Logs>" else "")
  }

  /** Post the end-of-run summary (the reference's final DAG step posts
    * [[Audit.formatSummary]]'s text). Returns the sink's success flag. */
  def postSummary(sink: SlackSink, tradingDate: java.sql.Date,
                  pre: Option[PreMergeMetrics],
                  post: Option[PostMergeMetrics]): Boolean =
    sink.post(Audit.formatSummary(tradingDate, pre, post))
}
