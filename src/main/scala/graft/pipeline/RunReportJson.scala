package graft.pipeline

/** One-line JSON rendering of the run report (O3 contract,
  * `etl_pipeline.py:506-511`): every string is escaped for the full
  * JSON control-character range — sheet_errors carries raw exception
  * messages, which in Spark routinely contain newlines/tabs, and an
  * unescaped one would break both JSON validity and the one-line
  * parseability the driver relies on.
  */
object RunReportJson {

  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(report: RunReport): String = {
    def q(s: String) = escape(s)
    val tables = report.recordsInserted.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errs = report.sheetErrors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val phases = report.phaseSeconds.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    s"""{"run_id":${q(report.runId)},"status":${q(report.status)},"message":${q(report.message)},"records_inserted":$tables,"sheet_errors":$errs,"phase_seconds":$phases}"""
  }
}
