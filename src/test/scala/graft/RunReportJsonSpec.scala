package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{RunReport, RunReportJson}

/** The one-line run-report contract (O3): output must stay single-line,
  * valid JSON even when sheet errors carry raw Spark exception text. */
class RunReportJsonSpec extends AnyFunSuite {

  test("control characters in error messages are escaped, output is one line") {
    val ctrl = 1.toChar // U+0001 — below-space char outside the named escapes
    val report = RunReport(
      runId = "abcd1234",
      status = "FALHA",
      message = "completed with 1 sheet error(s): ISD_202501.csv",
      tablesUpdated = Seq("insumos"),
      recordsInserted = Map("insumos" -> 42L),
      sheetErrors = Map("ISD_202501.csv" ->
        ("Job aborted.\n\tat org.apache.spark.SparkException: \"boom\"\r" + ctrl)),
      phaseSeconds = Map("load" -> 1.25))
    val json = RunReportJson.render(report)
    assert(!json.contains('\n') && !json.contains('\r'), "must be one line")
    assert(json.contains("\\n") && json.contains("\\t") && json.contains("\\\""))
    assert(json.contains("\\u0001"))
    // parseable by an actual JSON reader (Jackson ships with Spark)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    assert(node.get("run_id").asText() == "abcd1234")
    assert(node.get("records_inserted").get("insumos").asLong() == 42L)
    assert(node.get("sheet_errors").get("ISD_202501.csv").asText().contains("boom"))
    assert(node.get("phase_seconds").get("load").asDouble() == 1.25)
  }
}
