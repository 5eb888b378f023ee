package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.EngineConfig

class EngineConfigSpec extends AnyFunSuite {

  test("layering: defaults < overrides < env (AUTOSINAPI_ prefix only)") {
    val cfg = EngineConfig.load(
      overrides = Map("HEADER_SEARCH_LIMIT" -> "5", "CUSTOM" -> "x"),
      env = Map("AUTOSINAPI_HEADER_SEARCH_LIMIT" -> "7", "UNRELATED" -> "z"))
    assert(cfg.int("HEADER_SEARCH_LIMIT") == 7)
    assert(cfg("CUSTOM") == "x")
    assert(cfg("DATE_FORMAT") == "MM/yyyy") // untouched default
    intercept[IllegalArgumentException](cfg("UNRELATED"))
  }

  test("list parsing and sub-maps") {
    val cfg = EngineConfig.load(env = Map.empty)
    assert(cfg.list("SHEET_PRIORITY") == Seq("ISD", "ICD", "ISE", "CSD", "CCD", "CSE"))
    val idMap = EngineConfig.subMap(cfg, "ID_COL_MAP")
    assert(idMap("CODIGO_DO_INSUMO") == "CODIGO")
    assert(!idMap.contains("SHEET_PRIORITY"))
  }

  test("missing constant raises with the key name") {
    val e = intercept[IllegalArgumentException](
      EngineConfig.load(env = Map.empty)("NOPE"))
    assert(e.getMessage.contains("NOPE"))
  }
}
