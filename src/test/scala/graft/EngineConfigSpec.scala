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

  test("config-file layer: defaults < file < overrides < env; nested keys flatten") {
    import graft.config.ConfigurationException
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg")
    val f = dir.resolve("engine.json")
    java.nio.file.Files.write(f,
      """{"HEADER_SEARCH_LIMIT": 9, "DATE_FORMAT": "dd/MM/yyyy",
        | "FILE_ONLY": "from-file", "PLACEHOLDER_UNIT": "KG",
        | "SHEET_MAP": {"XTR": "precos:EXTRA"}}""".stripMargin.getBytes("UTF-8"))
    val cfg = EngineConfig.load(
      overrides = Map("PLACEHOLDER_UNIT" -> "M2"),
      env = Map("AUTOSINAPI_HEADER_SEARCH_LIMIT" -> "7"),
      configFile = Some(f))
    assert(cfg.int("HEADER_SEARCH_LIMIT") == 7)     // env wins over file
    assert(cfg("PLACEHOLDER_UNIT") == "M2")         // overrides win over file
    assert(cfg("DATE_FORMAT") == "dd/MM/yyyy")      // file wins over defaults
    assert(cfg("FILE_ONLY") == "from-file")         // file-only key lands
    assert(EngineConfig.subMap(cfg, "SHEET_MAP")("XTR") == "precos:EXTRA") // nested → dotted
    assert(cfg("SHEET_MAP.ISD") == "precos:NAO_DESONERADO") // defaults kept

    // missing file and malformed JSON raise like the reference's
    // ConfigurationError (etl_pipeline.py:139-158)
    intercept[ConfigurationException](
      EngineConfig.load(env = Map.empty, configFile = Some(dir.resolve("absent.json"))))
    val bad = dir.resolve("bad.json")
    java.nio.file.Files.write(bad, "{not json".getBytes("UTF-8"))
    intercept[ConfigurationException](
      EngineConfig.load(env = Map.empty, configFile = Some(bad)))
    val notObj = dir.resolve("arr.json")
    java.nio.file.Files.write(notObj, "[1,2]".getBytes("UTF-8"))
    intercept[ConfigurationException](
      EngineConfig.load(env = Map.empty, configFile = Some(notObj)))
  }

  test("missing constant raises with the key name") {
    val e = intercept[IllegalArgumentException](
      EngineConfig.load(env = Map.empty)("NOPE"))
    assert(e.getMessage.contains("NOPE"))
  }
}
