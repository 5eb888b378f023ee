package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Acquisition

class AcquisitionSpec extends AnyFunSuite {

  test("URL building zero-pads month and validates type") {
    assert(Acquisition.buildUrl("REFERENCIA", 2025, 7) ==
      "https://www.caixa.gov.br/Downloads/sinapi-a-partir-jul-2009-sp/SINAPI_REFERENCIA_07_2025.zip")
    assert(Acquisition.buildUrl("manutencoes", 2025, 12).endsWith("SINAPI_MANUTENCOES_12_2025.zip"))
    intercept[IllegalArgumentException](Acquisition.buildUrl("WRONG", 2025, 1))
  }

  test("normalized period zip name") {
    assert(Acquisition.normalizedZipName(2025, 3) == "SINAPI-2025-03-formato-xlsx.zip")
  }

  test("extension whitelist") {
    assert(Acquisition.validateExtension("a/b/planilha.XLSX"))
    assert(Acquisition.validateExtension("x.csv"))
    assert(!Acquisition.validateExtension("x.exe"))
  }

  test("find-normalize-unzip roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_acq")
    val zip = dir.resolve("SINAPI_qualquer_nome.zip")
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zip))
    zos.putNextEntry(new java.util.zip.ZipEntry("inner/sheet.csv"))
    zos.write("a;b\n1;2".getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val out = Acquisition.findNormalizeAndUnzip(dir, 2025, 1)
    assert(java.nio.file.Files.exists(out.resolve("inner/sheet.csv")))
    assert(java.nio.file.Files.exists(dir.resolve("SINAPI-2025-01-formato-xlsx.zip")))
  }
}
