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

  // S1 HTTP fetch against a local stub server — the Scala counterpart of
  // the reference's mocked-session tests (tests/core/test_downloader.py:87-135).
  test("HTTP fetch: success, save-path, non-200, timeout, local-file dispatch") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import graft.ingest.DownloadException
    val payload = "test content".getBytes("UTF-8")
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handle(path: String)(f: HttpExchange => Unit): Unit =
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = { f(ex); ex.close() }
      })
    handle("/ok/") { ex =>
      ex.sendResponseHeaders(200, payload.length.toLong)
      ex.getResponseBody.write(payload)
    }
    handle("/missing/") { ex => ex.sendResponseHeaders(404, -1) }
    handle("/slow/") { ex =>
      Thread.sleep(3000)
      ex.sendResponseHeaders(200, -1)
    }
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"

      // success: bytes come back whole (test_successful_download)
      val got = Acquisition.getSinapiData("REFERENCIA", 2023, 1, baseUrl = s"$base/ok/")
      assert(java.util.Arrays.equals(got, payload))

      // local-mode save (test_local_mode_save)
      val dir = java.nio.file.Files.createTempDirectory("graft_dl")
      val saved = dir.resolve("nested/SINAPI.zip")
      Acquisition.getSinapiData("REFERENCIA", 2023, 1,
        savePath = Some(saved), baseUrl = s"$base/ok/")
      assert(java.util.Arrays.equals(java.nio.file.Files.readAllBytes(saved), payload))

      // non-200 surfaces as DownloadException with the status
      val e404 = intercept[DownloadException] {
        Acquisition.getSinapiData("REFERENCIA", 2023, 1, baseUrl = s"$base/missing/")
      }
      assert(e404.getMessage.contains("HTTP 404"))

      // timeout (config.py:23 TIMEOUT, shrunk for the test)
      intercept[DownloadException] {
        Acquisition.getSinapiData("REFERENCIA", 2023, 1,
          baseUrl = s"$base/slow/", timeoutSeconds = 1)
      }

      // network error: nothing listens on the closed port
      intercept[DownloadException] {
        Acquisition.fetchBytes("http://127.0.0.1:1/never.zip", timeoutSeconds = 1)
      }

      // local-file mode short-circuits the server entirely
      val local = dir.resolve("local.xlsx")
      java.nio.file.Files.write(local, payload)
      val viaFile = Acquisition.getSinapiData("REFERENCIA", 2023, 1,
        localFile = Some(local), baseUrl = s"$base/missing/")
      assert(java.util.Arrays.equals(viaFile, payload))
      intercept[DownloadException](Acquisition.readLocalFile(dir.resolve("absent.xlsx")))
      val bad = dir.resolve("payload.exe")
      java.nio.file.Files.write(bad, payload)
      intercept[DownloadException](Acquisition.readLocalFile(bad))
    } finally server.stop(0)
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
