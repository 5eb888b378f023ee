package graft.ingest

import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.Duration
import java.util.zip.ZipFile

/** Acquisition failure (the reference's `DownloadError`,
  * `/root/reference/autosinapi/exceptions.py`): the orchestrator's
  * per-sheet isolation maps it to a `FALHA` run status. */
final class DownloadException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Driver-side acquisition utilities (SURVEY §2.1 S1-S3) — the full
  * contract of the reference's Downloader
  * (`/root/reference/autosinapi/core/downloader.py:67-140`,
  * `etl_pipeline.py:212-241`): URL construction, zero-padding, the HTTP
  * GET itself (java.net.http, 30 s timeout `config.py:23`), local-file
  * mode with an extension whitelist, zip normalization/extraction.
  */
object Acquisition {

  val BaseUrl = "https://www.caixa.gov.br/Downloads/sinapi-a-partir-jul-2009-sp/"
  val ValidTypes: Set[String] = Set("REFERENCIA", "MANUTENCOES")
  val AllowedExtensions: Set[String] = Set(".xlsx", ".xls", ".zip", ".csv")
  /** Request timeout in seconds (`config.py:23` TIMEOUT). */
  val TimeoutSeconds: Int = 30

  /** S1: `SINAPI_{TYPE}_{MM}_{YYYY}.zip` with zero-padded month
    * (`downloader.py:123-140`, `config.py:21-26`). `baseUrl` is
    * injectable so tests can point at a local stub server. */
  def buildUrl(fileType: String, year: Int, month: Int,
               baseUrl: String = BaseUrl): String = {
    val t = fileType.toUpperCase(java.util.Locale.ROOT)
    require(ValidTypes.contains(t), s"invalid SINAPI file type: $fileType")
    f"${baseUrl}SINAPI_${t}_$month%02d_$year%04d.zip"
  }

  private lazy val httpClient: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(TimeoutSeconds))
    .build()

  /** S1: the GET (`downloader.py:100-121` `_download_file`): fetch the
    * whole payload into memory, optionally persist to `savePath`
    * (local-mode save, `downloader.py:113-115`). Network errors,
    * timeouts, and non-2xx statuses all surface as [[DownloadException]]
    * — the reference's `raise_for_status` + `RequestException` wrap.
    * Driver-side utility by design: one zip per month, not a
    * distributed read.
    */
  def fetchBytes(url: String, timeoutSeconds: Int = TimeoutSeconds,
                 savePath: Option[Path] = None): Array[Byte] = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .GET().build()
    val resp =
      try httpClient.send(req, HttpResponse.BodyHandlers.ofByteArray())
      catch {
        case e: java.io.IOException =>
          throw new DownloadException(s"Erro no download: ${e.getMessage}", e)
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new DownloadException(s"Erro no download: interrupted", e)
      }
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new DownloadException(
        s"Erro no download: HTTP ${resp.statusCode()} for $url")
    val body = resp.body()
    savePath.foreach { p =>
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, body)
    }
    body
  }

  /** Local-file mode (`downloader.py:82-98` `_read_local_file`):
    * existence + extension whitelist, bytes back. */
  def readLocalFile(path: Path): Array[Byte] = {
    if (!Files.exists(path))
      throw new DownloadException(s"Erro ao ler arquivo local: Arquivo não encontrado: $path")
    if (!validateExtension(path.toString))
      throw new DownloadException(
        s"Erro ao ler arquivo local: Formato inválido. Use arquivos dos tipos: ${AllowedExtensions.mkString(", ")}")
    // The whitelist (mirroring `config.py:24`) ACCEPTS `.xls`; the
    // engine parses BIFF8 via BiffToCsv. Probe the container here so a
    // corrupt or pre-BIFF8 workbook fails by NAME at acquisition time,
    // not as an opaque error deep inside sheet extraction.
    if (XlsxToCsv.isLegacyXls(path)) BiffToCsv.requireReadable(path)
    Files.readAllBytes(path)
  }

  /** The `get_sinapi_data` dispatch (`downloader.py:67-81`): a provided
    * local file short-circuits the download. */
  def getSinapiData(fileType: String, year: Int, month: Int,
                    localFile: Option[Path] = None,
                    savePath: Option[Path] = None,
                    baseUrl: String = BaseUrl,
                    timeoutSeconds: Int = TimeoutSeconds): Array[Byte] =
    localFile match {
      case Some(p) => readLocalFile(p)
      case None    => fetchBytes(buildUrl(fileType, year, month, baseUrl),
                                 timeoutSeconds, savePath)
    }

  /** S3: standard period zip name `SINAPI-{year}-{month}-formato-xlsx.zip`
    * (`config.py:34`). */
  def normalizedZipName(year: Int, month: Int): String =
    f"SINAPI-$year%04d-$month%02d-formato-xlsx.zip"

  /** S2: extension whitelist check (`downloader.py:82-98`). */
  def validateExtension(path: String): Boolean =
    AllowedExtensions.exists(e => path.toLowerCase(java.util.Locale.ROOT).endsWith(e))

  /** S3: find any `*.zip` in the period dir, rename to the standard name,
    * extract into a sibling dir; returns the extraction dir
    * (`etl_pipeline.py:212-241`). */
  def findNormalizeAndUnzip(periodDir: Path, year: Int, month: Int): Path = {
    val zips = Option(periodDir.toFile.listFiles())
      .getOrElse(Array.empty[File]).filter(_.getName.toLowerCase.endsWith(".zip"))
    require(zips.nonEmpty, s"no zip file found in $periodDir")
    val normalized = periodDir.resolve(normalizedZipName(year, month))
    if (zips.head.toPath != normalized)
      Files.move(zips.head.toPath, normalized, StandardCopyOption.REPLACE_EXISTING)
    val outDir = periodDir.resolve(normalizedZipName(year, month).stripSuffix(".zip"))
    Files.createDirectories(outDir)
    val zf = new ZipFile(normalized.toFile)
    try {
      val entries = zf.entries()
      while (entries.hasMoreElements) {
        val e = entries.nextElement()
        val target = outDir.resolve(e.getName).normalize()
        require(target.startsWith(outDir), s"zip entry escapes target dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          val in = zf.getInputStream(e)
          try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
    outDir
  }
}
