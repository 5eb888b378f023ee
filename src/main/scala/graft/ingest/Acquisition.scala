package graft.ingest

import java.io.File
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.ZipFile

/** Driver-side acquisition utilities (SURVEY §2.1 S1-S3) — the naming /
  * staging contract of the reference's Downloader
  * (`/root/reference/autosinapi/core/downloader.py:100-140`,
  * `etl_pipeline.py:212-241`). The HTTP fetch itself is environment
  * plumbing (plain java.net.http against the published URL template);
  * everything testable — URL construction, zero-padding, extension
  * whitelist, zip normalization/extraction — is pure and lives here.
  */
object Acquisition {

  val BaseUrl = "https://www.caixa.gov.br/Downloads/sinapi-a-partir-jul-2009-sp/"
  val ValidTypes: Set[String] = Set("REFERENCIA", "MANUTENCOES")
  val AllowedExtensions: Set[String] = Set(".xlsx", ".xls", ".zip", ".csv")

  /** S1: `SINAPI_{TYPE}_{MM}_{YYYY}.zip` with zero-padded month
    * (`downloader.py:123-140`, `config.py:21-26`). */
  def buildUrl(fileType: String, year: Int, month: Int): String = {
    val t = fileType.toUpperCase(java.util.Locale.ROOT)
    require(ValidTypes.contains(t), s"invalid SINAPI file type: $fileType")
    f"${BaseUrl}SINAPI_${t}_$month%02d_$year%04d.zip"
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
