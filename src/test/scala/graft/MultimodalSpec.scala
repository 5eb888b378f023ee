package graft

import graft.ingest.UnsupportedFormatException
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow

/** Container fail-fast behavior for the video plumbing (VERDICT r8
  * task 5): a real container magic must raise a domain error NAMING
  * the format, never garbage-decode as text frames. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def bytes(parts: Seq[Any]): Array[Byte] =
    parts.flatMap {
      case s: String => s.getBytes(java.nio.charset.StandardCharsets.US_ASCII).toSeq
      case i: Int => Seq(i.toByte)
    }.toArray

  /** RIFF<size>AVI ... — the canonical AVI layout. */
  private def avi: Array[Byte] =
    bytes(Seq("RIFF", 0, 0, 0, 0, "AVI ", "movi data"))

  /** <size>ftyp<brand>... — the canonical ISO-BMFF layout. */
  private def mp4: Array[Byte] =
    bytes(Seq(0, 0, 0, 24, "ftyp", "isom", "rest of moov"))

  test("sniffVideoContainer names RIFF/AVI and ISO-BMFF magics") {
    assert(Multimodal.sniffVideoContainer(avi).contains("AVI (RIFF)"))
    assert(Multimodal.sniffVideoContainer(mp4)
      .exists(s => s.contains("ISO-BMFF/MP4") && s.contains("isom")))
    assert(Multimodal.sniffVideoContainer(
      "plain text payload".getBytes("UTF-8")).isEmpty)
    // a RIFF that is NOT AVI (e.g. WAV) is not a video container
    assert(Multimodal.sniffVideoContainer(
      bytes(Seq("RIFF", 0, 0, 0, 0, "WAVE"))).isEmpty)
    assert(Multimodal.sniffVideoContainer(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("frameSample fails fast on a CORRUPT AVI payload, naming the container") {
    // carries the RIFF/'AVI ' magic but no hdrl/movi structure
    val rows = Seq(MediaRow(7L, avi, "video/avi", avi.length.toLong))
      .toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.frameSample(rows, everyK = 1).collect()
    }
    val root = Option(e.getCause).getOrElse(e)
    val msg = Option(root.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("RIFF/AVI") && msg.contains("doc 7"),
      s"expected a doc-scoped RIFF/AVI error, got $root")
  }

  test("frameSample fails fast on a CORRUPT MP4 payload, naming the container") {
    // ftyp magic followed by a box that overruns the payload
    val rows = Seq(MediaRow(9L, mp4, "video/mp4", mp4.length.toLong)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.frameSample(rows, everyK = 1).collect()
    }
    val root = Option(e.getCause).getOrElse(e)
    val msg = Option(root.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("ISO-BMFF/MP4") && msg.contains("doc 9"),
      s"expected a doc-scoped ISO-BMFF/MP4 error, got $root")
  }

  test("frameSample demuxes REAL container frames (AVI and MP4)") {
    import graft.ops.VideoContainers
    val rows = Seq(
      MediaRow(2L, VideoContainers.encodeMp4(4, 3, 5, 7, 2L), "video/mp4", 0L),
      MediaRow(3L, VideoContainers.encodeAvi(4, 3, 5, 7, 3L), "video/x-msvideo", 0L))
      .toDS()
    val got = Multimodal.frameSample(rows, everyK = 2).collect()
      .map(f => (f.doc_id, f.frame_idx, f.frame_hash)).toSet
    def hash(seed: Long, i: Int): Long =
      (0 until 7).foldLeft(0L)((a, j) =>
        (a * 31 + VideoContainers.frameByte(seed, i, j)) % 1000000007L)
    val want = (for (id <- Seq(2L, 3L); i <- Seq(0, 2, 4))
      yield (id, i.toLong, hash(id, i))).toSet
    assert(got == want)
  }
}
