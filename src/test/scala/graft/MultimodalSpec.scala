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

  test("imageDHash: real decode path == arithmetic gradient model; clones collide") {
    // model: luma of synthetic pixel (sx, sy) of image `id`
    def lum(id: Long, sx: Int, sy: Int): Int = {
      val r = ((id + sx * 31 + sy * 17) % 256).toInt
      val g = (((id >> 3) + sx) % 256).toInt
      val b = ((id + sy) % 256).toInt
      299 * r + 587 * g + 114 * b
    }
    def model(id: Long): Long = {
      val w = (id % 16 + 1).toInt
      val h = (id % 7 + 1).toInt
      var hash = 0L; var bit = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        val sy = y * h / 8
        if (lum(id, (x + 1) * w / 9, sy) > lum(id, x * w / 9, sy))
          hash |= 1L << bit
        bit += 1
      }
      hash
    }
    val ids = Seq(0L, 3L, 10L, 17L, 112L, 255L)
    val got = Multimodal.imageDHash(
        Multimodal.syntheticImages(ids.toDF("doc_id"), "doc_id"))
      .collect().map(r => r.doc_id -> r).toMap
    ids.foreach { id =>
      assert(got(id).dhash == model(id), s"id $id")
      assert(got(id).width == (id % 16 + 1).toInt &&
        got(id).height == (id % 7 + 1).toInt)
    }
    // identical payload (same id encoded twice) -> identical hash
    val twice = Multimodal.imageDHash(
        Multimodal.syntheticImages(Seq(42L, 42L).toDF("doc_id"), "doc_id"))
      .collect().map(_.dhash).toSet
    assert(twice.size == 1, "clone images collide on dhash")
  }

  test("audioEnergyHash and audioQuality == arithmetic PCM model") {
    def amps(id: Long): Seq[Int] = (0 until (id % 50 + 10).toInt).map { i =>
      val u = ((id * 31 + i.toLong * 7) % 65536).toInt
      if (u < 32768) u else 65536 - u
    }
    val ids = Seq(0L, 7L, 13L, 49L, 58L)
    val media = Multimodal.syntheticAudio(ids.toDF("doc_id"), "doc_id")
    val gotH = Multimodal.audioEnergyHash(media)
      .collect().map(r => r.doc_id -> r).toMap
    val gotQ = Multimodal.audioQuality(media)
      .collect().map(r => r.doc_id -> r).toMap
    ids.foreach { id =>
      val a = amps(id)
      val nw = a.length / 8
      val e = (0 until nw).map(w => a.slice(w * 8, w * 8 + 8).map(_.toLong).sum)
      var h = 0L
      (0 until math.min(nw - 1, 64)).foreach(w =>
        if (e(w + 1) > e(w)) h |= 1L << w)
      assert(gotH(id) ==
        Multimodal.AudioHash(id, a.length.toLong, nw.toLong, h), s"hash id $id")
      assert(gotQ(id) == Multimodal.AudioQuality(id, a.length.toLong,
        a.max.toLong, a.map(_.toLong).sum / a.length,
        a.count(_ >= 32700).toLong, a.count(_ <= 100).toLong), s"qa id $id")
    }
  }

  test("imageQuality == arithmetic gradient model") {
    def lum(id: Long, sx: Int, sy: Int): Long =
      299 * ((id + sx * 31 + sy * 17) % 256) +
        587 * (((id >> 3) + sx) % 256) + 114 * ((id + sy) % 256)
    val ids = Seq(1L, 20L, 111L)
    val got = Multimodal.imageQuality(
        Multimodal.syntheticImages(ids.toDF("doc_id"), "doc_id"))
      .collect().map(r => r.doc_id -> r).toMap
    ids.foreach { id =>
      val w = (id % 16 + 1).toInt
      val h = (id % 7 + 1).toInt
      val ls = for (y <- 0 until h; x <- 0 until w) yield lum(id, x, y)
      assert(got(id) == Multimodal.ImageQuality(id, w, h,
        ls.sum / ls.size, ls.min, ls.max), s"id $id")
    }
  }

  test("audio ops reject degenerate parameters") {
    val media = Multimodal.syntheticAudio(Seq(1L).toDF("doc_id"), "doc_id")
    intercept[IllegalArgumentException](Multimodal.audioEnergyHash(media, 0))
    intercept[IllegalArgumentException](
      Multimodal.audioQuality(media, clipLevel = 50, silenceLevel = 100))
  }

  test("imageDHash: rejects grids that overflow the 64-bit hash") {
    val media = Multimodal.syntheticImages(Seq(1L).toDF("doc_id"), "doc_id")
    intercept[IllegalArgumentException] {
      Multimodal.imageDHash(media, tw = 10, th = 8)
    }
    // 9x8 and smaller grids are fine
    assert(Multimodal.imageDHash(media, tw = 5, th = 4).collect().length == 1)
  }
}
