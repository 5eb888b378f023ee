package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.UnsupportedFormatException
import graft.ops.VideoContainers

/** The real container layer (X51 completion): RIFF/AVI and ISO-BMFF/MP4
  * encode→parse round-trips, frame demux fidelity, and the strict
  * bounds-checked failure surface (truncation must name the container,
  * never mis-slice). Pure byte-level — no Spark session needed. */
class VideoContainersSpec extends AnyFunSuite {

  private def hash(bytes: Array[Byte]): Long =
    bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)

  test("AVI encode→parseMeta round-trips dims, frames, duration") {
    val m = VideoContainers.parseMeta(11L, VideoContainers.encodeAvi(13, 7, 9, 21, 11L))
    assert(m == VideoContainers.VideoMeta(11L, "avi", 13, 7, 9L, 360L)) // 40ms x 9
  }

  test("MP4 encode→parseMeta round-trips dims, frames, duration") {
    val m = VideoContainers.parseMeta(12L, VideoContainers.encodeMp4(13, 7, 9, 21, 12L))
    assert(m == VideoContainers.VideoMeta(12L, "mp4", 13, 7, 9L, 360L))
  }

  test("zero-frame videos parse with n_frames=0 and demux nothing") {
    for (payload <- Seq(VideoContainers.encodeAvi(2, 2, 0, 5, 1L),
                        VideoContainers.encodeMp4(2, 2, 0, 5, 1L))) {
      assert(VideoContainers.parseMeta(1L, payload).n_frames == 0L)
      assert(VideoContainers.demuxFrames(payload).isEmpty)
    }
  }

  test("demuxFrames returns the exact frame bytes in stream order") {
    for (payload <- Seq(VideoContainers.encodeAvi(4, 3, 6, 17, 42L),
                        VideoContainers.encodeMp4(4, 3, 6, 17, 42L))) {
      val frames = VideoContainers.demuxFrames(payload).toSeq
      assert(frames.length == 6)
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.length == 17)
        f.zipWithIndex.foreach { case (b, j) =>
          assert((b & 0xff) == VideoContainers.frameByte(42L, i, j))
        }
      }
    }
  }

  test("odd frame lengths honor RIFF even padding without corrupting frames") {
    // frameLen 5 forces a pad byte after every 00dc chunk
    val frames = VideoContainers.demuxFrames(
      VideoContainers.encodeAvi(3, 3, 4, 5, 7L)).toSeq
    assert(frames.map(hash) ==
      (0 until 4).map(i => hash(Array.tabulate(5)(j =>
        VideoContainers.frameByte(7L, i, j).toByte))))
  }

  test("truncated payloads fail naming the container, both formats") {
    val avi = VideoContainers.encodeAvi(4, 3, 5, 8, 9L)
    val mp4 = VideoContainers.encodeMp4(4, 3, 5, 8, 9L)
    val eAvi = intercept[UnsupportedFormatException] {
      VideoContainers.parseMeta(1L, avi.take(40))
    }
    assert(eAvi.getMessage.contains("RIFF/AVI"))
    val eMp4 = intercept[UnsupportedFormatException] {
      VideoContainers.parseMeta(1L, mp4.take(mp4.length - 10))
    }
    assert(eMp4.getMessage.contains("ISO-BMFF/MP4"))
    // demux over a payload whose mdat cannot hold the declared samples
    val eSlice = intercept[UnsupportedFormatException] {
      // keep moov (tail) intact but cut mdat bytes: splice out 8 payload
      // bytes right after the 32-byte headers
      val cut = avi.take(40) // AVI: cut mid-structure
      VideoContainers.demuxFrames(cut).toArray
    }
    assert(eSlice.getMessage.contains("RIFF/AVI"))
  }

  test("non-video bytes fail fast at the dispatch layer") {
    val e = intercept[UnsupportedFormatException] {
      VideoContainers.parseMeta(1L, "not a movie".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("not a recognized video container"))
    intercept[UnsupportedFormatException] {
      VideoContainers.demuxFrames(Array[Byte](1, 2, 3))
    }
  }

  test("a RIFF/WAVE payload is not mistaken for AVI") {
    val wav = graft.ops.Multimodal.AudioCodec.encodeWav(16, 8000, 3L)
    intercept[UnsupportedFormatException] {
      VideoContainers.parseMeta(1L, wav)
    }
  }

  /** Index of the first occurrence of fourcc `id` in `b`. */
  private def fourccAt(b: Array[Byte], id: String): Int = {
    val pat = id.getBytes("US-ASCII")
    (0 to b.length - 4).find(i => pat.indices.forall(j => b(i + j) == pat(j)))
      .getOrElse(fail(s"fourcc $id not found"))
  }

  test("multi-chunk stco: metadata parses, frame demux refuses loudly") {
    // The contiguous-slice demux is only sound for single-chunk
    // layouts; flip stco's entry count to 2 and the demux must raise
    // instead of silently mis-slicing (metadata stays parseable —
    // it never touches sample bytes).
    val mp4 = VideoContainers.encodeMp4(4, 3, 6, 17, 42L)
    val stco = fourccAt(mp4, "stco")
    // stco body: [ver/flags(4)][entry_count(4)][offsets...]
    val patched = mp4.clone()
    patched(stco + 4 + 7) = 2.toByte // count be32 low byte: 1 -> 2
    assert(VideoContainers.parseMeta(9L, patched).n_frames == 6L)
    val e = intercept[UnsupportedFormatException] {
      VideoContainers.demuxFrames(patched).toArray
    }
    assert(e.getMessage.contains("2 chunks") &&
      e.getMessage.contains("single-chunk"))
    // single-chunk control stays demuxable
    assert(VideoContainers.demuxFrames(mp4).length == 6)
  }

  test("adversarial avih duration product raises instead of wrapping") {
    // usPerFrame and totalFrames near 2^32 overflow a signed long
    // product; the parser must raise, never report a garbage duration.
    val avi = VideoContainers.encodeAvi(4, 3, 6, 17, 42L)
    val avih = fourccAt(avi, "avih")
    val patched = avi.clone()
    // avih body: usPerFrame at +0, totalFrames at +16 (le32 each)
    for (off <- Seq(avih + 8, avih + 8 + 16); j <- 0 until 4)
      patched(off + j) = 0xff.toByte
    val e = intercept[UnsupportedFormatException] {
      VideoContainers.parseMeta(9L, patched)
    }
    assert(e.getMessage.contains("duration overflows"))
    // an in-bound product still parses (unpatched control)
    assert(VideoContainers.parseMeta(9L, avi).duration_ms == 240L)
  }
}
