package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ingest.UnsupportedFormatException

/** Real video-container metadata + frame demux (SURVEY §7.6, the X51
  * completion): dependency-free byte-level parsers for the two
  * containers the sniffer names — RIFF/AVI (`avih` main header, `movi`
  * frame chunks) and ISO-BMFF/MP4 (`mvhd`/`tkhd`/`stsz`/`stco` sample
  * tables) — the same arc as the CFB+BIFF8 `.xls` reader
  * (`ingest/BiffToCsv.scala`): no media library exists in this
  * environment, so the CONTAINER layer (what a keyframe pipeline needs
  * before any codec work: dimensions, frame count, duration, per-frame
  * byte extents) is parsed for real from the published file formats
  * (AVI per the RIFF/`AVIMAINHEADER` layout, MP4 per ISO/IEC 14496-12
  * box structure); frame PAYLOADS stay opaque bytes, hashed not
  * pixel-decoded (codec decode is the one genuinely-external step).
  *
  * Parsers are strict: every length is bounds-checked against the
  * remaining payload and any truncation/overrun raises
  * [[graft.ingest.UnsupportedFormatException]] NAMING the container —
  * never a garbage row (mirrors reference `pre_processor.py`'s loud
  * unsupported-format policy; cf. `/root/reference` docs/Architecture).
  *
  * At 100 TB: everything here is a per-row stage inside mapPartitions —
  * zero shuffle; metadata (`videoMeta`) prunes a corpus before anyone
  * touches frame bytes, and the demux emits only sampled frames so the
  * downstream shuffle carries |kept frames|, not |payload|.
  */
object VideoContainers {

  /** Container-level metadata: the prune-first columns of a video
    * corpus. `duration_ms` derives from the container's own clock
    * (AVI: µs-per-frame × frames; MP4: mvhd duration/timescale). */
  final case class VideoMeta(doc_id: Long, container: String, width: Int,
                             height: Int, n_frames: Long, duration_ms: Long)

  /** Deterministic frame-payload byte (seed-derived, oracle-
    * recomputable): byte j of frame i. */
  def frameByte(seed: Long, i: Int, j: Int): Int =
    (((seed * 31 + i.toLong * 7 + j.toLong * 13) % 256) + 256).toInt % 256

  // ---- little/big-endian writers -----------------------------------

  private final class W {
    val out = new ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    def ascii(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le32(v: Long): Unit = { out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt) }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def be32(v: Long): Unit = { out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def zeros(n: Int): Unit = { var i = 0; while (i < n) { out.write(0); i += 1 } }
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
  }

  private def frame(seed: Long, i: Int, frameLen: Int): Array[Byte] = {
    val b = new Array[Byte](frameLen)
    var j = 0
    while (j < frameLen) { b(j) = frameByte(seed, i, j).toByte; j += 1 }
    b
  }

  // ---- RIFF/AVI encoder --------------------------------------------

  /** Minimal-but-real AVI: RIFF('AVI ') → LIST(hdrl){avih,
    * LIST(strl){strh('vids'), strf(BITMAPINFOHEADER)}} → LIST(movi)
    * with one '00dc' chunk per frame (RIFF even-byte padding honored).
    * 25 fps (40000 µs/frame), so duration_ms = 40·nFrames. */
  def encodeAvi(width: Int, height: Int, nFrames: Int, frameLen: Int,
                seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 0 && frameLen > 0,
      "AVI encode needs positive dims and frame length")
    def chunk(id: String)(body: W => Unit): Array[Byte] = {
      val w = new W; body(w)
      val b = w.bytes
      val hdr = new W
      hdr.ascii(id); hdr.le32(b.length.toLong); hdr.raw(b)
      if (b.length % 2 == 1) hdr.out.write(0) // RIFF pads chunks to even
      hdr.bytes
    }
    def list(kind: String)(parts: Array[Byte]*): Array[Byte] =
      chunk("LIST") { w => w.ascii(kind); parts.foreach(w.raw) }

    val avih = chunk("avih") { w =>
      w.le32(40000L)            // dwMicroSecPerFrame (25 fps)
      w.le32(0L); w.le32(0L); w.le32(0L)
      w.le32(nFrames.toLong)    // dwTotalFrames
      w.le32(0L)
      w.le32(1L)                // dwStreams
      w.le32(0L)
      w.le32(width.toLong); w.le32(height.toLong)
      w.zeros(16)               // dwReserved[4]
    }
    val strh = chunk("strh") { w =>
      w.ascii("vids"); w.ascii("GRFT")
      w.le32(0L); w.le16(0); w.le16(0); w.le32(0L)
      w.le32(1L)                // dwScale
      w.le32(25L)               // dwRate → 25 fps
      w.le32(0L)
      w.le32(nFrames.toLong)    // dwLength
      w.le32(0L); w.le32(0L); w.le32(0L)
      w.le16(0); w.le16(0); w.le16(width); w.le16(height) // rcFrame
    }
    val strf = chunk("strf") { w =>
      w.le32(40L); w.le32(width.toLong); w.le32(height.toLong)
      w.le16(1); w.le16(24); w.le32(0L)
      w.le32(width.toLong * height * 3)
      w.zeros(16)
    }
    val movi = list("movi")(
      (0 until nFrames).map(i => chunk("00dc")(_.raw(frame(seed, i, frameLen)))): _*)
    val body = new W
    body.ascii("AVI ")
    body.raw(list("hdrl")(avih, list("strl")(strh, strf)))
    body.raw(movi)
    val all = new W
    all.ascii("RIFF"); all.le32(body.bytes.length.toLong); all.raw(body.bytes)
    all.bytes
  }

  // ---- ISO-BMFF/MP4 encoder ----------------------------------------

  /** Minimal-but-real ISO-BMFF: ftyp('isom') → mdat (frames back to
    * back) → moov{mvhd(timescale 1000, duration 40·n), trak{tkhd(16.16
    * w/h), mdia{mdhd(timescale 25, duration n), hdlr('vide'),
    * minf{stbl{stsd, stts, stsz(per-sample table), stco}}}}}. mdat
    * precedes moov so stco's chunk offset is the fixed 32. */
  def encodeMp4(width: Int, height: Int, nFrames: Int, frameLen: Int,
                seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 0 && frameLen > 0,
      "MP4 encode needs positive dims and frame length")
    def box(kind: String)(body: W => Unit): Array[Byte] = {
      val w = new W; body(w)
      val b = w.bytes
      val hdr = new W
      hdr.be32(8L + b.length); hdr.ascii(kind); hdr.raw(b)
      hdr.bytes
    }
    val ftyp = box("ftyp") { w =>
      w.ascii("isom"); w.be32(0x200L); w.ascii("isom"); w.ascii("mp41")
    }
    val mdat = box("mdat") { w =>
      (0 until nFrames).foreach(i => w.raw(frame(seed, i, frameLen)))
    }
    val mdatDataOff = ftyp.length + 8 // frames start right after mdat header
    val mvhd = box("mvhd") { w =>
      w.be32(0L)                       // version/flags
      w.be32(0L); w.be32(0L)           // ctime/mtime
      w.be32(1000L)                    // timescale
      w.be32(nFrames.toLong * 40)      // duration → duration_ms = 40·n
      w.be32(0x00010000L); w.be16(0x0100); w.zeros(10)
      // identity matrix
      w.be32(0x00010000L); w.be32(0L); w.be32(0L)
      w.be32(0L); w.be32(0x00010000L); w.be32(0L)
      w.be32(0L); w.be32(0L); w.be32(0x40000000L)
      w.zeros(24)                      // pre_defined
      w.be32(2L)                       // next_track_ID
    }
    val tkhd = box("tkhd") { w =>
      w.be32(7L)                       // version 0, flags enabled|in-movie|in-preview
      w.be32(0L); w.be32(0L)
      w.be32(1L)                       // track_ID
      w.be32(0L)
      w.be32(nFrames.toLong * 40)
      w.zeros(8); w.be16(0); w.be16(0); w.be16(0); w.be16(0)
      w.be32(0x00010000L); w.be32(0L); w.be32(0L)
      w.be32(0L); w.be32(0x00010000L); w.be32(0L)
      w.be32(0L); w.be32(0L); w.be32(0x40000000L)
      w.be32(width.toLong << 16)       // 16.16 fixed
      w.be32(height.toLong << 16)
    }
    val mdhd = box("mdhd") { w =>
      w.be32(0L); w.be32(0L); w.be32(0L)
      w.be32(25L)                      // media timescale (fps)
      w.be32(nFrames.toLong)           // duration in samples
      w.be16(0x55c4); w.be16(0)        // language 'und'
    }
    val hdlr = box("hdlr") { w =>
      w.be32(0L); w.be32(0L); w.ascii("vide"); w.zeros(12); w.out.write(0)
    }
    val stsd = box("stsd") { w => w.be32(0L); w.be32(0L) }
    val stts = box("stts") { w =>
      w.be32(0L); w.be32(1L); w.be32(nFrames.toLong); w.be32(1L)
    }
    val stsz = box("stsz") { w =>
      w.be32(0L); w.be32(0L)           // sample_size 0 → per-sample table
      w.be32(nFrames.toLong)
      (0 until nFrames).foreach(_ => w.be32(frameLen.toLong))
    }
    val stco = box("stco") { w =>
      w.be32(0L); w.be32(1L); w.be32(mdatDataOff.toLong)
    }
    val stbl = box("stbl")(w => Seq(stsd, stts, stsz, stco).foreach(w.raw))
    val minf = box("minf")(_.raw(stbl))
    val mdia = box("mdia")(w => Seq(mdhd, hdlr, minf).foreach(w.raw))
    val trak = box("trak")(w => Seq(tkhd, mdia).foreach(w.raw))
    val moov = box("moov")(w => Seq(mvhd, trak).foreach(w.raw))
    val all = new W
    all.raw(ftyp); all.raw(mdat); all.raw(moov)
    all.bytes
  }

  // ---- strict byte readers -----------------------------------------

  private def fail(container: String, what: String): Nothing =
    throw new UnsupportedFormatException(s"$container: $what")

  private final class R(val b: Array[Byte], container: String) {
    def len: Int = b.length
    def need(off: Long, n: Long): Unit =
      if (off < 0 || n < 0 || off + n > b.length)
        fail(container, s"truncated payload: need $n bytes at offset $off of ${b.length}")
    def ascii(off: Int, n: Int): String = { need(off.toLong, n.toLong)
      new String(b, off, n, java.nio.charset.StandardCharsets.US_ASCII) }
    def le32(off: Int): Long = { need(off.toLong, 4L)
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24) }
    def be32(off: Int): Long = { need(off.toLong, 4L)
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL) }
    def be64(off: Int): Long = { need(off.toLong, 8L)
      (be32(off) << 32) | be32(off + 4) }
    def slice(off: Int, n: Int): Array[Byte] = { need(off.toLong, n.toLong)
      java.util.Arrays.copyOfRange(b, off, off + n) }
  }

  // ---- RIFF/AVI parser ---------------------------------------------

  private val Avi = "RIFF/AVI"

  /** Walk RIFF chunks in [off, end) calling f(id, bodyOff, bodySize);
    * recursion into LISTs is the caller's choice via the returned
    * (kind, off, size). */
  private def riffChunks(r: R, off0: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = off0
    while (off < end) {
      if (off + 8 > end) fail(Avi, s"truncated chunk header at offset $off")
      val id = r.ascii(off, 4)
      val size = r.le32(off + 4)
      if (size > Int.MaxValue - 8 || off + 8 + size > end)
        fail(Avi, s"chunk '$id' at offset $off overruns payload (size $size)")
      f(id, off + 8, size.toInt)
      off += 8 + size.toInt + (size.toInt % 2) // RIFF even padding
    }
  }

  /** Validate the RIFF envelope: magic, and a size that covers at
    * least the 'AVI ' form fourcc and fits the payload. */
  private def aviRiffEnd(r: R): Int = {
    if (r.ascii(0, 4) != "RIFF" || r.ascii(8, 4) != "AVI ")
      fail(Avi, "payload lacks the RIFF/'AVI ' magic")
    val sz = r.le32(4)
    if (sz < 4 || 8 + sz > r.len)
      fail(Avi, s"RIFF size $sz does not fit payload ${r.len}")
    (8 + sz).toInt
  }

  private def parseAvi(docId: Long, r: R): VideoMeta = {
    val riffEnd = aviRiffEnd(r)
    var meta: Option[VideoMeta] = None
    riffChunks(r, 12, riffEnd) { (id, off, size) =>
      if (id == "LIST" && r.ascii(off, 4) == "hdrl")
        riffChunks(r, off + 4, off + size) { (id2, off2, size2) =>
          if (id2 == "avih") {
            if (size2 < 40) fail(Avi, s"avih main header too short ($size2 bytes)")
            val usPerFrame = r.le32(off2)
            val totalFrames = r.le32(off2 + 16)
            val w = r.le32(off2 + 32)
            val h = r.le32(off2 + 36)
            if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
              fail(Avi, s"avih carries non-positive dimensions ${w}x$h")
            // both fields are unvalidated 32-bit values; their product
            // can exceed Long range — raise, never a garbage duration
            if (usPerFrame > 0 && totalFrames > Long.MaxValue / usPerFrame)
              fail(Avi, s"avih duration overflows: $usPerFrame us/frame x $totalFrames frames")
            meta = Some(VideoMeta(docId, "avi", w.toInt, h.toInt, totalFrames,
              usPerFrame * totalFrames / 1000))
          }
        }
    }
    meta.getOrElse(fail(Avi, "no avih main header in hdrl LIST"))
  }

  /** AVI frame demux: every '..dc'/'..db' chunk inside LIST(movi), in
    * file order. */
  private def aviFrames(r: R): Iterator[Array[Byte]] = {
    val riffEnd = aviRiffEnd(r)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    riffChunks(r, 12, riffEnd) { (id, off, size) =>
      if (id == "LIST" && r.ascii(off, 4) == "movi")
        riffChunks(r, off + 4, off + size) { (id2, off2, size2) =>
          if (id2.endsWith("dc") || id2.endsWith("db"))
            out += r.slice(off2, size2)
        }
    }
    out.iterator
  }

  // ---- ISO-BMFF/MP4 parser -----------------------------------------

  private val Mp4 = "ISO-BMFF/MP4"

  /** Walk boxes in [off, end) calling f(kind, bodyOff, bodyEnd);
    * handles 32-bit, 64-bit (size==1) and to-end (size==0) largesizes. */
  private def boxes(r: R, off0: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = off0
    while (off < end) {
      if (off + 8 > end) fail(Mp4, s"truncated box header at offset $off")
      val size32 = r.be32(off)
      val kind = r.ascii(off + 4, 4)
      val (bodyOff, boxEnd) =
        if (size32 == 1L) {
          val size64 = r.be64(off + 8)
          if (size64 < 16 || off + size64 > end)
            fail(Mp4, s"box '$kind' largesize $size64 overruns payload")
          (off + 16, (off + size64).toInt)
        } else if (size32 == 0L) (off + 8, end)
        else {
          if (size32 < 8 || off + size32 > end)
            fail(Mp4, s"box '$kind' at offset $off overruns payload (size $size32)")
          (off + 8, (off + size32).toInt)
        }
      f(kind, bodyOff, boxEnd)
      off = boxEnd
    }
  }

  private final case class Mp4State(var timescale: Long = 0, var duration: Long = 0,
    var width: Int = 0, var height: Int = 0, var isVideoTrack: Boolean = false,
    var nSamples: Long = 0, var sizes: Array[Int] = Array.empty,
    var chunkOff: Long = -1, var nChunks: Long = 0)

  private def walkMp4(r: R, st: Mp4State): Unit = {
    if (r.ascii(4, 4) != "ftyp") fail(Mp4, "payload lacks the ftyp box")
    boxes(r, 0, r.len) { (kind, off, end) =>
      if (kind == "moov") boxes(r, off, end) { (k2, o2, e2) =>
        if (k2 == "mvhd") {
          val ver = (r.be32(o2) >> 24).toInt
          if (ver == 1) { st.timescale = r.be32(o2 + 20); st.duration = r.be64(o2 + 24) }
          else { st.timescale = r.be32(o2 + 12); st.duration = r.be32(o2 + 16) }
          if (st.timescale <= 0) fail(Mp4, "mvhd timescale is zero")
        } else if (k2 == "trak") {
          var w = 0; var h = 0; var vide = false
          var n = 0L; var sizes = Array.empty[Int]; var co = -1L; var nch = 0L
          boxes(r, o2, e2) { (k3, o3, e3) =>
            if (k3 == "tkhd") {
              val ver = (r.be32(o3) >> 24).toInt
              val dimOff = e3 - 8 // width/height close the box in v0 and v1
              w = (r.be32(dimOff) >> 16).toInt
              h = (r.be32(dimOff + 4) >> 16).toInt
              val _ = ver
            } else if (k3 == "mdia") boxes(r, o3, e3) { (k4, o4, e4) =>
              if (k4 == "hdlr") vide = vide || r.ascii(o4 + 8, 4) == "vide"
              else if (k4 == "minf") boxes(r, o4, e4) { (k5, o5, e5) =>
                if (k5 == "stbl") boxes(r, o5, e5) { (k6, o6, e6) =>
                  if (k6 == "stsz") {
                    val fixed = r.be32(o6 + 4)
                    n = r.be32(o6 + 8)
                    if (n > Int.MaxValue) fail(Mp4, s"stsz sample count $n exceeds parser bounds")
                    sizes =
                      if (fixed != 0L) Array.fill(n.toInt)(fixed.toInt)
                      else {
                        r.need(o6 + 12L, n * 4)
                        Array.tabulate(n.toInt)(i => r.be32(o6 + 12 + i * 4).toInt)
                      }
                    val _ = e6
                  } else if (k6 == "stco" && co < 0) {
                    nch = r.be32(o6 + 4)
                    if (nch > 0) co = r.be32(o6 + 8)
                  }
                }
              }
            }
          }
          if (vide && !st.isVideoTrack) {
            st.isVideoTrack = true; st.width = w; st.height = h
            st.nSamples = n; st.sizes = sizes; st.chunkOff = co
            st.nChunks = nch
          }
        }
      }
    }
    if (st.timescale == 0) fail(Mp4, "no mvhd box under moov")
    if (!st.isVideoTrack) fail(Mp4, "no 'vide' handler track under moov")
  }

  private def parseMp4(docId: Long, r: R): VideoMeta = {
    val st = Mp4State()
    walkMp4(r, st)
    VideoMeta(docId, "mp4", st.width, st.height, st.nSamples,
      st.duration * 1000 / st.timescale)
  }

  /** MP4 frame demux: slice mdat at stco's first chunk offset by the
    * stsz sample sizes (samples contiguous within the chunk). The
    * contiguity assumption only holds for single-chunk layouts, so a
    * multi-chunk stco fails loudly instead of silently mis-slicing
    * (stco with one chunk forces stsc to map every sample there). */
  private def mp4Frames(r: R): Iterator[Array[Byte]] = {
    val st = Mp4State()
    walkMp4(r, st)
    if (st.nSamples == 0) Iterator.empty
    else {
      if (st.chunkOff < 0) fail(Mp4, "stsz declares samples but stco has no chunk offset")
      if (st.nChunks > 1)
        fail(Mp4, s"stco declares ${st.nChunks} chunks; only single-chunk sample layouts are demuxable")
      var off = st.chunkOff
      st.sizes.iterator.map { sz =>
        val f = r.slice(off.toInt, sz); off += sz; f
      }
    }
  }

  // ---- public parse surface ----------------------------------------

  /** Container metadata parse, dispatching on the sniffed magic. Not a
    * video container → UnsupportedFormatException naming what WAS seen. */
  def parseMeta(docId: Long, payload: Array[Byte]): VideoMeta =
    Multimodal.sniffVideoContainer(payload) match {
      case Some(fmt) if fmt.startsWith("AVI") => parseAvi(docId, new R(payload, Avi))
      case Some(_)                            => parseMp4(docId, new R(payload, Mp4))
      case None => throw new UnsupportedFormatException(
        "payload is not a recognized video container (no RIFF/'AVI ' or ISO-BMFF ftyp magic)")
    }

  /** Real frame demux for a sniffed container payload: raw frame bytes
    * in stream order. */
  def demuxFrames(payload: Array[Byte]): Iterator[Array[Byte]] =
    Multimodal.sniffVideoContainer(payload) match {
      case Some(fmt) if fmt.startsWith("AVI") => aviFrames(new R(payload, Avi))
      case Some(_)                            => mp4Frames(new R(payload, Mp4))
      case None => throw new UnsupportedFormatException(
        "payload is not a recognized video container (no RIFF/'AVI ' or ISO-BMFF ftyp magic)")
    }

  // ---- Spark stages ------------------------------------------------

  /** Synthetic video corpus keyed off an id column — even ids encode as
    * MP4, odd as AVI; dims/frame-count/frame-length are pure functions
    * of the id (width id%16+1, height id%9+1, frames id%12+1, frame
    * length id%20+5, 25 fps) so an oracle recomputes the parsed
    * metadata AND every demuxed frame's byte fold arithmetically while
    * the Spark side goes through the REAL container encode→parse round
    * trip. Encoding runs per-partition, the batched codec shape. */
  def syntheticVideos(docs: DataFrame, idCol: String): Dataset[Multimodal.MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (w, h, n, fl) =
            ((id % 16 + 1).toInt, (id % 9 + 1).toInt, (id % 12 + 1).toInt,
              (id % 20 + 5).toInt)
          val (payload, mt) =
            if (id % 2 == 0) (encodeMp4(w, h, n, fl, id), "video/mp4")
            else (encodeAvi(w, h, n, fl, id), "video/x-msvideo")
          Multimodal.MediaRow(id, payload, mt, payload.length.toLong)
        }
      }
  }

  /** The metadata-prune stage of a video corpus: container parse only,
    * frame bytes untouched. Per-partition map, zero shuffle. */
  def videoMeta(media: Dataset[Multimodal.MediaRow]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows => rows.map(r => parseMeta(r.doc_id, r.payload)))
  }
}
