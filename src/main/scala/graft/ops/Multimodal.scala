package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.6): media as opaque BinaryType
  * payloads + a typed metadata struct, with feature extraction running
  * per-partition over iterators (the Scala analogue of a batched
  * mapInPandas stage: one decoder instantiation per partition, streaming
  * over rows, never a per-row UDF round-trip).
  *
  * Two real codecs:
  *  - `text/plain` payloads decode as UTF-8 and hash with the engine's
  *    polynomial code-point fold ([[TextDecoder]]) — deterministic and
  *    DuckDB-oracle-checkable (q32);
  *  - `image/…` payloads decode with the JDK's ImageIO ([[ImageDecoder]])
  *    — a genuine binary codec, exercised end-to-end by q60's
  *    encode→decode PNG round-trip whose metadata the oracle recomputes
  *    arithmetically.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the pattern for
    * image/audio/video columns at 100 TB: metadata prunes, payload is
    * only touched by the decode stage). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            media_type: String, byte_len: Long)

  final case class MediaFeatures(doc_id: Long, byte_len: Long,
                                 n_frames: Long, checksum: Long)

  /** Decoded image metadata: the prune-first columns a 100 TB image
    * corpus filters on before anyone touches pixels. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
                             fmt: String)

  /** Codec for `text/plain` payloads: "frames" are 100-byte windows,
    * "checksum" is the polynomial CODE-POINT hash (mod 1e9+7) of the
    * UTF-8-decoded payload — the same fold as
    * [[graft.functions.TextFeatures.charHash]] for ANY text, ASCII or
    * not (a byte-wise fold would silently diverge from the code-point
    * oracle on multi-byte characters).
    */
  object TextDecoder {
    val HashMod = 1000000007L
    def features(r: MediaRow): MediaFeatures = {
      val s = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % HashMod
        i += Character.charCount(cp)
      }
      MediaFeatures(r.doc_id, r.byte_len, r.byte_len / 100 + 1, h)
    }
  }

  /** Codec for `image/…` payloads: JDK ImageIO (dependency-free). Images
    * are single-frame; the checksum is the polynomial fold of ARGB pixel
    * values in row-major order — deterministic across JVMs because PNG is
    * lossless. */
  object ImageDecoder {
    def decode(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "ImageIO could not decode payload")
      img
    }

    def features(r: MediaRow): MediaFeatures = {
      val img = decode(r.payload)
      var h = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          h = (h * 31 + (img.getRGB(x, y) & 0xffffffffL)) % TextDecoder.HashMod
          x += 1
        }
        y += 1
      }
      MediaFeatures(r.doc_id, r.byte_len, 1L, h)
    }

    /** Width/height/format without a full pixel decode: ImageIO readers
      * parse the header only — the metadata-prune path for a 100 TB
      * corpus where most payloads are filtered out before pixel work. */
    def meta(docId: Long, payload: Array[Byte]): ImageMeta = {
      val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no ImageIO reader for payload")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          ImageMeta(docId, reader.getWidth(0), reader.getHeight(0),
            reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
        } finally reader.dispose()
      } finally iis.close()
    }

    /** Deterministic nearest-neighbor resize: target pixel (x, y) reads
      * source pixel (x·sw DIV tw, y·sh DIV th) — integer arithmetic
      * only, so the result is bit-identical on any JVM/platform (a
      * Graphics2D interpolated scale is not) and an oracle can recompute
      * the resized raster arithmetically. Nearest-neighbor is also what
      * a thumbnail-for-dedup stage wants: pixel values survive verbatim
      * for hashing. */
    def resizeNearest(img: BufferedImage, tw: Int, th: Int): BufferedImage = {
      require(tw > 0 && th > 0, "resize target must be positive")
      val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < th) {
        val sy = y * img.getHeight / th
        var x = 0
        while (x < tw) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / tw, sy))
          x += 1
        }
        y += 1
      }
      out
    }

    /** Deterministic PNG: dims + a doc_id-seeded RGB gradient fill. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val rgb = (((seed + x * 31 + y * 17) % 256).toInt << 16) |
            ((((seed >> 3) + x) % 256).toInt << 8) | ((seed + y) % 256).toInt
          img.setRGB(x, y, rgb)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** Wrap a text corpus as a binary media table (UTF-8 payloads) — the
    * ingestion shape a real media pipeline produces. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"))
      .as[MediaRow]
  }

  /** Synthetic PNG corpus keyed off an id column: width/height are pure
    * functions of the id (doc_id%16+1 × doc_id%7+1) so an oracle can
    * recompute the decoded metadata arithmetically while the Spark side
    * goes through a REAL ImageIO encode→decode round-trip. Encoding runs
    * per-partition (mapPartitions), the same batched shape as decode. */
  def syntheticImages(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val png = ImageDecoder.encodePng((id % 16 + 1).toInt, (id % 7 + 1).toInt, id)
          MediaRow(id, png, "image/png", png.length.toLong)
        }
      }
  }

  /** The batched feature-extraction stage: mapPartitions so decoder
    * setup cost amortizes across each partition's rows; rows dispatch to
    * the payload's codec by media type. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.media_type.startsWith("image/")) ImageDecoder.features(r)
        else TextDecoder.features(r)
      }
    }
  }

  /** Header-only image metadata extraction (width/height/format). */
  def imageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows => rows.map(r => ImageDecoder.meta(r.doc_id, r.payload)))
  }

  /** Synthetic WAV corpus keyed off an id column: sample count is a
    * pure function of the id (doc_id%50 + 10 at 8 kHz mono) so an
    * oracle recomputes the decoded metadata and sample checksum
    * arithmetically while the Spark side goes through a REAL
    * javax.sound RIFF/WAVE parse. */
  def syntheticAudio(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val wav = AudioCodec.encodeWav((id % 50 + 10).toInt, 8000, id)
          MediaRow(id, wav, "audio/wav", wav.length.toLong)
        }
      }
  }

  /** The audio decode stage: per-partition AudioSystem parse + PCM
    * checksum, same batched shape as every codec stage. */
  def audioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows => rows.map(r => AudioCodec.meta(r.doc_id, r.payload)))
  }

  /** The RESIZE stage: decode → nearest-neighbor scale to (tw, th) →
    * ARGB checksum of the resized raster. Batched per partition like
    * every codec stage; fully deterministic (integer source-pixel
    * selection, lossless PNG), so the q71 oracle recomputes the resized
    * raster's fold from the synthetic gradient arithmetic alone — any
    * codec or scaling defect hash-mismatches. */
  def resizedChecksums(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = ImageDecoder.resizeNearest(ImageDecoder.decode(r.payload), tw, th)
        var h = 0L
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            h = (h * 31 + (img.getRGB(x, y) & 0xffffffffL)) % TextDecoder.HashMod
            x += 1
          }
          y += 1
        }
        MediaFeatures(r.doc_id, r.byte_len, 1L, h)
      }
    }
  }

  /** Perceptual difference-hash row: the 64-bit content key an image
    * corpus dedups on (metadata width/height ride for pruning). */
  final case class ImageHash(doc_id: Long, width: Int, height: Int,
                             dhash: Long)

  /** X182: perceptual image dHash — the difference-hash of the
    * near-dup-image literature (Krawetz's dHash; the pHash family's
    * cheapest member): decode, nearest-neighbor-resize to `tw`×`th`
    * (integer source-pixel selection — bit-identical on any JVM, and
    * arithmetically mirrorable by an oracle), take the integer BT.601
    * luma 299R+587G+114B per pixel, and emit one bit per horizontal
    * neighbor pair — bit (y·(tw−1)+x) set iff luma(x+1,y) > luma(x,y).
    * Identical content at different encodings/scales collides; the
    * hash is the equi-join key that turns image near-dup into the same
    * bucket-join shape as text dedup (group by dhash, or band it like
    * SimHash for small hamming radii) — never a pixel-space cross
    * join. Default 9×8 = exactly 64 bits.
    *
    * Per-partition batched decode like every codec stage; metadata
    * columns (width/height of the ORIGINAL image) ride along so a
    * downstream dedup can prune before comparing payloads.
    */
  def imageDHash(media: Dataset[MediaRow], tw: Int = 9,
                 th: Int = 8): Dataset[ImageHash] = {
    require(tw >= 2 && th >= 1 && (tw - 1) * th <= 64,
      s"dHash grid must emit 1..64 bits, got ${tw}x$th")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      def luma(rgb: Int): Int =
        299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)
      rows.map { r =>
        val src = ImageDecoder.decode(r.payload)
        val img = ImageDecoder.resizeNearest(src, tw, th)
        var h = 0L
        var bit = 0
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw - 1) {
            if (luma(img.getRGB(x + 1, y)) > luma(img.getRGB(x, y)))
              h |= 1L << bit
            bit += 1
            x += 1
          }
          y += 1
        }
        ImageHash(r.doc_id, src.getWidth, src.getHeight, h)
      }
    }
  }

  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_hash: Long)

  /** Decoded audio metadata + content checksum: the prune/verify
    * columns of an audio corpus. */
  final case class AudioMeta(doc_id: Long, sample_rate: Int, n_channels: Int,
                             n_samples: Long, checksum: Long)

  /** Codec for `audio/…` payloads: JDK javax.sound.sampled — a genuine
    * audio container parse (RIFF/WAVE header → format + frame count →
    * PCM stream), the audio twin of [[ImageDecoder]]. PCM is lossless,
    * so sample checksums are deterministic across JVMs. */
  object AudioCodec {
    /** Canonical 44-byte PCM16LE mono WAV holding `nSamples`
      * deterministic seed-derived samples (u16 value
      * (seed·31 + i·7) mod 65536, little-endian). */
    def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      def w32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      val dataLen = nSamples * 2
      out.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      w32(36 + dataLen)
      out.write("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      w32(16); w16(1); w16(1); w32(sampleRate); w32(sampleRate * 2); w16(2); w16(16)
      out.write("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      w32(dataLen)
      var i = 0
      while (i < nSamples) {
        w16(((seed * 31 + i.toLong * 7) % 65536).toInt)
        i += 1
      }
      out.toByteArray
    }

    /** Decoded sample magnitudes |s| of the PCM16LE stream: u16 pairs
      * → two's-complement signed value → absolute value. The amplitude
      * domain every QA/fingerprint stage shares (and the oracle
      * mirrors: `u < 32768 ? u : 65536 − u`). */
    def amplitudes(payload: Array[Byte]): Array[Int] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val bytes = in.readAllBytes()
        val out = new Array[Int](bytes.length / 2)
        var i = 0
        while (i + 1 < bytes.length) {
          val u = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
          out(i / 2) = if (u < 32768) u else 65536 - u
          i += 2
        }
        out
      } finally in.close()
    }

    /** Parse + decode through AudioSystem (format, frame count, PCM
      * bytes), folding the unsigned 16-bit samples with the engine's
      * polynomial hash. */
    def meta(docId: Long, payload: Array[Byte]): AudioMeta = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        var h = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          val u16 = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
          h = (h * 31 + u16) % TextDecoder.HashMod
          i += 2
        }
        AudioMeta(docId, fmt.getSampleRate.toInt, fmt.getChannels,
          in.getFrameLength, h)
      } finally in.close()
    }
  }

  /** Audio energy-fingerprint row: bounded windows + the comparison-bit
    * hash an audio corpus dedups on. */
  final case class AudioHash(doc_id: Long, n_samples: Long, n_windows: Long,
                             ehash: Long)

  /** X183: audio energy dHash — [[imageDHash]]'s audio twin (the
    * Shazam-family intuition with the cheapest possible frame feature):
    * decode the REAL PCM stream, sum sample magnitudes over fixed
    * `windowSamples`-sample windows (complete windows only), and emit
    * one bit per consecutive-window comparison — bit w set iff
    * E(w+1) > E(w), first 64 comparisons. Level-invariant-ish (a
    * re-encoded or slightly renormalized copy keeps its energy SHAPE),
    * integer-exact, and the output is an equi-join key: audio near-dup
    * becomes group-by-ehash, the same shape as text/image dedup —
    * never a sample-space cross join. Per-partition batched decode,
    * zero shuffle.
    */
  def audioEnergyHash(media: Dataset[MediaRow],
                      windowSamples: Int = 8): Dataset[AudioHash] = {
    require(windowSamples >= 1,
      s"energy window must be at least one sample: $windowSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val amps = AudioCodec.amplitudes(r.payload)
        val nw = amps.length / windowSamples
        val e = Array.tabulate(nw) { w =>
          var s = 0L
          var i = w * windowSamples
          val end = i + windowSamples
          while (i < end) { s += amps(i); i += 1 }
          s
        }
        var h = 0L
        var w = 0
        while (w < nw - 1 && w < 64) {
          if (e(w + 1) > e(w)) h |= 1L << w
          w += 1
        }
        AudioHash(r.doc_id, amps.length.toLong, nw.toLong, h)
      }
    }
  }

  /** Audio QA row: the clip/silence prune columns of an audio corpus. */
  final case class AudioQuality(doc_id: Long, n_samples: Long, peak: Long,
                                mean_amp: Long, n_clipped: Long,
                                n_silent: Long)

  /** X184: audio QA — clipping and silence detection over the REAL
    * decoded PCM: peak and mean magnitude, samples at/above
    * `clipLevel` (distortion), samples at/below `silenceLevel` (dead
    * air). The audio counterpart of the text quality gate: a corpus
    * drops or flags tracks that are mostly silence or clipped before
    * anyone pays for feature extraction. All integer (mean is a
    * truncating div), per-partition batched decode, zero shuffle.
    */
  def audioQuality(media: Dataset[MediaRow], clipLevel: Int = 32700,
                   silenceLevel: Int = 100): Dataset[AudioQuality] = {
    require(clipLevel >= 0 && silenceLevel >= 0 && silenceLevel < clipLevel,
      s"need 0 <= silenceLevel < clipLevel, got $silenceLevel / $clipLevel")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val amps = AudioCodec.amplitudes(r.payload)
        var peak = 0L; var sum = 0L; var nc = 0L; var ns = 0L
        amps.foreach { a =>
          if (a > peak) peak = a
          sum += a
          if (a >= clipLevel) nc += 1
          if (a <= silenceLevel) ns += 1
        }
        AudioQuality(r.doc_id, amps.length.toLong, peak,
          if (amps.isEmpty) 0L else sum / amps.length, nc, ns)
      }
    }
  }

  /** Image QA row: the dark/blank/low-contrast prune columns. */
  final case class ImageQuality(doc_id: Long, width: Int, height: Int,
                                mean_luma: Long, min_luma: Long,
                                max_luma: Long)

  /** X185: image QA — integer BT.601 luma statistics (×1000 scale)
    * over the REAL decoded raster, no resize: mean (dark/bright),
    * min/max (contrast range — max−min ≈ 0 is the blank/solid-color
    * detector). The prune stage an image corpus runs before any
    * expensive embedding: all integer, per-partition batched decode,
    * zero shuffle, metadata rides along.
    */
  def imageQuality(media: Dataset[MediaRow]): Dataset[ImageQuality] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      def luma(rgb: Int): Int =
        299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)
      rows.map { r =>
        val img = ImageDecoder.decode(r.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val l = luma(img.getRGB(x, y))
            if (l < mn) mn = l
            if (l > mx) mx = l
            sum += l
            x += 1
          }
          y += 1
        }
        ImageQuality(r.doc_id, w, h, sum / (w.toLong * h), mn.toLong,
          mx.toLong)
      }
    }
  }

  /** Container-magic sniff for video payloads — the dispatch key of the
    * frame-sample stage: a RIFF/AVI or ISO-BMFF (MP4/MOV/3GP) payload
    * routes to [[VideoContainers]]' real container demux, never
    * garbage-decodes as text. Returns the container name, or None for
    * non-video bytes. */
  def sniffVideoContainer(payload: Array[Byte]): Option[String] = {
    def ascii(off: Int, len: Int): String =
      if (payload.length < off + len) ""
      else new String(payload, off, len, java.nio.charset.StandardCharsets.US_ASCII)
    if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "AVI ") Some("AVI (RIFF)")
    else if (ascii(4, 4) == "ftyp")
      Some(s"ISO-BMFF/MP4 (ftyp brand '${ascii(8, 4).trim}')")
    else None
  }

  /** The FRAME-SAMPLE stage: every `everyK`-th frame per payload — the
    * video-keyframe access pattern. Payloads carrying a real container
    * magic (RIFF/AVI, ISO-BMFF/MP4) demux through
    * [[VideoContainers.demuxFrames]] — the container's own frame
    * extents, hashed as unsigned bytes — and a truncated/corrupt
    * container fails NAMING the format (never a garbage row).
    * `text/plain` payloads frame as 100-CODE-POINT windows (matching
    * the oracle's code-point `substring`). Empty payloads emit no
    * frames. Per-partition batching throughout; only sampled frame
    * HASHES leave the stage, so downstream shuffles carry
    * |kept frames| rows, not payload bytes. */
  def frameSample(media: Dataset[MediaRow], everyK: Int,
                  frameLen: Int = 100): Dataset[FrameSample] = {
    require(everyK >= 1 && frameLen >= 1, "frame sampling needs positive k and frame length")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (sniffVideoContainer(r.payload).isDefined)
          (try VideoContainers.demuxFrames(r.payload).toArray
          catch {
            case e: graft.ingest.UnsupportedFormatException =>
              throw new graft.ingest.UnsupportedFormatException(
                s"doc ${r.doc_id}: ${e.getMessage}")
          }).iterator.zipWithIndex
            .filter(_._2 % everyK == 0)
            .map { case (frame, i) =>
              var h = 0L
              frame.foreach(b => h = (h * 31 + (b & 0xff)) % TextDecoder.HashMod)
              FrameSample(r.doc_id, i.toLong, h)
            }
        else {
          val cps = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
            .codePoints().toArray
          val nFrames = (cps.length + frameLen - 1) / frameLen
          (0 until nFrames).iterator
            .filter(_ % everyK == 0)
            .map { i =>
              val frame = cps.slice(i * frameLen, math.min((i + 1) * frameLen, cps.length))
              var h = 0L
              frame.foreach(cp => h = (h * 31 + cp) % TextDecoder.HashMod)
              FrameSample(r.doc_id, i.toLong, h)
            }
        }
      }
    }
  }
}
