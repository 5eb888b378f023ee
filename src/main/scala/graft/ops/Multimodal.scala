package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.6): media as opaque BinaryType
  * payloads + a typed metadata struct, with feature extraction running
  * per-partition over iterators (the Scala analogue of a batched
  * mapInPandas stage: one decoder instantiation per partition, streaming
  * over rows, never a per-row UDF round-trip).
  *
  * The DECODE step is a deterministic stub — this container has no
  * image/audio codecs — marked [STUB]. The Spark-side contract (schema,
  * partitioning, batch iteration, output shape) is real and tested; a
  * production deployment swaps [[FakeDecoder]] for a codec-backed one
  * with the same signature.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the pattern for
    * image/audio/video columns at 100 TB: metadata prunes, payload is
    * only touched by the decode stage). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            media_type: String, byte_len: Long)

  final case class MediaFeatures(doc_id: Long, byte_len: Long,
                                 n_frames: Long, checksum: Long)

  /** [STUB] Deterministic fake decoder: "frames" are 100-byte windows,
    * "checksum" is the polynomial CODE-POINT hash (mod 1e9+7) of the
    * UTF-8-decoded payload — the same fold as
    * [[graft.functions.TextFeatures.charHash]] for ANY text, ASCII or
    * not (a byte-wise fold would silently diverge from the code-point
    * oracle on multi-byte characters). A real decoder would decode
    * payload bytes here instead.
    */
  object FakeDecoder {
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

  /** The batched feature-extraction stage: mapPartitions so decoder
    * setup cost amortizes across each partition's rows. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here ([STUB]: none needed)
      rows.map(FakeDecoder.features)
    }
  }
}
