package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** F1: multimodal column plumbing — opaque binary payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The real decode (image/audio libraries) is STUBBED with a
  * deterministic fake derived from the payload's md5 (this container
  * ships no codecs); everything around it — the binary column, the
  * typed metadata schema, the bounded-memory per-partition iterator,
  * the batch shape — is real. Swap [[decodeStub]] for a JNI/codec call
  * and nothing else changes.
  *
  * mapPartitions is the right tool here (the one legitimate use per
  * SURVEY §4): decode is imperative per-blob work with per-partition
  * setup (codec handles), and the iterator is consumed lazily — no
  * partition is ever materialized in memory.
  */
object Multimodal {

  /** Typed payload record: what a real multimodal table looks like —
    * an opaque blob plus its declared metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String,
                         n_bytes: Long)

  /** Decoded features; width/height/fp are the stub's deterministic
    * fake "decode" output. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           fp8: String, width: Int, height: Int)

  /** Build the media table from documents: payload = utf-8 bytes of
    * the text (stands in for image bytes; same opaque-binary shape). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic fake dimensions + fingerprint from the
    * payload's md5. A real implementation opens the codec here (once
    * per partition, outside the per-record loop). */
  private[graft] def decodeStub(md: MessageDigest, r: MediaRecord): MediaFeatures = {
    md.reset()
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    // fake "decoded dimensions": first two nibbles, 1-based
    val width = Integer.parseInt(hex.substring(0, 1), 16) + 1
    val height = Integer.parseInt(hex.substring(1, 2), 16) + 1
    MediaFeatures(r.doc_id, r.mime, r.n_bytes, hex.substring(0, 8), width, height)
  }

  /** Decode/feature-extract pipeline: per-partition codec setup, lazy
    * iterator (bounded memory), one output row per blob. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition "codec"
      it.map(r => decodeStub(md, r))
    }
  }

  /** Oracle-checkable query: the full pipeline over documents. The
    * stub's md5-derived fields are reproducible in SQL (nibble N ->
    * position in the hex alphabet), so DuckDB verifies the plumbing
    * end-to-end. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        col("fp8"), col("width"), col("height"))
      .orderBy("doc_id")

  val binaryMetaSql: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  substring(md5(text), 1, 8) AS fp8,
      |  CAST(strpos('0123456789abcdef', substring(md5(text), 1, 1)) AS INT) AS width,
      |  CAST(strpos('0123456789abcdef', substring(md5(text), 2, 1)) AS INT) AS height
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
