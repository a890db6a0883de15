package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Tables

/** F1: multimodal column plumbing — opaque binary payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode is REAL for image headers: [[parseImageMeta]] does the
  * actual byte-level PNG IHDR parse (magic + big-endian dimensions)
  * and the actual JPEG segment walk to the SOF frame header — the same
  * arithmetic any codec front-end performs — and fingerprints the
  * embedded content stream behind the header. Full pixel decode would
  * need codec libraries this container doesn't ship; the header layer
  * is where schema-relevant metadata lives anyway.
  *
  * The media table wraps each document's utf-8 bytes in a valid PNG or
  * JPEG header (alternating by doc_id) whose dimension fields derive
  * from md5(text) — so the oracle can reconstruct the expected parse
  * output portably while Spark's side actually reads it back out of
  * the bytes.
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

  /** Decoded features: mime sniffed from magic bytes, width/height
    * parsed from the image header, fp8 = fingerprint of the content
    * stream behind the header. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           fp8: String, width: Int, height: Int)

  private val PngHeaderLen = 29  // magic 8 + len 4 + "IHDR" 4 + w 4 + h 4 + bits/color/comp/filter/interlace 5
  private val JpegHeaderLen = 39 // SOI 2 + APP0 (2+16) + SOF0 (2+17)

  // ------------------------------------------------------------ decode
  /** Parsed header: detected mime, width, height, and the offset where
    * the content stream starts. */
  case class ImageMeta(mime: String, width: Int, height: Int, contentAt: Int)

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 24) | ((p(i + 1) & 0xFF) << 16) |
      ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)

  private val PngMagic =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Real image-header parse, pure byte arithmetic.
    *
    * PNG: 8-byte magic, then the IHDR chunk (length + "IHDR" type tag
    * verified), width/height as big-endian uint32 at offsets 16/20;
    * content starts after the 5 IHDR value bytes.
    *
    * JPEG: SOI marker, then the standard segment walk — each segment
    * is 0xFF marker + 2-byte big-endian length (inclusive) — until a
    * start-of-frame marker (0xC0-0xCF except the DHT/JPG/DAC markers
    * C4/C8/CC); height/width are big-endian uint16 at SOF payload
    * offsets 3/5. Content = bytes after the SOF segment. */
  def parseImageMeta(p: Array[Byte]): Option[ImageMeta] = {
    if (p.length >= PngHeaderLen && p.take(8).sameElements(PngMagic)) {
      val ihdrTag = new String(p.slice(12, 16), "US-ASCII")
      if (ihdrTag != "IHDR") None
      else Some(ImageMeta("image/png", be32(p, 16), be32(p, 20), PngHeaderLen))
    } else if (p.length >= 4 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 9 < p.length && (p(i) & 0xFF) == 0xFF) {
        val marker = p(i + 1) & 0xFF
        val segLen = be16(p, i + 2)
        if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          return Some(ImageMeta("image/jpeg",
            be16(p, i + 7), be16(p, i + 5), i + 2 + segLen))
        }
        if (segLen < 2) return None // malformed length can't advance
        i += 2 + segLen
      }
      None
    } else None
  }

  /** Per-blob decode: header parse + content-stream fingerprint. An
    * unparseable blob degrades to octet-stream with zero dimensions
    * and a whole-payload fingerprint instead of failing the pipeline. */
  private[graft] def decodeOne(md: MessageDigest, r: MediaRecord): MediaFeatures = {
    md.reset()
    parseImageMeta(r.payload) match {
      case Some(m) =>
        val fp = md.digest(r.payload.drop(m.contentAt)).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, m.mime, r.n_bytes, fp.substring(0, 8), m.width, m.height)
      case None =>
        val fp = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, "application/octet-stream", r.n_bytes,
          fp.substring(0, 8), 0, 0)
    }
  }

  /** Decode/feature-extract pipeline: per-partition codec setup, lazy
    * iterator (bounded memory), one output row per blob. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition "codec"
      it.map(r => decodeOne(md, r))
    }
  }

  // ------------------------------------------------------- media table
  /** md5(text)-derived image dimensions (1..256): the construction the
    * oracle mirrors to predict what the parser must read back. */
  private def dimW(text: Column): Column = Portable.hexPairToInt(md5(text), 1) + 1
  private def dimH(text: Column): Column = Portable.hexPairToInt(md5(text), 3) + 1
  private def dimWSql(text: String) = s"(${Portable.hexPairToIntSql(s"md5($text)", 1)} + 1)"
  private def dimHSql(text: String) = s"(${Portable.hexPairToIntSql(s"md5($text)", 3)} + 1)"

  /** Build the media table from documents: each text's utf-8 bytes
    * wrapped in a REAL PNG (even doc_id) or JPEG (odd doc_id) header
    * built with codegen'd hex/unhex ops — no UDF. The declared `mime`
    * metadata rides along; the decoder re-derives it from magic bytes
    * rather than trusting it. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val w = dimW(col("text"))
    val h = dimH(col("text"))
    val hex8 = (c: Column) => lpad(hex(c), 8, "0")
    val hex4 = (c: Column) => lpad(hex(c), 4, "0")
    val pngHeader = concat(
      lit("89504E470D0A1A0A0000000D49484452"), hex8(w), hex8(h), lit("0802000000"))
    val jpegHeader = concat(
      lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
      hex4(h), hex4(w), lit("03011100021101031101"))
    val headerHex = when(col("doc_id") % 2 === 0, pngHeader).otherwise(jpegHeader)
    val payload = concat(unhex(headerHex), col("text").cast("binary"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        payload.as("payload"),
        when(col("doc_id") % 2 === 0, "image/png").otherwise("image/jpeg").as("mime"),
        length(payload).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Oracle-checkable query: the full pipeline over documents. The
    * oracle reconstructs the expected parse output from the same
    * md5(text) construction, portably; the Spark side actually reads
    * it back out of the payload bytes. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        col("fp8"), col("width"), col("height"))
      .orderBy("doc_id")

  val binaryMetaSql: String =
    s"""SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
      |  CAST(octet_length(CAST(text AS BLOB))
      |    + CASE WHEN doc_id % 2 = 0 THEN $PngHeaderLen ELSE $JpegHeaderLen END AS BIGINT) AS n_bytes,
      |  substring(md5(text), 1, 8) AS fp8,
      |  ${dimWSql("text")} AS width,
      |  ${dimHSql("text")} AS height
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
