package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** K1: document chunking — the window-with-overlap split every
  * retrieval/training pipeline runs between curation and encoding:
  * each document becomes ceil-many fixed-width character windows with
  * a fixed overlap, so downstream context assembly can stitch
  * neighboring chunks without losing boundary sentences. Chunk
  * identity is (doc_id, chunk_ix) with exact [char_start, char_end)
  * offsets back into the source text — the provenance a dedup or
  * attribution pass needs to map a chunk hit back to its document.
  *
  * Windowing rule (chars; a token window is the same arithmetic over
  * a token-offset array): stride S = window - overlap; chunk starts
  * at i·S for i in 0 .. floor(max(len - overlap - 1, 0) / S). The
  * upper bound means a final window is emitted only if it contributes
  * at least one character beyond the previous window's overlap — no
  * trailing chunk that is a strict sub-range of its predecessor, and
  * a doc shorter than the window still emits exactly chunk 0.
  *
  * Scale shape: one narrow projection + a per-row `sequence`/`explode`
  * (codegen'd generate, no shuffle, no state) — output volume is
  * len/S rows per doc, decided row-locally; at 100 TB chunking fuses
  * into the scan stage of whatever consumes the chunks. The `explode`
  * multiplies rows ~len/S ≈ 3-4× at these dials, which AQE re-splits
  * downstream if a consumer shuffles.
  */
object Chunking {

  /** Window width / overlap in characters. 200/40 are fixture-scaled
    * dials (docs run ~500 chars); production values are the same
    * arithmetic at 2048/256. */
  val Window = 200
  val Overlap = 40
  val Stride: Int = Window - Overlap

  def chunks(spark: SparkSession, dir: String,
             window: Int = Window, overlap: Int = Overlap): DataFrame = {
    val stride = window - overlap
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).as("len"))
      .withColumn("chunk_ix", explode(sequence(lit(0),
        floor(greatest(col("len") - overlap - 1, lit(0)) / stride).cast("int"))))
      .select(
        col("doc_id"), col("source"), col("chunk_ix").cast("long").as("chunk_ix"),
        (col("chunk_ix") * stride).cast("long").as("char_start"),
        least(col("chunk_ix") * stride + window, col("len"))
          .cast("long").as("char_end"),
        substring(col("text"), col("chunk_ix") * stride + 1, lit(window))
          .as("chunk_text"))
  }

  /** Oracle form: total order for the hash compare. The operator
    * itself stays unordered — a sort would be a pointless exchange at
    * 100 TB. */
  def qChunks(spark: SparkSession, dir: String): DataFrame =
    chunks(spark, dir).orderBy("doc_id", "chunk_ix")

  def chunksSql(window: Int = Window, overlap: Int = Overlap): String = {
    val stride = window - overlap
    s"""SELECT doc_id, source, ix AS chunk_ix,
      |  ix * $stride AS char_start,
      |  least(ix * $stride + $window, length(text)) AS char_end,
      |  substring(text, CAST(ix * $stride + 1 AS INT), $window) AS chunk_text
      |FROM (SELECT doc_id, source, text,
      |        unnest(range(0, CAST(floor(greatest(length(text) - $overlap - 1, 0) / $stride) AS BIGINT) + 1)) AS ix
      |      FROM documents) t
      |ORDER BY doc_id, chunk_ix""".stripMargin
  }
}
