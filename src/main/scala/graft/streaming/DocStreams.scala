package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** H9: streaming incremental dedup — the continuous form of
  * [[graft.operators.Dedup.incrementalDedup]]: documents arrive as a
  * stream (file source standing in for the crawl feed) and are
  * LSH-matched against the STATIC band index of the existing corpus
  * as they arrive.
  *
  * Plan shape per micro-batch: the incoming docs run the narrow
  * signature pipeline (split → native graft_minhash → band explode —
  * all streaming-safe, no state), then a stream-static equi-join on
  * (band, key). Emitted matches are append-mode with NO streaming
  * state at all: one row per colliding (incoming doc, corpus doc,
  * band) — at-least-once per band by design, deduplicated downstream
  * (batch `distinct`, or `dropDuplicatesWithinWatermark` when a
  * bounded-state continuous form is needed).
  *
  * At scale the static side is a PERSISTED band index (computed once
  * by [[Dedup.bandsOf]] over the corpus and bucketed on (band, key)),
  * not recomputed per micro-batch as the file-source test harness
  * does; the join then co-locates on the bucketing and the stream
  * side alone moves.
  */
object DocStreams {

  /** Streaming documents: file source over a directory of parquet
    * files with the pinned schema. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Tables.documentsSchema).parquet(dir)

  /** Matches of streaming docs against the corpus band index:
    * (doc_id, old_id, band, key) per collision. */
  def incrementalMatches(spark: SparkSession, streamDir: String,
                         corpusDir: String): DataFrame = {
    val streamBands = Dedup.bandsOf(spark, readDocs(spark, streamDir))
    // the static index caps each (band, key) bucket at BucketCap
    // members (smallest doc_ids — the batch operators' identical
    // rule), so one degenerate boilerplate bucket can't multiply every
    // matching arrival by an unbounded corpus population
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "key").orderBy("doc_id")
    val corpusBands = Dedup
      .bandsOf(spark, Tables.documents(spark, corpusDir))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rn") <= Dedup.BucketCap)
      .select(col("doc_id").as("old_id"), col("band"), col("key"))
    streamBands.join(corpusBands, Seq("band", "key"))
      .select("doc_id", "old_id", "band", "key")
  }
}
