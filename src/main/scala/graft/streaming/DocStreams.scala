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
  /** BucketCap-capped (band, key, old_id) index of the existing
    * corpus. Capping uses the batch operators' collect-and-slice rule
    * (smallest doc_ids win) in ONE aggregation — no per-bucket window
    * sort — and bounds the join fan-out a degenerate boilerplate
    * bucket could otherwise cause. At scale this index is WRITTEN once
    * (bucketed on (band, key)) and reused across batches. */
  def corpusBandIndex(spark: SparkSession, corpusDir: String): DataFrame =
    Dedup.bandsOf(spark, Tables.documents(spark, corpusDir))
      .groupBy("band", "key")
      .agg(expr(s"slice(array_sort(collect_list(doc_id)), 1, ${Dedup.BucketCap})")
        .as("ids"))
      .select(col("band"), col("key"), explode(col("ids")).as("old_id"))

  /** Matches of streaming docs against a pre-built corpus band index
    * (pass a persisted/written [[corpusBandIndex]] so micro-batches
    * don't recompute the static side). */
  def incrementalMatches(spark: SparkSession, streamDir: String,
                         corpusIndex: DataFrame): DataFrame =
    Dedup.bandsOf(spark, readDocs(spark, streamDir))
      .join(corpusIndex, Seq("band", "key"))
      .select("doc_id", "old_id", "band", "key")

  /** Convenience form for ad-hoc use: recomputes the corpus index per
    * micro-batch. Long-running queries should build [[corpusBandIndex]]
    * once, `.persist()` (or write it bucketed) and pass it to the
    * DataFrame overload, unpersisting when the query stops — a hidden
    * persist here would pin one cached copy per CALL for the session
    * lifetime with no handle to release it. */
  def incrementalMatches(spark: SparkSession, streamDir: String,
                         corpusDir: String): DataFrame =
    incrementalMatches(spark, streamDir, corpusBandIndex(spark, corpusDir))
}
