package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SemanticDedup, SimilaritySearch}
import graft.sources.Tables

/** I7: streaming semantic dedup — the continuous form of
  * [[SemanticDedup.semanticDedupIncremental]], mirroring H9's
  * stream-static design in embedding space: vectors arrive as a
  * stream and are flagged against the KEPT members of the existing
  * deduped corpus as they arrive, with ZERO streaming state.
  *
  * The statelessness hinges on how assignment is computed: the batch
  * argmax (broadcast join + `groupBy(vec_id).agg(max(struct))`) is an
  * AGGREGATION — on a stream that means update-mode state. Instead
  * the centroid table rides the plan as a literal struct array (k·d
  * doubles) and each arriving vector argmaxes it in ONE narrow
  * projection (`array_sort(transform(...))[1]`, ties to the smallest
  * cid — the same rule as the batch form). Then one stream-static
  * equi-join on `cid` against the kept-corpus index + the cosine
  * filter emits `(vec_id, old_id, cos_sim)` matches in append mode.
  *
  * Scale bounds, stated honestly: the literal-array trick carries to
  * k in the low thousands (expression-tree size); beyond that, run
  * the same pipeline inside `foreachBatch`, where the batch argmax
  * (broadcast + aggregation) is legal per micro-batch — the join and
  * index shapes are identical. The static side is built ONCE from the
  * deduped corpus ([[SemanticDedup.incrementalKeptOld]]) and
  * persisted by the caller, exactly like H9's band index.
  */
object VecStreams {

  /** Streaming embeddings: file source with the pinned schema. */
  def readVecs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Tables.embeddingsSchema).parquet(dir)

  /** Deterministic spherical-k-means centroids of the corpus — built
    * once, passed to both the index build and the streaming
    * assignment. */
  def corpusCentroids(spark: SparkSession, corpusDir: String,
                      k: Int, iters: Int = 3): DataFrame =
    SimilaritySearch.trainCentroids(
      spark, Tables.embeddings(spark, corpusDir), k, iters)

  /** The kept-corpus cluster index the stream probes: (cid, old_id,
    * old_emb) for members that SURVIVED batch semantic dedup of the
    * corpus. Persist/write once; a hidden cache here would leak (the
    * DocStreams precedent). */
  def keptIndex(spark: SparkSession, corpusDir: String, cents: DataFrame,
                tau: Double): DataFrame =
    SemanticDedup.incrementalKeptOld(
      spark, Tables.embeddings(spark, corpusDir), cents, tau)

  /** Per-row stateless argmax over a collected centroid table — the
    * SHARED literal-centroid scorer ([[SemanticDedup.literalTopCentroids]],
    * also the batch probe path's router), so the stream's rounding and
    * tie rules can never drift from the batch argmax it mirrors. */
  private def nearestCidCol(spark: SparkSession, cents: DataFrame,
                            emb: Column): Column =
    element_at(SemanticDedup.literalTopCentroids(spark, cents, emb, 1), 1)

  /** Streaming matches: each arriving vector lands in its corpus
    * cluster (narrow, stateless) and joins the kept index on `cid`;
    * pairs above `tau` emit as (vec_id, old_id, cos_sim) — append
    * mode, at-least-once per (vector, kept neighbor), deduplicated
    * downstream like every H9-family emission. */
  def semanticMatches(spark: SparkSession, streamDir: String,
                      cents: DataFrame, keptIdx: DataFrame,
                      tau: Double): DataFrame = {
    val stream = readVecs(spark, streamDir)
      .withColumn("cid", nearestCidCol(spark, cents, col("embedding")))
    stream.join(keptIdx, Seq("cid"))
      .withColumn("cos_sim",
        round(graft.functions.Vectors.cosineFast(spark,
          col("embedding"), col("old_emb")), 9))
      .where(col("cos_sim") > tau)
      .select(col("vec_id"), col("old_id"), col("cos_sim"))
  }
}
