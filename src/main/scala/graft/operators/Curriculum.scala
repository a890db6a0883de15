package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** O3: deterministic curriculum training order — the "in what order
  * do the kept documents reach the trainer" assignment that sits
  * between curation (H8/J1) and shard packing (I1). Published
  * curriculum-learning practice orders easy/clean → hard/noisy
  * (Bengio et al. curriculum learning; quality-staged pretraining),
  * and within a phase the order must be an unbiased shuffle whose
  * every prefix matches the corpus source mix — a sequential scan of
  * sorted-by-anything data (all of one source, then the next) is the
  * classic training-order bug this operator exists to prevent.
  *
  * Design for 100 TB: the ENTIRE assignment is one narrow per-row
  * projection — no window, no join, no aggregation, not one shuffle:
  *   - `phase` bins the E2 quality score ([[TextAnalysis.qualityScore]],
  *     shared expression) against fixed literal thresholds;
  *   - `pos` is the J5-family salted-hash uniform
  *     `(bucket16 + 0.5) / 65536` — exact in binary (no rounding
  *     needed), reproducible across engines/repartitions/reruns, and
  *     independent of G1 sampling and J5 splits by salt. Hash-uniform
  *     positions make every contiguous training window a uniform
  *     random sample of its phase — each source appears in expected
  *     source-mix proportion in every window, the property stride
  *     schedulers construct explicitly, here for free per-row.
  * The trainer consumes `ORDER BY (phase, pos, doc_id)`: at scale
  * that is Spark's range-partitioned sort (the one operation whose
  * distributed form Spark already owns), or — cheaper — the I1
  * packer bucketing on `floor(pos · n_shards)` within phase, which
  * turns the global sort into a shuffle-free bucket write.
  */
object Curriculum {

  /** Phase thresholds on the E2 blended score: ≥ Hi → phase 0
    * (clean/easy first), ≥ Mid → phase 1, else phase 2. Literals in
    * both engines, sited at the fixture corpus's ~p75/p25 score
    * quantiles so all three phases are populated (production tuning
    * is a percentile choice against M1's report, same dial as L1). */
  val Hi = 0.57
  val Mid = 0.48

  val Salt = "order"

  def curriculumOrder(spark: SparkSession, dir: String): DataFrame =
    curriculumOrderFrom(Tables.parallelized(spark, Tables.documents(spark, dir)))

  /** The assignment over an arbitrary (doc_id, source, text) frame. */
  def curriculumOrderFrom(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScore(col("text"))
    val phase = when(q >= Hi, 0L).when(q >= Mid, 1L).otherwise(2L)
    val pos = (Sampling.hashBucket(col("doc_id"), Salt).cast("double") + 0.5) / 65536.0
    docs.select(col("doc_id"), col("source"), phase.as("phase"),
      pos.as("pos"))
      .orderBy("phase", "pos", "doc_id")
  }

  def curriculumOrderSql: String = {
    val q = TextAnalysis.qualityScoreSql("text")
    val pos = s"(CAST(${Sampling.hashBucketSql("doc_id", Salt)} AS DOUBLE) + 0.5) / 65536.0"
    s"""SELECT doc_id, source,
      |  CAST(CASE WHEN $q >= $Hi THEN 0 WHEN $q >= $Mid THEN 1 ELSE 2 END AS BIGINT) AS phase,
      |  $pos AS pos
      |FROM documents
      |ORDER BY phase, pos, doc_id""".stripMargin
  }
}
